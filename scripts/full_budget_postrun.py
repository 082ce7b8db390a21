#!/usr/bin/env python
"""Collect a completed full-reference-budget run into an artifacts dir.

One command replaces the by-hand protocol used for the DCGAN/VAE budget
artifacts (artifacts/full_budget*/SUMMARY.md):

    python scripts/full_budget_postrun.py \
        -l log/SRGAN-COMP-SYNTH-FULL -o artifacts/full_budget_srgan

1. asserts the run actually finished (checkpoint step == 'END' — the
   trainer's completion sentinel, iprgan_tpu/utils/checkpoint.py);
2. runs the ambiguity-attack sweep (sign_flip.py, 10..100%) and the
   pruning sweep (prune.py, 10..90%) against the log dir, sequentially
   (one chip, one CPU core — never in parallel);
3. copies metrics.json + sign/*.json + prune/*.json into the artifacts
   dir;
4. prints the markdown tables for SUMMARY.md authoring.

Mirrors the reference's evaluation battery (reference sign_flip.py /
prune.py write log/sign/{pct}.json, log/prune/{pct}.json) so the
artifact layout is identical across all four model families.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def checkpoint_step(log_dir: str):
    sys.path.insert(0, REPO)
    from iprgan_tpu.utils import checkpoint as ckpt
    sd = ckpt.load(os.path.join(log_dir, ckpt.CKPT_NAME))
    step = sd.get("step")
    return step.item() if hasattr(step, "item") else step


def run_sweep(script: str, log_dir: str) -> None:
    cmd = [sys.executable, os.path.join(REPO, script), "-l", log_dir]
    print(f"+ {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def flatten(metrics: dict) -> dict:
    """{'synthetic': {'WBOX': x, 'BBOX': {...}}} -> flat column dict."""
    out = {}
    for dataset, m in metrics.items():
        for k, v in m.items():
            if isinstance(v, dict):
                for k2, v2 in v.items():
                    out[f"{k}.{k2}"] = v2
            else:
                out[k] = v
    return out


def table(rows: dict, label: str) -> str:
    """rows: {pct: flat-metric-dict} -> markdown table string."""
    cols = list(next(iter(rows.values())).keys())
    lines = [f"| {label} | " + " | ".join(cols) + " |",
             "|" + "---|" * (len(cols) + 1)]
    for pct in sorted(rows):
        lines.append(f"| {pct} | " +
                     " | ".join(str(rows[pct][c]) for c in cols) + " |")
    return "\n".join(lines)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-l", "--log", required=True, metavar="PATH")
    p.add_argument("-o", "--out", required=True, metavar="PATH")
    p.add_argument("--skip-sweeps", action="store_true",
                   help="collect only (sweeps already ran)")
    args = p.parse_args()

    step = checkpoint_step(args.log)
    if step != "END":
        sys.exit(f"run not complete: checkpoint step == {step!r} "
                 f"(expected 'END'); resume it with train.py first")

    if not args.skip_sweeps:
        run_sweep("sign_flip.py", args.log)
        run_sweep("prune.py", args.log)

    os.makedirs(args.out, exist_ok=True)
    shutil.copy2(os.path.join(args.log, "metrics.json"),
                 os.path.join(args.out, "metrics.json"))
    for sweep in ("sign", "prune"):
        src = os.path.join(args.log, sweep)
        dst = os.path.join(args.out, sweep)
        os.makedirs(dst, exist_ok=True)
        rows = {}
        # sweep dirs also hold per-pct sample-image subdirectories
        # (SIGN-10/, PRUNE-10/, ...); only the {pct}.json files are
        # the artifact
        for f in sorted(os.listdir(src)):
            if not f.endswith(".json"):
                continue
            shutil.copy2(os.path.join(src, f), os.path.join(dst, f))
            pct = int(os.path.splitext(f)[0])
            with open(os.path.join(src, f)) as fh:
                rows[pct] = flatten(json.load(fh))
        print(f"\n## {sweep} sweep\n\n{table(rows, f'{sweep} %')}")

    with open(os.path.join(args.out, "metrics.json")) as fh:
        final = flatten(json.load(fh))
    print("\n## final metrics\n")
    for k, v in final.items():
        print(f"| {k} | {v} |")
    print(f"\ncollected into {args.out}; now write {args.out}/SUMMARY.md "
          f"(mirror artifacts/full_budget_vae/SUMMARY.md)")


if __name__ == "__main__":
    main()
