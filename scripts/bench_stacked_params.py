"""Stacked-params vmap for CycleGAN's twin nets: measure, then decide.

CycleGAN owns two generators (GA/GB) and two discriminators (DA/DB) of
the SAME architecture with different weights. After the concat-batch
fusion (models/cyclegan.py g_loss/d_loss) the step still issues pairs
of structurally identical calls on different param sets:

    round 2:  rec_a = GB(fb)          rec_b = GA(fa)          (batch B)
    G-phase:  DA(fb)                  DB(fa)                  (batch B)
    D-phase:  DB([A; fa_pool])        DA([B; fb_pool])        (batch 2B)

Stacking the two param trees on a new leading axis and running ONE
``jax.vmap(apply)(stacked_params, stacked_inputs)`` halves the call
count. The catch: vmapping a conv over BOTH operands lowers to a
feature-grouped convolution (JAX's batching rule folds the vmap dim
into feature_group_count), and grouped convs tile differently on the
MXU — whether that wins at the reference's latency-bound bsz-1
workload is a measurement, not a judgement call.

This script times both forms of each pattern on the real chip, forward
and value_and_grad, at the production shapes (Resnet9Blocks /
ConvDiscriminator, 128px, bsz 1) — the decision data for whether the
train step adopts stacking.

Run on the real chip:  python scripts/bench_stacked_params.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

import iprgan_tpu.networks  # noqa: F401
from iprgan_tpu.registry import NETWORKS

REPS = 200


def _time(fn, *args):
    out = fn(*args)  # compile + warm
    _ = float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())  # fences (axon: block_
    return (time.perf_counter() - t0) / REPS  # until_ready is a no-op)


def main():
    k = jax.random.PRNGKey(0)
    rows = []
    for net_name, bsz in (("Resnet9Blocks", 1), ("ConvDiscriminator", 2)):
        net = NETWORKS(net_name)()
        x = jax.random.uniform(k, (bsz, 128, 128, 3)) * 2 - 1
        y = x[::-1] * 0.5
        p1 = net.init(jax.random.PRNGKey(1), x)["params"]
        p2 = net.init(jax.random.PRNGKey(2), x)["params"]
        stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
        xs = jnp.stack([x, y])

        @jax.jit
        def seq(p1, p2, x, y, net=net):
            return net.apply({"params": p1}, x), \
                net.apply({"params": p2}, y)

        @jax.jit
        def stk(ps, xs, net=net):
            return jax.vmap(
                lambda p, x: net.apply({"params": p}, x))(ps, xs)

        @jax.jit
        def seq_grad(p1, p2, x, y, net=net):
            f = lambda a, b: (  # noqa: E731
                jnp.mean(net.apply({"params": a}, x) ** 2)
                + jnp.mean(net.apply({"params": b}, y) ** 2))
            return jax.value_and_grad(f, argnums=(0, 1))(p1, p2)

        @jax.jit
        def stk_grad(ps, xs, net=net):
            f = lambda p: jnp.mean(jax.vmap(  # noqa: E731
                lambda pi, x: net.apply({"params": pi}, x))(p, xs) ** 2)
            return jax.value_and_grad(f)(ps)

        for label, fn, args in (
                ("fwd_seq", seq, (p1, p2, x, y)),
                ("fwd_stacked", stk, (stacked, xs)),
                ("grad_seq", seq_grad, (p1, p2, x, y)),
                ("grad_stacked", stk_grad, (stacked, xs))):
            us = _time(fn, *args) * 1e6
            rows.append({"net": net_name, "bsz": bsz,
                         "variant": label, "us": round(us, 1)})
            print(f"{net_name:18s} bsz {bsz}  {label:14s} {us:9.1f} us")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.pardir, "bench_stacked_params.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"\nwrote {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
