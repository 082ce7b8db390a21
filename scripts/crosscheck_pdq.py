#!/usr/bin/env python
"""One-time upstream cross-check of the PDQ implementation.

This offline environment cannot install the ``pdqhash`` wheel the
reference uses (`/root/reference/tools/phash_pvalue.py:4,14`), so exact
bit-parity with upstream is pinned three ways instead:

1. golden vectors frozen in tests/test_pdq.py (fails on any drift);
2. an independent from-scratch spec transliteration that agrees
   bit-exactly (tests/test_pdq.py::test_spec_independent_derivation);
3. THIS script — run it once in any environment with egress:

    pip install pdqhash==0.2.2
    python scripts/crosscheck_pdq.py

It hashes the committed golden images plus photo-like multi-scale
images with both implementations and reports per-image Hamming
distances. Interpretation:

* distance 0 everywhere       -> bit-exact parity; done.
* distance <= 8 on goldens    -> floating-point tie-breaks at the
  median only (the goldens were built to avoid ties, so expect 0; the
  photo-like set may show 1-2 tie flips).
* anything larger             -> a real pipeline divergence (window
  size, decimation phase, DCT scaling, or median semantics); fix
  iprgan_tpu/ops/pdq.py until this report is clean and the golden
  vectors in tests/test_pdq.py still pass (i.e. regenerate them ONLY
  if upstream disagrees with the current spec reading).

The ownership metric itself (p = 1 - BinomCDF(matches-1; 256, 0.5),
reference tools/phash_pvalue.py:19-38) only needs self-consistency —
both hashes in every comparison come from this repo — but bit parity
makes our reported p-values directly comparable to the reference's.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tests"))

from iprgan_tpu.ops import pdq  # noqa: E402


def main() -> int:
    try:
        import pdqhash
    except ImportError:
        print("pdqhash is not installed — this cross-check needs egress:\n"
              "    pip install pdqhash==0.2.2\n"
              "Until then, parity is pinned by the golden vectors and the "
              "independent spec derivation in tests/test_pdq.py.")
        return 1

    from test_pdq import _golden_images  # noqa: E402

    suites = {"golden": _golden_images()}
    try:
        import test_pdq

        # reuse the photo-like generator via its fixture function body
        rng = np.random.default_rng(42)
        del rng  # the fixture is deterministic; call it directly
        suites["photo_like"] = test_pdq.photo_like.__wrapped__()
    except Exception:
        pass

    worst = 0
    for name, imgs in suites.items():
        ours = pdq.compute_hash(imgs, use_native=False)
        for i, im in enumerate(imgs):
            vec, quality = pdqhash.compute(im)
            theirs = np.asarray(vec, bool)
            dist = int(np.logical_xor(ours[i], theirs).sum())
            worst = max(worst, dist)
            print(f"{name}[{i}]: hamming={dist:3d}  "
                  f"upstream_quality={quality}")
    print(f"\nworst distance: {worst} "
          f"({'bit-exact' if worst == 0 else 'tie-breaks only' if worst <= 8 else 'REAL DIVERGENCE — investigate'})")
    return 0 if worst <= 8 else 2


if __name__ == "__main__":
    raise SystemExit(main())
