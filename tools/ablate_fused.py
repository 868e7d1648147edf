#!/usr/bin/env python
"""Stage ablation + variant A/B for the fused kernel, on-chip.

Times fused-kernel variants (phasing scheme, disparity-loop row-sum
method, block rows, pyramid on/off) at the bench geometry with the
shared repeat-measured protocol (utils/timing.py).  All variants run in
ONE process — cross-process clock variance on the shared axon chip is
larger than variant deltas, so only same-process comparisons are valid
(see utils/timing.py).

Decision parity: every full variant is compared against the first
variant's disparity output; ablation arms (skip_pyramid) are timing-only.

Writes ABLATE_FUSED.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W, MAX_D, BATCH = 375, 450, 64, 32


def main():
    import jax
    import jax.numpy as jnp

    from deepmatching_stereo_matching_tpu import Config
    from deepmatching_stereo_matching_tpu.ops import fused_pallas
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle
    from deepmatching_stereo_matching_tpu.data import synthetic
    from deepmatching_stereo_matching_tpu.utils import timing

    cfg = Config(max_disparity=MAX_D)
    geom = cfg.geometry(H, W)
    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    lp, rp = [], []
    for i in range(BATCH):
        rng = np.random.default_rng(100 + i)
        field = synthetic.block_disparity_field(H, W, MAX_D, rng, block=32)
        left, right, _ = synthetic.make_pair(H, W, field, seed=100 + i)
        lp.append(oracle.pad_image(oracle.to_grayscale_f32(left), geom))
        rp.append(oracle.pad_image(oracle.to_grayscale_f32(right), geom))
    lpa = jnp.asarray(np.stack(lp))
    rpa = jnp.asarray(np.stack(rp))
    ls = jnp.concatenate([lpa, rpa[:, :, ::-1]])
    rs = jnp.concatenate([rpa, lpa[:, :, ::-1]])
    np.asarray(jnp.zeros(()))

    # (name, bh, row_sum, dloop_rows, phasing, prec, skip_pyr)
    variants = [
        ("r03-baseline", None, "matmul", "matmul", "selmm", "split2", 0),
        ("chunk", None, "matmul", "matmul", "chunk", "split2", 0),
        ("chunk+group8", None, "matmul", "group", "chunk", "split2", 0),
        ("chunk+reshape-dloop-bh16", 16, "matmul", "reshape", "chunk",
         "split2", 0),
        ("rowphase", None, "matmul", "group", "rowphase", "split2", 0),
        ("chunk-exactpyr", None, "matmul", "group", "chunk", "split2", 0,
         {"_PYR_FAST": False}),
        ("chunk+group8-bh32", 32, "matmul", "group", "chunk", "split2", 0),
        ("chunk+group8-bh96", 96, "matmul", "group", "chunk", "split2", 0),
        ("ABL-r03-nopyr", None, "matmul", "matmul", "selmm", "split2", 1),
        ("ABL-chunk+group8-nopyr", None, "matmul", "group", "chunk",
         "split2", 1),
        # Isolation arms (wrong results, timing only): fixed-offset
        # lane slices in the d-loop, and truncated d-loops.
        ("ABL-fixedslice-nopyr", None, "matmul", "group", "chunk",
         "split2", 1, {"_ABL_FIXED_SLICE": True}),
        ("ABL-d8-nopyr", None, "matmul", "group", "chunk", "split2", 1,
         {"_ABL_LIVE_D": 8}),
        ("ABL-d32-nopyr", None, "matmul", "group", "chunk", "split2", 1,
         {"_ABL_LIVE_D": 32}),
    ]
    results = []
    ref_disp = None
    for row in variants:
        name, bh, rsum, dloop, phasing, prec, skip = row[:7]
        extra = row[7] if len(row) > 7 else {}
        fused_pallas._BLOCK_ROWS_OVERRIDE = bh
        fused_pallas._ROW_SUM = rsum
        fused_pallas._DLOOP_ROWS = dloop
        fused_pallas._PHASING = phasing
        fused_pallas._DOT_PREC = prec
        fused_pallas._SKIP_PYRAMID = bool(skip)
        fused_pallas._ABL_FIXED_SLICE = False
        fused_pallas._ABL_LIVE_D = None
        fused_pallas._PYR_FAST = True
        for k, v in extra.items():
            setattr(fused_pallas, k, v)
        fused_pallas._match_rows.clear_cache()
        fn = jax.jit(lambda a, b: jax.vmap(
            lambda x, y: fused_pallas.match_rows(x, y, cfg, geom))(a, b))
        rec = {"name": name, "bh": bh, "row_sum": rsum,
               "dloop_rows": dloop, "phasing": phasing, "dot_prec": prec,
               "skip_pyramid": bool(skip)}
        try:
            stats = timing.steady_state(fn, (ls, rs))
            out = fn(ls, rs)
            disp = np.asarray(out[0])
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            rec.update(failed=True, error=str(e)[:300])
            results.append(rec)
            continue
        if skip:
            neq = None
        elif ref_disp is None:
            ref_disp = disp
            neq = 0.0
        else:
            neq = float(np.mean(disp != ref_disp))
        print(f"{name}: {timing.fmt(stats)}"
              + (f"  neq={neq:.2e}" if neq is not None else "  (ablation)"),
              file=sys.stderr, flush=True)
        rec.update(ms_per_step=round(stats["median"] * 1e3, 3),
                   timing={k: stats[k] for k in
                           ("median", "min", "max", "samples")},
                   decision_disagreement=neq)
        results.append(rec)
    # Restore module defaults.
    fused_pallas._BLOCK_ROWS_OVERRIDE = None
    fused_pallas._ROW_SUM = "matmul"
    fused_pallas._DLOOP_ROWS = "group"
    fused_pallas._PHASING = "chunk"
    fused_pallas._DOT_PREC = None
    fused_pallas._SKIP_PYRAMID = False
    fused_pallas._ABL_FIXED_SLICE = False
    fused_pallas._ABL_LIVE_D = None
    fused_pallas._PYR_FAST = True

    with open(os.path.join(REPO, "ABLATE_FUSED.json"), "w") as f:
        json.dump({"geometry": [H, W, MAX_D], "directions": 2 * BATCH,
                   "results": results}, f, indent=1)
    print(json.dumps({"n": len(results)}))


if __name__ == "__main__":
    main()
