#!/usr/bin/env python
"""On-chip A/B harness for the fused kernel's tuning knobs.

Measures every (_BLOCK_ROWS_OVERRIDE, _ROW_SUM) combination of
ops/fused_pallas.py on the real chip at the bench geometry, checking
each variant's disparity decisions against the default configuration
(the row-sum method changes f32 summation order, so near-tie decisions
may flip at ~1e-6 score deltas; anything beyond 0.1% of patches fails).

Motivation (ROOFLINE.json): the kernel is MXU-bound at ~28% of the
6-pass-f32 speed of light; the selection/compaction matmuls run with
M = bh*p = 64 rows, half-filling the 128-wide MXU, and the per-d row
compaction is ~16% of MXU FLOPs that a VPU sublane reshape+sum could
absorb.  Bigger blocks raise M (96 rows of patches = M 384 = 3 full
MXU tiles) at the cost of VMEM residency.

Writes FUSED_EXPERIMENTS.json; the winning knobs get baked into
ops/fused_pallas.py as defaults (see its module docstring).
"""

from __future__ import annotations

import json
import os
import sys
import time

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
    np.asarray(jnp.zeros(()))  # warm the relay

    def timeit(fn, args):
        t0 = time.perf_counter()
        out = fn(*args)
        probe = jax.jit(lambda o: o[0].ravel()[0])
        float(probe(out))
        compile_s = time.perf_counter() - t0
        ts = []
        for n in (4, 12):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(n)]
            float(probe(outs[-1]))
            ts.append((n, time.perf_counter() - t0))
        (n1, t1), (n2, t2) = ts
        return (t2 - t1) / (n2 - n1), compile_s, out

    results = []
    ref_disp = None
    variants = [
        # (bh, row_sum, dot_prec); first row = shipped defaults and the
        # decision-parity reference for the rest.
        (None, "matmul", "split2"),     # auto block (48 at bench geom)
        (16, "matmul", "split2"),       # r01/r02-era block size
        (None, "matmul", "highest"),    # exact 6-pass f32 matmuls
        (None, "matmul", "split3"),
        (None, "reshape", "split2"),
    ]
    for bh, rsum, prec in variants:
        fused_pallas._BLOCK_ROWS_OVERRIDE = bh
        fused_pallas._ROW_SUM = rsum
        fused_pallas._DOT_PREC = prec
        fused_pallas._match_rows.clear_cache()
        fn = jax.jit(lambda a, b: jax.vmap(
            lambda x, y: fused_pallas.match_rows(x, y, cfg, geom))(a, b))
        name = f"bh={bh or 'auto'},rows={rsum},dot={prec}"
        try:
            t, compile_s, out = timeit(fn, (ls, rs))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr, flush=True)
            results.append({"bh": bh, "row_sum": rsum, "dot_prec": prec,
                            "failed": True, "error": str(e)[:300]})
            continue
        disp = np.asarray(out[0])
        if ref_disp is None:
            ref_disp = disp
            neq = 0.0
        else:
            neq = float(np.mean(disp != ref_disp))
        ok = neq <= 1e-3
        print(f"{name}: {t*1e3:7.2f} ms  compile {compile_s:5.1f} s  "
              f"decision_neq={neq:.2e} {'OK' if ok else 'MISMATCH'}",
              file=sys.stderr, flush=True)
        results.append({"bh": bh, "row_sum": rsum, "dot_prec": prec,
                        "ms_per_step": round(t * 1e3, 3),
                        "compile_s": round(compile_s, 1),
                        "decision_disagreement": neq, "ok": ok})
    fused_pallas._BLOCK_ROWS_OVERRIDE = None
    fused_pallas._ROW_SUM = "matmul"
    fused_pallas._DOT_PREC = "highest"

    good = [r for r in results if r.get("ok")]
    best = min(good, key=lambda r: r["ms_per_step"]) if good else None
    out = {"geometry": [H, W, MAX_D], "directions": 2 * BATCH,
           "results": results, "best": best}
    with open(os.path.join(REPO, "FUSED_EXPERIMENTS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
