#!/usr/bin/env python
"""On-chip A/B harness for the fused kernel's tuning knobs.

Measures every (_BLOCK_ROWS_OVERRIDE, _ROW_SUM, _DOT_PREC) variant of
ops/fused_pallas.py on the real chip at the bench geometry with the
shared repeat-measured timing protocol (utils/timing.py), checking each
variant's disparity decisions against the EXACT variant
(dot_prec='highest', Mosaic's 6-pass full-precision f32 matmuls) — the
parity reference is the exact kernel, not whichever variant happens to
ship as the default (VERDICT r3 item 3).

Remote-compile HTTP 500s from the axon compile helper are infra flakes
(landlock warnings in the error text); each variant retries up to
RETRIES times before being recorded as failed.

Writes FUSED_EXPERIMENTS.json; the winning knobs get baked into
ops/fused_pallas.py as defaults (see its module docstring).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W, MAX_D, BATCH = 375, 450, 64, 32
RETRIES = 3


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
    np.asarray(jnp.zeros(()))  # warm the relay

    results = []
    ref_disp = None
    # (bh, row_sum, dot_prec); the FIRST row is the exact 6-pass-f32
    # kernel and serves as every other variant's decision-parity
    # reference.  The shipped defaults are marked by comparing against
    # fused_pallas's module constants after the sweep.
    variants = [
        # The exact 6-pass-f32 parity reference runs at bh=16: its IR
        # at bh=48 deterministically crashes the remote compile helper
        # (decision parity is block-size-independent — measured 0
        # disagreement between bh=16 and auto at split2).
        (16, "matmul", "highest"),      # exact — parity reference
        (None, "matmul", "split2"),     # auto block (shipped default)
        (16, "matmul", "split2"),
        (None, "matmul", "split3"),
        (16, "reshape", "split2"),      # VPU row sums (bh=16 compiles)
    ]
    defaults = (fused_pallas._BLOCK_ROWS_OVERRIDE, fused_pallas._ROW_SUM,
                fused_pallas._DOT_PREC)
    shipped = (None, "matmul", fused_pallas.dot_precision(cfg))
    for bh, rsum, prec in variants:
        fused_pallas._BLOCK_ROWS_OVERRIDE = bh
        fused_pallas._ROW_SUM = rsum
        fused_pallas._DOT_PREC = prec
        name = f"bh={bh or 'auto'},rows={rsum},dot={prec}"
        rec = {"bh": bh, "row_sum": rsum, "dot_prec": prec,
               "is_default": (bh, rsum, prec) == shipped}
        for attempt in range(RETRIES):
            fused_pallas._match_rows.clear_cache()
            fn = jax.jit(lambda a, b: jax.vmap(
                lambda x, y: fused_pallas.match_rows(x, y, cfg, geom)
            )(a, b))
            try:
                stats = timing.steady_state(fn, (ls, rs))
                out = fn(ls, rs)
                disp = np.asarray(out[0])
                rec.pop("failed", None)
                rec.pop("error", None)
                break
            except Exception as e:
                print(f"{name}: attempt {attempt + 1} FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr, flush=True)
                rec.update(failed=True, error=str(e)[:300])
        if rec.get("failed"):
            results.append(rec)
            continue
        if ref_disp is None:
            ref_disp = disp
            neq = 0.0
        else:
            neq = float(np.mean(disp != ref_disp))
        ok = neq <= 1e-3
        print(f"{name}: {timing.fmt(stats)}  "
              f"decision_neq={neq:.2e} {'OK' if ok else 'MISMATCH'}",
              file=sys.stderr, flush=True)
        rec.update(ms_per_step=round(stats["median"] * 1e3, 3),
                   timing={k: stats[k] for k in
                           ("median", "min", "max", "samples")},
                   decision_disagreement_vs_exact=neq, ok=ok)
        results.append(rec)
    (fused_pallas._BLOCK_ROWS_OVERRIDE, fused_pallas._ROW_SUM,
     fused_pallas._DOT_PREC) = defaults

    good = [r for r in results if r.get("ok")]
    best = min(good, key=lambda r: r["ms_per_step"]) if good else None
    out = {"geometry": [H, W, MAX_D], "directions": 2 * BATCH,
           "parity_reference": "dot=highest (exact 6-pass f32)",
           "results": results, "best": best}
    with open(os.path.join(REPO, "FUSED_EXPERIMENTS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
