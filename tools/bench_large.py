#!/usr/bin/env python
"""KITTI-scale large-D throughput rows (BASELINE.md config 3).

Measures the single-chip pipeline at KITTI resolution (1242x375) for
large disparity ranges, including D=256 — the regime the ring-D
strategy (parallel/ringd.py) exists for.  The fused kernel's VMEM gate
(ops/fused_pallas.py:supported) auto-falls back to the two-kernel
Pallas path where the volume exceeds the budget; the impl actually
used is reported per row.  Writes BENCH_LARGE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KH, KW = 375, 1242


def main():
    import jax
    import jax.numpy as jnp

    from deepmatching_stereo_matching_tpu import Config
    from deepmatching_stereo_matching_tpu.models import pipeline
    from deepmatching_stereo_matching_tpu.ops import fused_pallas, pyramid_pallas
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle
    from deepmatching_stereo_matching_tpu.data import synthetic

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    np.asarray(jnp.zeros(()))

    rows = []
    # Batch per row is the measured-fastest workload shape (D=128
    # amortizes with batch; D=256 is HBM-bound and does not).  The
    # bfloat16 D=256 row demonstrates the dtype knob where it belongs
    # (the HBM-bound large-D path; on the VMEM-resident flagship bf16
    # is slower, BASELINE.md) — its gate is the kept-pixel bad-rate
    # delta vs the f32 oracle, not decision parity.
    for max_d, batch, dt in ((128, 8, "float32"), (256, 4, "float32"),
                             (256, 4, "bfloat16")):
        cfg = Config(max_disparity=max_d, dtype=dt)
        geom = cfg.geometry(KH, KW)
        # Large-D fast path (VERDICT r3 item 4): the fused image ->
        # D-major cost-volume kernel + D-slab pyramid aggregation
        # (pipeline routes it under impl="fused" via
        # fused_pallas.cost_supported); "pallas" remains the exact
        # two-kernel comparison arm.
        fused_ok = (fused_pallas.supported(cfg, geom)
                    or fused_pallas.cost_supported(cfg, geom))
        impl = "fused" if fused_ok else "pallas"
        lp, rp = [], []
        for i in range(batch):
            rng = np.random.default_rng(i)
            field = synthetic.block_disparity_field(KH, KW, max_d, rng,
                                                    block=48)
            left, right, _ = synthetic.make_pair(KH, KW, field, seed=i)
            lp.append(oracle.pad_image(oracle.to_grayscale_f32(left),
                                       geom))
            rp.append(oracle.pad_image(oracle.to_grayscale_f32(right),
                                       geom))
        ls, rs = jnp.asarray(np.stack(lp)), jnp.asarray(np.stack(rp))

        from deepmatching_stereo_matching_tpu.utils import timing

        step = jax.jit(lambda a, b: jax.vmap(
            lambda x, y: pipeline.match_padded_core(x, y, cfg, geom,
                                                    impl))(a, b))
        t0 = time.perf_counter()
        out = step(ls, rs)
        np.asarray(out["disparity"][0, 0, 0])
        compile_s = time.perf_counter() - t0

        # Parity gate at this geometry (VERDICT r3 item 4): the fused
        # path's algebraic normalisation may flip near-tie decisions
        # only (same 0.5% tolerance as bench.py's fused gate).
        rng = np.random.default_rng(7)
        field = synthetic.block_disparity_field(KH, KW, max_d, rng,
                                                block=48)
        gl, gr, ggt = synthetic.make_pair(KH, KW, field, seed=7)
        t0 = time.perf_counter()
        want = oracle.match_stereo(gl, gr, cfg)
        got = pipeline.match_padded(
            jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(gl),
                                         geom)),
            jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(gr),
                                         geom)),
            cfg, KH, KW, impl)
        raw_neq = float(np.mean(np.asarray(got["disparity_raw"])
                                != want.disparity_raw))
        val_neq = float(np.mean(np.asarray(got["valid"]) != want.valid))
        from deepmatching_stereo_matching_tpu.utils import metrics
        bad_got = metrics.bad_pixel_rate(np.asarray(got["disparity"]),
                                         ggt, count_invalid=False)
        bad_ora = metrics.bad_pixel_rate(want.disparity, ggt,
                                         count_invalid=False)
        print(f"parity[D={max_d},{dt}] raw_neq={raw_neq:.2e} "
              f"val_neq={val_neq:.2e} kept_bad={bad_got:.4f} "
              f"(oracle {bad_ora:.4f}, took "
              f"{time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)
        if dt == "float32":
            if raw_neq > 0.005 or val_neq > 0.005:
                print(f"PARITY FAILURE at D={max_d}", file=sys.stderr,
                      flush=True)
                sys.exit(1)
        elif bad_got - bad_ora > 0.05:
            print(f"BF16 QUALITY FAILURE at D={max_d}", file=sys.stderr,
                  flush=True)
            sys.exit(1)

        stats = timing.steady_state(step, (ls, rs), depths=(2, 6))
        t = stats["median"]
        mpxs = batch * KH * KW * 1e-6 / t
        row = {"height": KH, "width": KW, "max_disparity": max_d,
               "batch": batch, "dtype": dt,
               "impl": impl,
               "kept_bad_rate": bad_got, "oracle_kept_bad": bad_ora,
               "parity_raw_neq": raw_neq, "parity_val_neq": val_neq,
               "ms_per_step": round(t * 1e3, 2),
               "timing": {k: stats[k] for k in
                          ("median", "min", "max", "samples")},
               "mpx_per_s": round(mpxs, 1),
               "compile_s": round(compile_s, 1),
               "volume_mb_per_direction": round(
                   geom.grid_h * geom.grid_w * geom.disparities
                   * (2 if dt == "bfloat16" else 4) * 1e-6, 1)}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    with open(os.path.join(REPO, "BENCH_LARGE.json"), "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
