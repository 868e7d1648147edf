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
    for max_d, batch in ((128, 4), (256, 4)):
        cfg = Config(max_disparity=max_d)
        geom = cfg.geometry(KH, KW)
        fused_ok = fused_pallas.supported(cfg, geom)
        impl = "fused" if fused_ok else "pallas"
        # Large-D fast path (VERDICT r3 item 4): when the pyramid
        # kernel's block only fits scoped VMEM SOLO, run pairs and
        # directions sequentially (lax.map) so the kernel replaces the
        # XLA pyramid fallback.
        large = (impl == "pallas"
                 and not pyramid_pallas.fits(
                     geom.disparities, geom.grid_h, geom.grid_w,
                     geom.levels)
                 and pyramid_pallas.fits_solo(
                     geom.disparities, geom.grid_h, geom.grid_w,
                     geom.levels))
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

        if large:
            step = jax.jit(lambda a, b: jax.lax.map(
                lambda xy: pipeline.match_padded_core(
                    xy[0], xy[1], cfg, geom, "pallas", large=True),
                (a, b)))
        else:
            step = jax.jit(lambda a, b: jax.vmap(
                lambda x, y: pipeline.match_padded_core(x, y, cfg, geom,
                                                        impl))(a, b))
        t0 = time.perf_counter()
        out = step(ls, rs)
        np.asarray(out["disparity"][0, 0, 0])
        compile_s = time.perf_counter() - t0

        stats = timing.steady_state(step, (ls, rs), depths=(2, 6))
        t = stats["median"]
        mpxs = batch * KH * KW * 1e-6 / t
        row = {"height": KH, "width": KW, "max_disparity": max_d,
               "batch": batch,
               "impl": ("pallas-large-serial" if large else impl),
               "ms_per_step": round(t * 1e3, 2),
               "timing": {k: stats[k] for k in
                          ("median", "min", "max", "samples")},
               "mpx_per_s": round(mpxs, 1),
               "compile_s": round(compile_s, 1),
               "volume_mb_per_direction": round(
                   geom.grid_h * geom.grid_w * geom.disparities * 4e-6,
                   1)}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    with open(os.path.join(REPO, "BENCH_LARGE.json"), "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
