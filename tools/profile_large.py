#!/usr/bin/env python
"""Stage-level timing + roofline row for the KITTI large-D path (r5).

VERDICT r4 item 4: BENCH_LARGE's D=256 row (334-365 Mpx/s) had no
roofline model, so its headroom was unquantified.  This tool times each
stage of the large-D pipeline separately on the chip at KITTI geometry
(1242x375):

  cost     fused image -> D-major cost-volume kernel
           (fused_pallas.cost_volume_rows)
  slabs    sequential D-slab aggregation kernel chain
           (pyramid_pallas.aggregate_slabs)
  pyrbt    full pyramid + backtracking (match_dmajor_xla) — slabs plus
           the XLA argmax/backtrack/score tail
  full     whole match_padded_core step

and compares each against an HBM-traffic lower bound (the path is
HBM-bound: the volume and the recorded args round-trip HBM between
kernels).  Writes PROFILE_LARGE.json; the roofline row is merged into
ROOFLINE.json by tools/roofline.py --large.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KH, KW = 375, 1242
HBM = 819e9
VPU = 6.1e12


def hbm_model(d0, h0, w0, hp, wp, levels, itemsize=4,
              args_itemsize=None, slab=None):
    """Per-direction HBM bytes by stage (current implementation).

    args_itemsize follows pyramid_pallas._ARGS_DTYPE (the shipped
    default stores the recorded pool offsets as 2-byte bf16); `slab`
    follows pyramid_pallas._SLAB for the per-slab halo round-trips.
    """
    from deepmatching_stereo_matching_tpu.ops import pyramid_pallas

    if args_itemsize is None:
        args_itemsize = (2 if pyramid_pallas._ARGS_DTYPE == "bfloat16"
                         else 4)
    if slab is None:
        slab = pyramid_pallas._SLAB
    vol = itemsize * d0 * h0 * w0
    args = sum(args_itemsize * (d0 >> (l + 1)) * h0 * w0
               for l in range(levels))
    tops = itemsize * (d0 >> levels) * h0 * w0
    halos = 4 * levels * h0 * w0 * 2  # per-level halo planes, r+w
    return {
        "cost": {"img_r": 2 * 4 * hp * wp, "vol_w": vol},
        "slabs": {"vol_r": vol, "args_w": args, "tops_w": tops,
                  "halos": halos * (d0 // slab)},
        "backtrack_tail": {"tops_r": tops, "args_r": args,
                           "score_vol_r": vol},
    }


def main():
    import jax
    import jax.numpy as jnp

    from deepmatching_stereo_matching_tpu import Config
    from deepmatching_stereo_matching_tpu.models import pipeline
    from deepmatching_stereo_matching_tpu.ops import fused_pallas
    from deepmatching_stereo_matching_tpu.ops import pyramid_pallas
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle
    from deepmatching_stereo_matching_tpu.data import synthetic
    from deepmatching_stereo_matching_tpu.utils import timing

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    np.asarray(jnp.zeros(()))

    out = {"geometry": {"height": KH, "width": KW}, "rows": {}}
    for max_d, batch in ((256, 4), (128, 4)):
        cfg = Config(max_disparity=max_d)
        geom = cfg.geometry(KH, KW)
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
        lpa, rpa = jnp.asarray(np.stack(lp)), jnp.asarray(np.stack(rp))
        ls = jnp.concatenate([lpa, rpa[:, :, ::-1]])
        rs = jnp.concatenate([rpa, lpa[:, :, ::-1]])
        ndir = ls.shape[0]
        d0 = geom.disparities
        h0, w0 = geom.grid_h, geom.grid_w
        hp, wp = geom.padded_height, geom.padded_width
        model = hbm_model(d0, h0, w0, hp, wp, geom.levels)
        rows = {}

        cost_fn = jax.jit(lambda a, b: jax.vmap(
            lambda x, y: fused_pallas.cost_volume_rows(x, y, cfg, geom)
        )(a, b))
        st = timing.steady_state(cost_fn, (ls, rs), repeats=3)
        rows["cost_kernel"] = {"seconds": st["median"], "timing": st}
        print(f"D={max_d} cost kernel x{ndir}: {timing.fmt(st)}",
              file=sys.stderr, flush=True)

        vol = cost_fn(ls, rs)
        slab_fn = jax.jit(lambda v: jax.vmap(
            lambda x: pyramid_pallas.aggregate_slabs(
                x, geom.levels, cfg.lam)[0])(v))
        st = timing.steady_state(slab_fn, (vol,), repeats=3)
        rows["slab_aggregation"] = {"seconds": st["median"], "timing": st}
        print(f"D={max_d} slab agg x{ndir}:    {timing.fmt(st)}",
              file=sys.stderr, flush=True)

        pyrbt_fn = jax.jit(lambda v: jax.vmap(
            lambda x: pipeline.match_dmajor_xla(x, geom.levels, cfg.lam)
        )(v))
        st = timing.steady_state(pyrbt_fn, (vol,), repeats=3)
        rows["pyramid_backtrack"] = {"seconds": st["median"],
                                     "timing": st}
        print(f"D={max_d} pyr+backtrack x{ndir}: {timing.fmt(st)}",
              file=sys.stderr, flush=True)

        # Full-step arms: args dtype x slab width (module knobs; the
        # inner jits cache on static args only, so clear them per arm).
        saved = (pyramid_pallas._ARGS_DTYPE, pyramid_pallas._SLAB)
        mpx = None
        for arm, args_dt, slab in (("bf16args-slab32", "bfloat16", 32),
                                   ("bf16args-slab64", "bfloat16", 64),
                                   ("int32args-slab32", "int32", 32)):
            pyramid_pallas._ARGS_DTYPE = args_dt
            pyramid_pallas._SLAB = slab
            pyramid_pallas._aggregate_slabs.clear_cache()
            step = jax.jit(lambda a, b: jax.vmap(
                lambda x, y: pipeline.match_padded_core(
                    x, y, cfg, geom, "fused"))(a, b))
            try:
                st = timing.steady_state(step, (lpa, rpa), repeats=3)
            except Exception as e:
                print(f"D={max_d} full step [{arm}] FAILED: "
                      f"{str(e)[:200]}", file=sys.stderr, flush=True)
                rows[f"full_step_{arm}"] = {"failed": str(e)[:300]}
                continue
            v = batch * KH * KW * 1e-6 / st["median"]
            rows[f"full_step_{arm}"] = {"seconds": st["median"],
                                        "timing": st, "mpx_per_s": v}
            if mpx is None:
                rows["full_step"] = {"seconds": st["median"],
                                     "timing": st}
                mpx = v
            print(f"D={max_d} full step [{arm}]: {timing.fmt(st)} = "
                  f"{v:.1f} Mpx/s", file=sys.stderr, flush=True)
        pyramid_pallas._ARGS_DTYPE, pyramid_pallas._SLAB = saved
        pyramid_pallas._aggregate_slabs.clear_cache()

        bounds = {k: sum(v.values()) * ndir / HBM
                  for k, v in model.items()}
        bounds["full"] = sum(bounds.values())
        rows["hbm_model_per_direction_bytes"] = model
        rows["hbm_bound_seconds"] = bounds
        rows["mpx_per_s"] = mpx
        sol = bounds["full"] / rows["full_step"]["seconds"]
        rows["hbm_sol_fraction"] = sol
        print(f"D={max_d} HBM bounds: " + ", ".join(
            f"{k}={v*1e3:.2f}ms" for k, v in bounds.items())
            + f"  -> full step at {sol:.0%} of HBM SOL",
            file=sys.stderr, flush=True)
        out["rows"][f"D{max_d}"] = rows

    path = os.path.join(REPO, "PROFILE_LARGE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
