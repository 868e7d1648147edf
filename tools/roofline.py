#!/usr/bin/env python
"""Speed-of-light / roofline accounting for the TPU kernels (SURVEY.md §5.1).

BASELINE.json:5 demands "kernels hit speed-of-light correlation FLOPs
per chip"; this tool makes that claim measurable and reproducible:

  * an **analytic cost model** of each Pallas kernel, counting MXU
    FLOPs, VPU FLOPs, and HBM bytes separately from the kernel source
    (the per-matmul / per-pass terms are itemised below so a reviewer
    can tie every term to a line of ops/*.py);
  * **measured wall-clock** per kernel on the real chip, using the same
    enqueue-slope method as bench.py (the axon relay adds a constant
    ~5 ms round-trip that differencing two enqueue depths removes);
  * the ratio, against each resource's peak, names the **bounding
    resource** and the achieved fraction of its speed of light.

v5e peaks (public spec: cloud.google.com/tpu/docs/v5e; the chip here
reports "TPU v5 lite"):

  MXU, bf16 operands     197 TFLOP/s
  MXU, f32 via HIGHEST   197/6 TFLOP/s  (Mosaic's only full-precision
                         matmul is the 6-pass bf16x6 decomposition; the
                         fused kernel's default is the 2-pass split-bf16
                         scheme, Config.fused_dot_precision)
  VPU                    ~6.1 TFLOP/s   (8x128 lanes x 4 ALUs x
                         ~1.5 GHz; FMA-counting doubles this, the
                         disparity loop is mul+add so we use the
                         FMA-free figure as the optimistic bound)
  HBM                    819 GB/s

Usage:  python tools/roofline.py            # writes ROOFLINE.json
        python tools/roofline.py --quick    # fewer timing reps
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MXU_BF16 = 197e12
MXU_F32_HIGHEST = MXU_BF16 / 6.0
VPU = 6.1e12
HBM = 819e9

# Bench geometry (bench.py): Middlebury-class, batch 32 pairs, LR flip
# mode => 64 matched directions per step.
H, W, MAX_D, BATCH = 375, 450, 64, 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Analytic cost models (per matched direction)
# ---------------------------------------------------------------------------


def fused_model(geom, cfg):
    """Itemised resource counts for ops/fused_pallas.py (one direction).

    Matmul FLOPs are 2*M*K*N; every matmul runs at Precision.HIGHEST
    (6-pass), so they are charged against MXU_F32_HIGHEST.  Terms map to
    _cost_block / pyramid_body:
      sel      selection matmuls NL_o/NR_o = img @ Sel_o   (2 imgs x p)
      m2c      left-norm row compaction  cpt @ m2
      r2       right row-sum compaction  cpt @ (r*r)
      invr     phased right norms        nr_x0 @ Sel_o     (p)
      dcomp    per-disparity row compaction cpt @ acc      (max_d)
      dloop    per-disparity mul+add on (bp, w0)           (VPU)
      pyr      pyramid + backtracking elementwise          (VPU)
    """
    p = cfg.patch_size
    hp, wp = geom.padded_height, geom.padded_width
    h0, w0, d0 = geom.grid_h, geom.grid_w, geom.disparities
    max_d = cfg.max_disparity
    qh = (max_d - 1) // p + 2
    wn = w0 + qh
    from deepmatching_stereo_matching_tpu.ops import fused_pallas

    unit = 2 ** geom.levels
    bh = fused_pallas._block_rows(h0, unit, d0, w0, p, qh, 4)
    bp = bh * p
    nblk = h0 // bh

    mxu = {
        # Chunked all-phase selections (fused_pallas._phase_all): one
        # (128, 128) selection matmul per 128-lane chunk per image.
        "sel": 2 * 2 * hp * wp * 128,
        "m2c": nblk * 2 * bh * bp * w0,
        "r2": nblk * 2 * bh * bp * wp,
        "invr": nblk * 2 * bh * wp * 128,
        "dcomp": max_d * nblk * 2 * bh * bp * w0,
    }
    # Duplicated-cell pyramid: per level ~10 elementwise passes over a
    # (D/2^l, h0, w0) volume at duplicated (full) spatial resolution,
    # plus argmax/backtrack/score select loops ~5 passes over D planes.
    # (Fast mode halves the rectified planes; the pass-count model is
    # deliberately coarse — transcendental cost rides the VPU figure.)
    pyr = 10 * sum((d0 >> (l + 1)) * h0 * w0
                   for l in range(geom.levels)) + 5 * d0 * h0 * w0
    vpu = {
        "m2": (2 * p - 1) * hp * w0,
        "win": (p - 1) * h0 * wp + 2 * h0 * w0 + p * h0 * wn,
        "dloop": max_d * (2 * p - 1) * hp * w0,
        "dscale": 6 * max_d * h0 * w0,
        "pyr": pyr,
    }
    hbm = {"imgs": 2 * 4 * hp * wp, "out": 8 * h0 * w0}
    return mxu, vpu, hbm


def twokernel_model(geom, cfg):
    """Resource counts for the exact two-kernel path (one direction):
    descriptors (XLA) -> costvol_pallas(dmajor) -> pyramid_pallas."""
    p = cfg.patch_size
    hp, wp = geom.padded_height, geom.padded_width
    h0, w0, d0 = geom.grid_h, geom.grid_w, geom.disparities
    max_d = cfg.max_disparity
    c = p * p
    wr = wp // p + ((max_d - 1) // p + 2)  # sliding width / p, + halo-ish
    # costvol kernel: per d, elementwise mul + sublane reduce over C.
    vpu = {"corr": max_d * (2 * c - 1) * h0 * w0,
           "pyr": 10 * sum((d0 >> (l + 1)) * h0 * w0
                           for l in range(geom.levels)) + 5 * d0 * h0 * w0}
    hbm = {
        # descriptors written by XLA then read by the costvol kernel:
        # S (H0,C,W0) once + phased R (H0,p,C,~W0+halo) once, f32.
        "desc_rw": 2 * 4 * (h0 * c * w0 + h0 * p * c * wr),
        "vol_w": 4 * d0 * h0 * w0,
        "vol_r": 4 * d0 * h0 * w0,
        "out": 8 * h0 * w0,
        "imgs": 2 * 4 * hp * wp,
    }
    return {}, vpu, hbm


def mxu_rate():
    """Effective MXU FLOP/s for the fused kernel's configured matmul
    precision (Config.fused_dot_precision / fused_pallas._DOT_PREC
    override): n split-bf16 passes run at peak/n; HIGHEST is the 6-pass
    f32 decomposition."""
    from deepmatching_stereo_matching_tpu import Config
    from deepmatching_stereo_matching_tpu.ops import fused_pallas

    passes = {"highest": 6, "split2": 2, "split3": 3}[
        fused_pallas.dot_precision(Config())]
    return MXU_BF16 / passes, f"MXU(bf16x{passes})"


def bound(mxu, vpu, hbm):
    """(seconds lower bound, bounding resource name)."""
    rate, label = mxu_rate()
    t = {
        label: sum(mxu.values()) / rate,
        "VPU": sum(vpu.values()) / VPU,
        "HBM": sum(hbm.values()) / HBM,
    }
    name = max(t, key=t.get)
    return t, name


# ---------------------------------------------------------------------------
# Measurement
# ---------------------------------------------------------------------------


def time_fn(fn, args, repeats=5):
    """Median steady-state seconds (shared protocol, utils/timing.py).

    Returns (median_seconds, stats_dict); stats_dict lands in the JSON
    so ROOFLINE.json carries its own spread accounting.
    """
    from deepmatching_stereo_matching_tpu.utils import timing

    stats = timing.steady_state(fn, args, repeats=repeats)
    return stats["median"], stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "ROOFLINE.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepmatching_stereo_matching_tpu import Config
    from deepmatching_stereo_matching_tpu.models import descriptors, pipeline
    from deepmatching_stereo_matching_tpu.ops import (costvol_pallas,
                                                      fused_pallas,
                                                      pyramid_pallas)
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle
    from deepmatching_stereo_matching_tpu.data import synthetic

    cfg = Config(max_disparity=MAX_D)
    geom = cfg.geometry(H, W)
    ndir = 2 * BATCH  # LR flip mode matches both directions per pair
    log(f"backend={jax.default_backend()} geom={geom} directions={ndir}")

    # Inputs: same synthetic population as bench.py.
    lp, rp = [], []
    for i in range(BATCH):
        rng = np.random.default_rng(100 + i)
        field = synthetic.block_disparity_field(H, W, MAX_D, rng, block=32)
        left, right, _ = synthetic.make_pair(H, W, field, seed=100 + i)
        lp.append(oracle.pad_image(oracle.to_grayscale_f32(left), geom))
        rp.append(oracle.pad_image(oracle.to_grayscale_f32(right), geom))
    lp = jnp.asarray(np.stack(lp))
    rp = jnp.asarray(np.stack(rp))
    np.asarray(jnp.zeros(()))  # first-transfer warm-up (axon relay)

    # Both-direction stacks, as the pipeline builds them.
    ls = jnp.concatenate([lp, rp[:, :, ::-1]])
    rs = jnp.concatenate([rp, lp[:, :, ::-1]])

    repeats = 3 if args.quick else 5
    rows = {}

    # --- full pipeline step (fused impl), bench.py equivalent ---
    step = jax.jit(lambda a, b: jax.vmap(
        lambda x, y: pipeline.match_padded_core(x, y, cfg, geom, "fused")
    )(a, b))
    t_full, st_full = time_fn(step, (lp, rp), repeats)
    rows["full_step_fused"] = {"seconds": t_full, "timing": st_full}
    log(f"full step (fused):      {t_full*1e3:8.2f} ms  "
        f"[{st_full['min']*1e3:.2f}..{st_full['max']*1e3:.2f}]")

    # --- fused kernel alone, all 64 directions ---
    fused = jax.jit(lambda a, b: jax.vmap(
        lambda x, y: fused_pallas.match_rows(x, y, cfg, geom))(a, b))
    t_fused, st_fused = time_fn(fused, (ls, rs), repeats)
    mxu, vpu, hbm = fused_model(geom, cfg)
    tb, bname = bound(mxu, vpu, hbm)
    sol = ndir * tb[bname]
    rows["fused_kernel"] = {
        "seconds": t_fused,
        "timing": st_fused,
        "per_direction_model": {
            "mxu_flops": mxu, "vpu_flops": vpu, "hbm_bytes": hbm,
            "unit_seconds_lower_bound": tb},
        "bounding_resource": bname,
        "sol_seconds": sol,
        "sol_fraction": sol / t_fused,
    }
    log(f"fused kernel x{ndir}:      {t_fused*1e3:8.2f} ms  "
        f"[{st_fused['min']*1e3:.2f}..{st_fused['max']*1e3:.2f}]   "
        f"SOL {sol*1e3:.2f} ms ({bname})  -> "
        f"{100 * sol / t_fused:.0f}% of SOL")

    # --- two-kernel path pieces ---
    def desc_fn(a, b):
        return (jax.vmap(lambda x: descriptors.left_descriptors(x, cfg))(a),
                jax.vmap(lambda x: descriptors.right_sliding_descriptors(
                    x, cfg))(b))

    desc_j = jax.jit(desc_fn)
    t_desc, st_desc = time_fn(desc_j, (ls, rs), repeats)
    rows["descriptors_xla"] = {"seconds": t_desc, "timing": st_desc}
    log(f"descriptors x{ndir}:       {t_desc*1e3:8.2f} ms")

    dsrc, dtgt = desc_j(ls, rs)
    cv = jax.jit(lambda a, b: jax.vmap(
        lambda x, y: costvol_pallas.cost_volume_dmajor(
            x, y, geom.disparities, cfg.patch_size, cfg.max_disparity)
    )(a, b))
    t_cv, st_cv = time_fn(cv, (dsrc, dtgt), repeats)
    rows["costvol_kernel"] = {"seconds": t_cv, "timing": st_cv}
    log(f"costvol kernel x{ndir}:    {t_cv*1e3:8.2f} ms")

    vol = cv(dsrc, dtgt)
    pyr = jax.jit(lambda v: jax.vmap(
        lambda x: pyramid_pallas.pyramid_backtrack(
            x, geom.levels, cfg.lam))(v))
    t_pyr, st_pyr = time_fn(pyr, (vol,), repeats)
    _, vpu2, hbm2 = twokernel_model(geom, cfg)
    t_pyr_sol = ndir * (vpu2["pyr"] / VPU)
    t_pyr_hbm = ndir * ((hbm2["vol_r"] + hbm2["out"]) / HBM)
    rows["pyramid_kernel"] = {
        "seconds": t_pyr,
        "timing": st_pyr,
        "sol_seconds_vpu": t_pyr_sol, "sol_seconds_hbm": t_pyr_hbm,
        "sol_fraction": max(t_pyr_sol, t_pyr_hbm) / t_pyr,
    }
    log(f"pyramid kernel x{ndir}:    {t_pyr*1e3:8.2f} ms   "
        f"SOL {max(t_pyr_sol, t_pyr_hbm)*1e3:.2f} ms")

    twok = {"seconds": t_desc + t_cv + t_pyr}
    tb2, bname2 = bound({}, vpu2, hbm2)
    twok["bounding_resource"] = bname2
    twok["sol_seconds"] = ndir * tb2[bname2]
    twok["per_direction_model"] = {"vpu_flops": vpu2, "hbm_bytes": hbm2,
                                   "unit_seconds_lower_bound": tb2}
    rows["twokernel_path_sum"] = twok
    log(f"two-kernel path sum:    {(t_desc + t_cv + t_pyr)*1e3:8.2f} ms   "
        f"SOL {twok['sol_seconds']*1e3:.2f} ms ({bname2})")

    # LR tail = full step minus the matching kernels.
    rows["lr_densify_tail"] = {"seconds": max(0.0, t_full - t_fused)}

    # Calibrated VPU ceiling (tools/vpu_ceiling.py): the spec 6.1
    # TFLOP/s assumes register-resident FMA streams; the measured
    # ceiling for the disparity loop's ACTUAL op mix (VMEM-resident
    # f32 mul/add through Mosaic) is far lower.  Report the fused
    # kernel's SOL against BOTH — the spec-model fraction is the
    # conservative headline, the calibrated fraction locates the
    # kernel against what this chip can actually execute.
    ceiling_path = os.path.join(REPO, "VPU_CEILING.json")
    calibrated = None
    if os.path.exists(ceiling_path):
        with open(ceiling_path) as f:
            ceil = json.load(f)
        vpu_cal = ceil["achieved_flop_per_s"]
        rate, label = mxu_rate()
        t_cal = {
            label: sum(mxu.values()) / rate,
            "VPU": sum(vpu.values()) / vpu_cal,
            "HBM": sum(hbm.values()) / HBM,
        }
        bname_cal = max(t_cal, key=t_cal.get)
        sol_cal = ndir * t_cal[bname_cal]
        calibrated = {
            "vpu_flop_per_s": vpu_cal,
            "sol_seconds": sol_cal,
            "sol_fraction": sol_cal / t_fused,
            "bounding_resource": bname_cal,
        }
        rows["fused_kernel"]["calibrated"] = calibrated
        log(f"calibrated VPU ceiling {vpu_cal/1e12:.2f} TFLOP/s -> "
            f"fused kernel at {100*sol_cal/t_fused:.0f}% of the "
            f"CALIBRATED SOL ({bname_cal})")

    out = {
        "chip": str(jax.devices()[0]),
        "peaks": {"mxu_bf16": MXU_BF16, "mxu_f32_highest": MXU_F32_HIGHEST,
                  "vpu": VPU, "hbm": HBM},
        "geometry": {"height": H, "width": W, "max_disparity": MAX_D,
                     "batch_pairs": BATCH, "directions": ndir,
                     "padded": [geom.padded_height, geom.padded_width],
                     "levels": geom.levels},
        "rows": rows,
        "headline": {
            "fused_sol_fraction": rows["fused_kernel"]["sol_fraction"],
            "fused_bounding_resource": rows["fused_kernel"]
                                           ["bounding_resource"],
            **({"fused_sol_fraction_calibrated":
                calibrated["sol_fraction"],
                "calibrated_vpu_tflops":
                round(calibrated["vpu_flop_per_s"] / 1e12, 2)}
               if calibrated else {}),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["headline"]))


if __name__ == "__main__":
    main()
