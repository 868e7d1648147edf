#!/usr/bin/env python
"""Measure the chip's ACHIEVABLE VPU streaming throughput (r5).

The fused kernel's roofline (ROOFLINE.json) charges its elementwise
work against the v5e VPU spec figure (6.1 TFLOP/s).  The r5 knob sweep
(DLOOP_EXPERIMENTS.json) showed the disparity loop is insensitive to
matmul passes, scheduling, group size, and window prebuilding — it is
issue-bound on the pure multiply-accumulate stream itself.  This probe
measures what a VMEM-resident elementwise mul/add stream of EXACTLY the
disparity loop's shape can actually sustain on this chip through
Mosaic, with no slicing, no masks, no matmuls:

    plane(d) = a0*b0 + a1*b1 + a2*b2 + a3*b3      (4 mul + 3 add)

over (bp, w0) f32 arrays — the same 7 passes per disparity the real
acc_for() performs.  The resulting FLOP/s is the CALIBRATED VPU ceiling
for this op mix; tools/roofline.py reports SOL against both the spec
peak and this measured ceiling (ROOFLINE.json `vpu_calibrated`).

Writes VPU_CEILING.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BP, W0, NPLANES, GRID = 384, 128, 64, 64


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from deepmatching_stereo_matching_tpu.utils import timing

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    np.asarray(jnp.zeros(()))

    # Operand-pair schedule: every (d, i) product must be a UNIQUE
    # (j1, j2) pair or Mosaic/XLA CSE deduplicates the multiplies and
    # the probe overcounts (a first cut with period-16 affine indices
    # measured an impossible 175% of spec for exactly this reason).
    nsrc = 32
    pairs = [((5 * k + 1) % 31, ((3 * k + 7) % 29) + 3)
             for k in range(NPLANES * 4)]
    assert len(set(pairs)) == len(pairs), "CSE-able duplicate pairs"
    assert max(max(p) for p in pairs) < nsrc

    def kernel(a_ref, o_ref):
        a = a_ref[...]
        total = None
        for d in range(NPLANES):
            acc = None
            for i in range(4):
                j1, j2 = pairs[d * 4 + i]
                t = a[j1] * a[j2]
                acc = t if acc is None else acc + t
            total = acc if total is None else total + acc
        o_ref[...] = total

    a = jnp.asarray(np.random.default_rng(0).standard_normal(
        (nsrc, BP, W0), dtype=np.float32))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((32, BP, W0), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BP, W0), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BP, W0), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=GRID * NPLANES * 8 * BP * W0,
                bytes_accessed=32 * BP * W0 * 4 + BP * W0 * 4,
                transcendentals=0),
        )(x)

    stats = timing.steady_state(run, (a,))
    t = stats["median"]
    # 4 mul + 3 add + 1 inter-plane add per plane = 8 elementwise
    # FLOP-passes over (BP, W0).
    flops = GRID * NPLANES * 8 * BP * W0
    vregs = GRID * NPLANES * 8 * (BP // 8) * (W0 // 128)
    rate = flops / t
    clock = 0.94e9
    out = {
        "shape": [BP, W0], "planes": NPLANES, "grid": GRID,
        "seconds": t, "timing": stats,
        "elementwise_flops": flops,
        "achieved_flop_per_s": rate,
        "achieved_vreg_ops_per_cycle": vregs / (t * clock),
        "spec_vpu_flop_per_s": 6.1e12,
        "fraction_of_spec": rate / 6.1e12,
        "note": ("Pure VMEM-resident mul/add stream in the disparity "
                 "loop's exact shape; the achievable VPU ceiling for "
                 "this op mix through Mosaic on this chip."),
    }
    print(f"stream: {timing.fmt(stats)}  -> {rate/1e12:.2f} TFLOP/s "
          f"({out['fraction_of_spec']:.0%} of the 6.1 TFLOP/s spec), "
          f"{out['achieved_vreg_ops_per_cycle']:.2f} vreg-ops/cycle",
          file=sys.stderr, flush=True)

    # Robustness arms: (a) the dscale-sized small-array mix; (b) the
    # SHIFTED-operand mix — one operand of each product is a lane
    # slice at a varying non-128-multiple offset (a vreg funnel
    # shift), the real disparity loop's window access pattern.  Unique
    # (plane, offset) pairs keep CSE out.
    def small_kernel(a_ref, o_ref):
        total = None
        for d in range(NPLANES):
            acc = None
            for i in range(4):
                j1, j2 = pairs[d * 4 + i]
                tsm = a_ref[j1, :96] * a_ref[j2, :96]
                acc = tsm if acc is None else acc + tsm
            total = acc if total is None else total + acc
        o_ref[...] = total

    @jax.jit
    def run_small(x):
        return pl.pallas_call(
            small_kernel,
            grid=(8 * GRID,),
            in_specs=[pl.BlockSpec((32, BP, W0), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((96, W0), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((96, W0), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=8 * GRID * NPLANES * 8 * 96 * W0,
                bytes_accessed=32 * BP * W0 * 4, transcendentals=0),
        )(x)

    st2 = timing.steady_state(run_small, (a,))
    r2 = 8 * GRID * NPLANES * 8 * 96 * W0 / st2["median"]
    out["arm_small_96x128"] = {
        "seconds": st2["median"], "timing": st2,
        "achieved_flop_per_s": r2, "fraction_of_spec": r2 / 6.1e12}
    print(f"small-array arm: {timing.fmt(st2)} -> {r2/1e12:.2f} "
          f"TFLOP/s ({r2/6.1e12:.0%} of spec)",
          file=sys.stderr, flush=True)

    # Window REUSE like the real kernel: ~88 distinct (plane, offset)
    # windows shared across 256 unique products (j1 varies), at a
    # smaller row extent so the memoized windows fit scoped VMEM
    # (full-extent distinct-per-product windows demanded 82 MB).
    wn = W0 + 32
    bps = 192
    trips = [((5 * k + 1) % 31, ((3 * k + 7) % 8) + 3,
              ((7 * k + 3) % 11) + 1) for k in range(NPLANES * 4)]
    assert len(set(trips)) == len(trips)

    def shift_kernel(a_ref, o_ref):
        memo = {}

        def win(j2, o_):
            if (j2, o_) not in memo:
                memo[(j2, o_)] = a_ref[j2, :, o_: o_ + W0]
            return memo[(j2, o_)]

        total = None
        for d in range(NPLANES):
            acc = None
            for i in range(4):
                j1, j2, o_ = trips[d * 4 + i]
                tsh = a_ref[j1, :, 0:W0] * win(j2, o_)
                acc = tsh if acc is None else acc + tsh
            total = acc if total is None else total + acc
        o_ref[...] = total

    ash = jnp.asarray(np.random.default_rng(1).standard_normal(
        (nsrc, bps, wn), dtype=np.float32))

    @jax.jit
    def run_shift(x):
        return pl.pallas_call(
            shift_kernel,
            grid=(2 * GRID,),
            in_specs=[pl.BlockSpec((32, bps, wn), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bps, W0), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bps, W0), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * GRID * NPLANES * 8 * bps * W0,
                bytes_accessed=32 * bps * wn * 4, transcendentals=0),
        )(x)

    st3 = timing.steady_state(run_shift, (ash,))
    r3 = 2 * GRID * NPLANES * 8 * bps * W0 / st3["median"]
    out["arm_shifted_windows"] = {
        "seconds": st3["median"], "timing": st3,
        "achieved_flop_per_s": r3, "fraction_of_spec": r3 / 6.1e12,
        "note": ("one funnel-shifted operand per product — the real "
                 "dloop's window access; FLOPs exclude the shifts")}
    print(f"shifted-window arm: {timing.fmt(st3)} -> {r3/1e12:.2f} "
          f"TFLOP/s ({r3/6.1e12:.0%} of spec)",
          file=sys.stderr, flush=True)

    with open(os.path.join(REPO, "VPU_CEILING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote VPU_CEILING.json", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
