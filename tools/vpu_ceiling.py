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
    with open(os.path.join(REPO, "VPU_CEILING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote VPU_CEILING.json", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
