"""Fused Pallas cost-volume kernel (C4) — the reference's hot loop #1.

The reference computes per-patch correlations with Python loops over
patches and disparities (BASELINE.json:5 "per-patch correlation kernel
(NumPy/loop code) -> fused Pallas cost-volume kernel in HBM").  This
kernel computes the whole (H0, W0, D) volume in one fused pass with
blocks resident in VMEM.

Layout trick: the target column of patch j at disparity d is
x0 = p*j - d.  Writing d = p*dq + dr (p = patch_size), x0 lands on
*phase* r = (-d) mod p of the stride-p grid with a pure *patch-column
shift* s_d = ceil(d / p).  Pre-reshaping the sliding right descriptors
into Rq[i, r, c, q] = descR[i, p*q + r, c] therefore turns every
disparity's gather into a static lane shift of a (C, W0) tile — no
strided gathers on the lane axis, which TPUs cannot do efficiently.

Per grid step (one patch row i):
  L   (C, W0)      left descriptors, lanes = patch columns
  Rq  (p, C, W0)   phased right descriptors
  out (D, W0)      cost volume slice, written per-d (row writes)

For each d (static unroll): out[d] = relu(sum_c L * shift(Rq[r_d], s_d)),
a VPU multiply + sublane reduction.  Zero-padding the shift reproduces
the oracle's out-of-range-targets-score-0 rule exactly, and d >=
max_disparity bins are written as zeros (oracle/reference.py:cost_volume).

Output layout is (H0, D, W0); `cost_volume_pallas` transposes to the
pipeline's (H0, W0, D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._dispatch import use_interpret


def _kernel(l_ref, rq_ref, out_ref, *, disparities: int, patch_size: int,
            max_disparity: int):
    p = patch_size
    l_tile = l_ref[0]          # (C, W0)
    c_dim, w0 = l_tile.shape
    zeros_row = jnp.zeros((1, w0), dtype=jnp.float32)
    for d in range(disparities):
        if d >= max_disparity:
            out_ref[0, d, :] = zeros_row[0]
            continue
        dq, dr = divmod(d, p)
        if dr == 0:
            phase, shift = 0, dq
        else:
            phase, shift = p - dr, dq + 1
        r_tile = rq_ref[0, phase]  # (C, W0)
        if shift > 0:
            shifted = jnp.concatenate(
                [jnp.zeros((c_dim, shift), dtype=jnp.float32),
                 r_tile[:, : w0 - shift]], axis=1)
        else:
            shifted = r_tile
        corr = jnp.sum(l_tile * shifted, axis=0)      # (W0,) sublane reduce
        out_ref[0, d, :] = jnp.maximum(corr, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("disparities", "patch_size",
                                    "max_disparity", "interpret"))
def _cost_volume_rows(desc_l_t: jnp.ndarray, rq: jnp.ndarray,
                      disparities: int, patch_size: int, max_disparity: int,
                      interpret: bool) -> jnp.ndarray:
    """(H0, C, W0), (H0, p, C, W0) -> (H0, D, W0)."""
    h0, c, w0 = desc_l_t.shape
    p = patch_size
    kernel = functools.partial(
        _kernel, disparities=disparities, patch_size=patch_size,
        max_disparity=max_disparity)
    return pl.pallas_call(
        kernel,
        grid=(h0,),
        in_specs=[
            pl.BlockSpec((1, c, w0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, c, w0), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, disparities, w0), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h0, disparities, w0), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * h0 * w0 * max_disparity * c,
            bytes_accessed=4 * h0 * w0 * (c * (1 + p) + disparities),
            transcendentals=0,
        ),
        interpret=interpret,
    )(desc_l_t, rq)


def cost_volume(desc_l: jnp.ndarray, desc_r: jnp.ndarray, disparities: int,
                patch_size: int, max_disparity: int) -> jnp.ndarray:
    """Drop-in Pallas replacement for ops/costvol.py:cost_volume.

    Args/returns identical: (H0, W0, C) left descriptors and (H0, Wp, C)
    sliding right descriptors -> (H0, W0, D0) float32 cost volume.
    """
    h0, w0, c = desc_l.shape
    p = patch_size
    # Phased layouts (cheap XLA transposes, fused into neighbours).
    desc_l_t = jnp.transpose(desc_l, (0, 2, 1))              # (H0, C, W0)
    rq = desc_r.reshape(h0, w0, p, c).transpose(0, 2, 3, 1)  # (H0, p, C, W0)
    out = _cost_volume_rows(desc_l_t, rq, disparities, p, max_disparity,
                            use_interpret())
    return jnp.transpose(out, (0, 2, 1))                     # (H0, W0, D)
