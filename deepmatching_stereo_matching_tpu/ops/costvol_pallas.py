"""Fused Pallas cost-volume kernel (C4) — the reference's hot loop #1.

The reference computes per-patch correlations with Python loops over
patches and disparities (BASELINE.json:5 "per-patch correlation kernel
(NumPy/loop code) -> fused Pallas cost-volume kernel in HBM").  This
kernel computes the whole (H0, W0, D) volume in one fused pass with
blocks resident in VMEM.

Layout trick: the target column of patch j at disparity d is
x0 = p*j -+ d (+ halo origin).  Writing d = p*dq + dr (p = patch_size),
x0 lands on *phase* r = (-+d) mod p of the stride-p target grid with a
pure *patch-column shift*.  Pre-reshaping the sliding target descriptors
into Rq[i, r, c, q] = desc_tgt[i, p*q + r, c] therefore turns every
disparity's gather into a static lane slice of a (C, Wr) tile — no
strided gathers on the lane axis, which TPUs cannot do efficiently.

Per grid step (one patch row i):
  S   (C, W0)      source patch descriptors, lanes = patch columns
  Rq  (p, C, Wr)   phased target descriptors (Wr >= W0 when extended
                   with halo columns, SURVEY.md §5.7)
  out (D, W0)      cost volume slice

For each d (static unroll): out[d] = relu(sum_c S * slice(Rq[r_d])),
a VPU multiply + sublane reduction.  Zero padding of out-of-range slices
reproduces the oracle's out-of-range-targets-score-0 rule exactly, and
d >= max_disparity bins are written as zeros
(oracle/reference.py:cost_volume).

`reverse` and `origin_offset` have the same meaning as in
ops/costvol.py (direct R->L matching and halo-extended targets for the
sharded pipeline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._dispatch import use_interpret


def _phase_and_start(d: int, patch_size: int, origin_offset: int,
                     reverse: bool):
    """Static (phase, slice-start) for disparity d (see module docstring)."""
    dq, dr = divmod(d, patch_size)
    if reverse:
        return dr, origin_offset + dq
    if dr == 0:
        return 0, origin_offset - dq
    return patch_size - dr, origin_offset - dq - 1


def _kernel(s_ref, rq_ref, out_ref, *, disparities: int, patch_size: int,
            max_disparity: int, origin_offset: int, reverse: bool):
    s_tile = s_ref[0]          # (C, W0)
    c_dim, w0 = s_tile.shape
    wr = rq_ref.shape[-1]
    dt = out_ref.dtype
    for d in range(disparities):
        if d >= max_disparity:
            out_ref[0, d, :] = jnp.zeros((w0,), dtype=dt)
            continue
        phase, st = _phase_and_start(d, patch_size, origin_offset, reverse)
        lpad = max(0, -st)
        rpad = max(0, st + w0 - wr)
        if lpad + rpad >= w0:
            out_ref[0, d, :] = jnp.zeros((w0,), dtype=dt)
            continue
        core = rq_ref[0, phase][:, max(0, st): min(wr, st + w0)]
        parts = []
        if lpad:
            parts.append(jnp.zeros((c_dim, lpad), dtype=dt))
        parts.append(core)
        if rpad:
            parts.append(jnp.zeros((c_dim, rpad), dtype=dt))
        shifted = jnp.concatenate(parts, axis=1) if len(parts) > 1 else core
        # f32 accumulation even for bf16 storage (sublane reduce).
        corr = jnp.sum(s_tile * shifted, axis=0, dtype=jnp.float32)
        out_ref[0, d, :] = jnp.maximum(corr, 0.0).astype(dt)


@functools.partial(jax.jit,
                   static_argnames=("disparities", "patch_size",
                                    "max_disparity", "origin_offset",
                                    "reverse", "interpret"))
def _cost_volume_rows(desc_s_t: jnp.ndarray, rq: jnp.ndarray,
                      disparities: int, patch_size: int, max_disparity: int,
                      origin_offset: int, reverse: bool,
                      interpret: bool) -> jnp.ndarray:
    """(H0, C, W0), (H0, p, C, Wr) -> (H0, D, W0)."""
    h0, c, w0 = desc_s_t.shape
    p = patch_size
    wr = rq.shape[-1]
    kernel = functools.partial(
        _kernel, disparities=disparities, patch_size=patch_size,
        max_disparity=max_disparity, origin_offset=origin_offset,
        reverse=reverse)
    return pl.pallas_call(
        kernel,
        grid=(h0,),
        in_specs=[
            pl.BlockSpec((1, c, w0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, c, wr), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, disparities, w0), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h0, disparities, w0),
                                       desc_s_t.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * h0 * w0 * max_disparity * c,
            bytes_accessed=4 * h0 * (w0 * (c + disparities) + p * c * wr),
            transcendentals=0,
        ),
        interpret=interpret,
    )(desc_s_t, rq)


def cost_volume(desc_src: jnp.ndarray, desc_tgt: jnp.ndarray,
                disparities: int, patch_size: int, max_disparity: int,
                reverse: bool = False, origin_offset: int = 0
                ) -> jnp.ndarray:
    """Drop-in Pallas replacement for ops/costvol.py:cost_volume.

    Same contract: (H0, W0, C) source patch descriptors and (H0, Wt, C)
    target sliding descriptors -> (H0, W0, D0) float32 cost volume.
    Requires Wt to be a multiple of patch_size (pipeline geometry
    guarantees this).
    """
    h0, w0, c = desc_src.shape
    wt = desc_tgt.shape[1]
    p = patch_size
    if wt % p:
        raise ValueError(f"target descriptor width {wt} not divisible by {p}")
    # Phased layouts (cheap XLA transposes, fused into neighbours).
    desc_s_t = jnp.transpose(desc_src, (0, 2, 1))              # (H0, C, W0)
    rq = desc_tgt.reshape(h0, wt // p, p, c).transpose(0, 2, 3, 1)
    out = _cost_volume_rows(desc_s_t, rq, disparities, p, max_disparity,
                            origin_offset, reverse, use_interpret())
    return jnp.transpose(out, (0, 2, 1))                       # (H0, W0, D)
