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


def _kernel_dmajor(s_ref, rq_ref, out_ref, *, disparities: int,
                   patch_size: int, max_disparity: int, origin_offset: int,
                   reverse: bool):
    """Row-block variant storing (D, rb, W0) planes (D-major layout).

    Processes `rb` patch rows per grid step (rb is a sublane multiple, so
    the output block satisfies Mosaic's (8, 128) tiling) and vectorises
    the correlation over rows as well as columns.
    """
    s_blk = s_ref[...]          # (rb, C, W0)
    rb, c_dim, w0 = s_blk.shape
    wr = rq_ref.shape[-1]
    dt = out_ref.dtype
    for d in range(disparities):
        if d >= max_disparity:
            out_ref[d] = jnp.zeros((rb, w0), dtype=dt)
            continue
        phase, st = _phase_and_start(d, patch_size, origin_offset, reverse)
        lpad = max(0, -st)
        rpad = max(0, st + w0 - wr)
        if lpad + rpad >= w0:
            out_ref[d] = jnp.zeros((rb, w0), dtype=dt)
            continue
        core = rq_ref[:, phase][:, :, max(0, st): min(wr, st + w0)]
        parts = []
        if lpad:
            parts.append(jnp.zeros((rb, c_dim, lpad), dtype=dt))
        parts.append(core)
        if rpad:
            parts.append(jnp.zeros((rb, c_dim, rpad), dtype=dt))
        shifted = jnp.concatenate(parts, axis=2) if len(parts) > 1 else core
        corr = jnp.sum(s_blk * shifted, axis=1, dtype=jnp.float32)
        out_ref[d] = jnp.maximum(corr, 0.0).astype(dt)


@functools.partial(jax.jit,
                   static_argnames=("disparities", "patch_size",
                                    "max_disparity", "origin_offset",
                                    "reverse", "interpret", "dmajor"))
def _cost_volume_rows(desc_s_t: jnp.ndarray, rq: jnp.ndarray,
                      disparities: int, patch_size: int, max_disparity: int,
                      origin_offset: int, reverse: bool,
                      interpret: bool, dmajor: bool = False) -> jnp.ndarray:
    """(H0, C, W0), (H0, p, C, Wr) -> (H0, D, W0), or (D, H0, W0) D-major."""
    h0, c, w0 = desc_s_t.shape
    p = patch_size
    wr = rq.shape[-1]
    cost = pl.CostEstimate(
        flops=2 * h0 * w0 * max_disparity * c,
        bytes_accessed=4 * h0 * (w0 * (c + disparities) + p * c * wr),
        transcendentals=0,
    )
    if dmajor:
        # Row-blocked grid; rb must be a sublane multiple (or all of h0)
        # for the (D, rb, W0) output block to tile.
        rb = 8 if h0 % 8 == 0 else h0
        kernel = functools.partial(
            _kernel_dmajor, disparities=disparities, patch_size=patch_size,
            max_disparity=max_disparity, origin_offset=origin_offset,
            reverse=reverse)
        return pl.pallas_call(
            kernel,
            grid=(h0 // rb,),
            in_specs=[
                pl.BlockSpec((rb, c, w0), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, p, c, wr), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((disparities, rb, w0),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((disparities, h0, w0),
                                           desc_s_t.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(desc_s_t, rq)
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
        cost_estimate=cost,
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


def cost_volume_slab(desc_src: jnp.ndarray, desc_tgt: jnp.ndarray,
                     disparities: int, patch_size: int, max_disparity: int,
                     reverse: bool = False, d_offset=0) -> jnp.ndarray:
    """Disparity-SLAB Pallas cost volume: global bins [d_offset,
    d_offset + disparities) with a possibly TRACED d_offset.

    Drop-in for ops/costvol.py:cost_volume(..., d_offset=...) — the form
    the dslab/ringd sharded strategies use (`d_offset = axis_index *
    slab` inside shard_map, so one program serves every slab).  The
    kernel's static per-disparity phase/slice schedule cannot depend on
    a traced offset, so the slab shift is applied to the TARGET array
    instead: global bin d = d_offset + d_loc reads target column
    p*j -+ (d_offset + d_loc), which equals local bin d_loc against the
    target pre-shifted by d_offset pixels (exact: d_offset is a
    multiple of p by slab alignment, so the shift is q_off = d_offset/p
    whole patch columns; shifted-in columns are zeros, which score 0 —
    the oracle's out-of-range rule).  Bins at global d >= max_disparity
    are zeroed by a post-mask (exact zeros, as in the jnp path).
    """
    h0, w0, c = desc_src.shape
    wt = desc_tgt.shape[1]
    p = patch_size
    if wt % p:
        raise ValueError(f"target descriptor width {wt} not divisible by {p}")
    if disparities % p:
        # d_offset is a traced multiple of the slab size `disparities`;
        # the whole-patch-column shift below is exact ONLY when every
        # offset is a multiple of p.  Callers (sharded.slab_cost_volume)
        # must use the jnp path for unaligned slabs.
        raise ValueError(
            f"slab size {disparities} not a multiple of patch {p}: "
            f"d_offset would not be patch-aligned")
    q_off = jnp.asarray(d_offset, jnp.int32) // p
    zeros = jnp.zeros_like(desc_tgt)
    if reverse:
        # x0 = p*j + d_offset + d_loc: shift target LEFT by q_off
        # patch columns, zero-fill on the right.
        ext = jnp.concatenate([desc_tgt, zeros], axis=1)
        shifted = jax.lax.dynamic_slice_in_dim(ext, p * q_off, wt, axis=1)
    else:
        # x0 = p*j - d_offset - d_loc: shift target RIGHT by q_off
        # patch columns, zero-fill on the left (global x0 < 0 -> 0).
        ext = jnp.concatenate([zeros, desc_tgt], axis=1)
        shifted = jax.lax.dynamic_slice_in_dim(ext, wt - p * q_off, wt,
                                               axis=1)
    vol = cost_volume(desc_src, shifted, disparities, p,
                      max_disparity=disparities, reverse=reverse)
    d_glob = (jnp.arange(disparities, dtype=jnp.int32)
              + jnp.asarray(d_offset, jnp.int32))
    return jnp.where(d_glob[None, None, :] < max_disparity, vol,
                     jnp.zeros((), vol.dtype))


def cost_volume_dmajor(desc_src: jnp.ndarray, desc_tgt: jnp.ndarray,
                       disparities: int, patch_size: int, max_disparity: int,
                       reverse: bool = False, origin_offset: int = 0
                       ) -> jnp.ndarray:
    """Like `cost_volume` but emits the (D, H0, W0) D-major layout.

    This is the layout ops/pyramid_pallas.py consumes: the kernel stores
    each disparity's row directly into its (H0, W0) plane, so neither
    side pays the (H0, W0, D) <-> (D, H0, W0) relayout of the whole
    volume in HBM.
    """
    h0, w0, c = desc_src.shape
    wt = desc_tgt.shape[1]
    p = patch_size
    if wt % p:
        raise ValueError(f"target descriptor width {wt} not divisible by {p}")
    desc_s_t = jnp.transpose(desc_src, (0, 2, 1))              # (H0, C, W0)
    rq = desc_tgt.reshape(h0, wt // p, p, c).transpose(0, 2, 3, 1)
    return _cost_volume_rows(desc_s_t, rq, disparities, p, max_disparity,
                             origin_offset, reverse, use_interpret(),
                             dmajor=True)
