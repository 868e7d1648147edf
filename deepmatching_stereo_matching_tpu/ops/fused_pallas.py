"""Fused phased-correlation + pyramid + backtracking Pallas kernel (C2-C10).

The three-stage TPU path (descriptors -> cost-volume kernel -> pyramid
kernel) is HBM-bound on the *descriptor* tensors: the phased sliding
descriptors are ~8x the raw image and round-trip HBM twice before the
correlation kernel reads them (measured: descriptors + cost volume were
~85% of device time at Middlebury scale).  This path instead splits the
work by compute unit:

  * An **XLA prologue** (this file, `_phase_stack` / `_inv_*_norms`)
    phase-decomposes both images into p stride-p column slices and
    precomputes the inverse patch/window norms.  These are plain strided
    slices and small reductions — HBM-bandwidth work XLA compiles well —
    and grow HBM traffic per pair-direction only to ~2 MB (vs ~17 MB for
    materialised sliding descriptors).
  * The **Pallas kernel** keeps the level-0 cost volume, every pyramid
    level, and the pool-argmax offsets in VMEM and is pure VPU work:
    the disparity loop multiplies static lane slices of the phased
    arrays (d = p*dq + dr makes every disparity's target window a
    static slice, as in ops/costvol_pallas.py), patch-row sums are
    `reshape(bh, p, w0).sum(1)` (supported sublane reduction), and the
    pyramid + backtracking stage is byte-for-byte the duplicated-cell
    body of ops/pyramid_pallas.py (pyramid_body).

  A first fused design did the phase decomposition *inside* the kernel
  with exact 0/1 selection matmuls on the MXU at Precision.HIGHEST
  (Mosaic's only full-precision matmul).  Roofline measurement
  (tools/roofline.py) showed those matmuls bound the kernel at ~27% of
  the 6-pass-f32 MXU ceiling (M = block rows << 128) while VPU and HBM
  sat idle; moving the relayout into XLA strided slices removed ~0.5
  GFLOP of MXU work per pair-direction and left a VPU-bound kernel.

Normalisation is algebraic: cost[i,j,d] =
relu(<L_patch, R_window>) * invl * invr — mathematically equal to the
oracle's normalise-then-dot (oracle/reference.py:_normalize,
cost_volume) but rounds differently (the oracle divides each descriptor
element first).  Scores agree to ~1e-5 and disparity decisions match on
non-degenerate data; the bit-exact two-kernel path remains available as
impl='pallas' (see tests/test_fused_pallas.py).

Semantics mirrored from the oracle: out-of-range targets (p*j < d)
score exactly 0, padding bins d >= max_disparity are exactly 0, norms
are clamped at eps=1e-8, correlations are relu-clamped
(oracle/reference.py:cost_volume — the reference's NumPy hot loop,
SURVEY.md §3.2).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config, Geometry
from ._dispatch import use_interpret
from . import pyramid_pallas

_EPS = 1e-8
# VMEM ceiling for the fused kernel's resident state (cost volume and
# pyramid transients dominate); above this the caller must fall back to
# the two-kernel path.
_VMEM_BUDGET = 10 * 1024 * 1024


# ---------------------------------------------------------------------------
# XLA prologue: phase decomposition + inverse norms
# ---------------------------------------------------------------------------


def _phase_stack(img: jnp.ndarray, p: int, qh: int) -> jnp.ndarray:
    """(hp, Wpix) -> (p, hp, wn) with [o, y, qh + q] = img[y, p*q + o].

    Columns q' < qh (the disparity headroom) are zero; wn = Wpix//p + qh.
    A strided slice per phase — the XLA replacement for the original
    in-kernel 0/1 selection matmuls.
    """
    w0 = img.shape[1] // p
    return jnp.stack([
        jnp.pad(img[:, o::p], ((0, 0), (qh, 0))) for o in range(p)])


def _inv_left_norms(left_p: jnp.ndarray, p: int) -> jnp.ndarray:
    """(hp, wp) -> (h0, w0): 1 / max(||L_patch||, eps)."""
    hp, wp = left_p.shape
    h0, w0 = hp // p, wp // p
    sq = left_p * left_p
    m2 = sq.reshape(h0, p, w0, p).sum(axis=(1, 3))
    return 1.0 / jnp.maximum(jnp.sqrt(m2), jnp.float32(_EPS))


def _inv_right_norms(right_p: jnp.ndarray, p: int, qh: int) -> jnp.ndarray:
    """(hp, wp) -> (p, h0, wn): phased 1 / max(||R_window(x0)||, eps).

    The target window at column x0 spans rows [p*i, p*i + p) and columns
    [x0, x0 + p); windows overrunning the right image edge get partial
    sums, but those x0 are never selected by the disparity loop
    (x0 = p*j - d <= wp - p).  Zero-padded phase columns (q' < qh) give
    inv = 0 there, masked to exact 0 downstream by the p*j >= d rule.
    """
    hp, wp = right_p.shape
    h0 = hp // p
    r2row = (right_p * right_p).reshape(h0, p, wp).sum(axis=1)
    win = r2row
    for dc in range(1, p):
        win = win + jnp.pad(r2row[:, dc:], ((0, 0), (0, dc)))
    inv = 1.0 / jnp.maximum(jnp.sqrt(win), jnp.float32(_EPS))
    return _phase_stack(inv, p, qh)


# ---------------------------------------------------------------------------
# Pallas kernel: disparity loop + pyramid + backtracking (pure VPU)
# ---------------------------------------------------------------------------


def _cost_block(nl: jnp.ndarray, nr: jnp.ndarray, invl: jnp.ndarray,
                invr: jnp.ndarray, *, p: int, d0: int, max_d: int,
                qh: int, dtype) -> jnp.ndarray:
    """Phased (p, bp, wn) blocks -> (d0, bp//p, w0) cost block."""
    _, bp, wn = nl.shape
    bh = bp // p
    w0 = wn - qh

    # Disparity loop (hot loop #1, oracle/reference.py:cost_volume):
    # cost[i, j, d] = relu(<L_ij, R_window(p*j - d)>) * invl * invr,
    # 0 when the window starts left of the image or d >= max_disparity.
    jj = jax.lax.broadcasted_iota(jnp.int32, (bh, w0), 1)
    zero_plane = jnp.zeros((bh, w0), dtype=dtype)
    costs = []
    for d in range(d0):
        if d >= max_d:
            costs.append(zero_plane)
            continue
        dq, drem = divmod(d, p)
        acc = None
        for dc in range(p):
            o = (dc - drem) % p
            s = dq + (1 if dc < drem else 0)
            term = (nl[dc][:, qh: qh + w0]
                    * nr[o][:, qh - s: qh - s + w0])
            acc = term if acc is None else acc + term
        raw = acc.reshape(bh, p, w0).sum(axis=1)            # patch rows
        s_n = dq + (1 if drem else 0)
        corr = (raw * invl
                * invr[(-d) % p][:, qh - s_n: qh - s_n + w0])
        c = jnp.where(jj * p >= d, jnp.maximum(corr, 0.0), 0.0)
        costs.append(c.astype(dtype))

    return jnp.stack(costs, axis=0)                         # (d0, bh, w0)


def _kernel(nl_ref, nr_ref, invl_ref, invr_ref, disp_ref, score_ref, *,
            p: int, d0: int, max_d: int, qh: int, levels: int,
            lam: float, dtype):
    cost0 = _cost_block(nl_ref[...], nr_ref[...], invl_ref[...],
                        invr_ref[...], p=p, d0=d0, max_d=max_d, qh=qh,
                        dtype=dtype)
    k, sc = pyramid_pallas.pyramid_body(cost0, levels, lam)
    disp_ref[...] = k
    score_ref[...] = sc


def _block_rows(h0: int, unit: int) -> int:
    """Patch rows per grid step: lcm(2**levels, 8), or all of h0."""
    bh = unit * 8 // math.gcd(unit, 8)
    return bh if (h0 % bh == 0 and bh < h0) else h0


def _vmem_estimate(d0: int, bh: int, w0: int, p: int, qh: int,
                   itemsize: int) -> int:
    vol = d0 * bh * w0 * itemsize
    phased = 2 * p * (bh * p) * (w0 + qh) * 4
    norms = (p + 1) * bh * (w0 + qh) * 4
    return 2 * vol + 2 * phased + norms   # pyramid transients ~1x vol


def supported(cfg: Config, geom: Geometry) -> bool:
    """True when the fused kernel covers this configuration.

    Ineligible configs (gradient-histogram descriptors, centered
    descriptors, VMEM-oversized volumes, unaligned tile geometries)
    fall back to the exact two-kernel path in models/pipeline.py.
    """
    if cfg.descriptor != "patch" or cfg.center_descriptors:
        return False
    unit = 2 ** geom.levels
    h0, w0 = geom.grid_h, geom.grid_w
    if w0 % unit or h0 % unit or geom.disparities % unit:
        return False
    bh = _block_rows(h0, unit)
    if bh % unit:
        return False
    itemsize = jnp.dtype(cfg.dtype).itemsize
    qh = (cfg.max_disparity - 1) // cfg.patch_size + 2
    return _vmem_estimate(geom.disparities, bh, w0, cfg.patch_size, qh,
                          itemsize) <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("p", "d0", "max_d", "levels",
                                             "lam", "dtype", "interpret"))
def _match_rows(left_p: jnp.ndarray, right_p: jnp.ndarray, p: int, d0: int,
                max_d: int, levels: int, lam: float, dtype: str,
                interpret: bool):
    hp, wp = left_p.shape
    h0, w0 = hp // p, wp // p
    unit = 2 ** levels
    if hp % p or wp % p or w0 % unit or h0 % unit or d0 % unit:
        raise ValueError(
            f"padded pair {left_p.shape} not aligned to patch {p} / "
            f"quadtree unit {unit}")
    bh = _block_rows(h0, unit)
    qh = (max_d - 1) // p + 2
    wn = w0 + qh
    nl = _phase_stack(left_p, p, qh)
    nr = _phase_stack(right_p, p, qh)
    invl = _inv_left_norms(left_p, p)
    invr = _inv_right_norms(right_p, p, qh)
    kernel = functools.partial(_kernel, p=p, d0=d0, max_d=max_d, qh=qh,
                               levels=levels, lam=lam,
                               dtype=jnp.dtype(dtype))
    phase_spec = pl.BlockSpec((p, bh * p, wn), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    invl_spec = pl.BlockSpec((bh, w0), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    invr_spec = pl.BlockSpec((p, bh, wn), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bh, w0), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(h0 // bh,),
        in_specs=[phase_spec, phase_spec, invl_spec, invr_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((h0, w0), jnp.int32),
                   jax.ShapeDtypeStruct((h0, w0), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            # VPU disparity loop dominates; pyramid ~12 ops/cell.
            flops=2 * max_d * hp * w0 * (p + 1) + 12 * d0 * h0 * w0,
            bytes_accessed=4 * (2 * p * hp + (p + 1) * h0) * wn
            + 8 * h0 * w0,
            transcendentals=2 * d0 * h0 * w0,
        ),
        interpret=interpret,
    )(nl, nr, invl, invr)


def match_rows(left_p: jnp.ndarray, right_p: jnp.ndarray, cfg: Config,
               geom: Geometry):
    """Padded f32 pixel pair -> (disp_patch int32, score f32), (H0, W0).

    Fused fast path for forward matching with 'patch' descriptors;
    callers must check `supported(cfg, geom)` first.
    """
    return _match_rows(left_p, right_p, cfg.patch_size, geom.disparities,
                       cfg.max_disparity, geom.levels, cfg.lam, cfg.dtype,
                       use_interpret())
