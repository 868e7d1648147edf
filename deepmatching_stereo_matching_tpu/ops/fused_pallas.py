"""Fully fused image->disparity Pallas kernel (C2-C10 in ONE kernel).

The three-stage TPU path (descriptors -> cost-volume kernel -> pyramid
kernel) is HBM-bound on the *descriptor* tensors: the phased sliding
descriptors are ~8x the raw image and round-trip HBM twice before the
correlation kernel reads them (measured: descriptors + cost volume were
~85% of device time at Middlebury scale).  This kernel instead reads the
RAW padded image rows and keeps everything else — descriptors, the
level-0 cost volume, every pyramid level, the pool-argmax offsets — in
VMEM.  HBM traffic per pair-direction drops from ~17 MB to ~1.7 MB
(two image reads + the patch-level disparity/score writes).

How each stage avoids unsupported vector relayouts:

  * Patch phasing (the stride-p pixel->patch-column relayout that XLA
    otherwise does with a materialised transpose-copy) is done on the
    MXU with 0/1 *selection matmuls*: NL_o = L @ Sel_o where
    Sel_o[x, q] = (x == p*(q - qh) + o).  A selection matmul is exact
    in f32 (each output sums one monomial x*1.0 plus exact zeros).
  * Per-row sums over the p patch rows (descriptor norms and the
    cost-volume row reduction) are row-compaction matmuls with
    Cp[i, y] = (y // p == i) — again exact selections plus an f32 MXU
    accumulation of p terms.
  * The disparity loop reuses the phase decomposition of
    ops/costvol_pallas.py: d = p*dq + dr makes every disparity's target
    window a static lane slice of a phased array, so the inner loop is
    pure VPU multiply-add on (bh*p, W0) tiles.
  * Normalisation is algebraic: cost[i,j,d] =
    relu(<L_patch, R_window> / (max(|L|,eps) * max(|R_window|,eps))) —
    mathematically equal to the oracle's normalise-then-dot
    (oracle/reference.py:_normalize, cost_volume) but rounds
    differently (the oracle divides each descriptor element first).
    Scores agree to ~1e-6 and disparity decisions match on
    non-degenerate data; the bit-exact two-kernel path remains
    available as impl='pallas' (see tests/test_fused_pallas.py).
  * The pyramid + backtracking stage is byte-for-byte the
    duplicated-cell body of ops/pyramid_pallas.py (pyramid_body),
    running on the VMEM-resident volume.

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


def _shift_left(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """y[., i] = x[., i + s] on the lane axis (wrap never selected)."""
    if s == 0:
        return x
    lo = jax.lax.slice_in_dim(x, s, x.shape[-1], 1, -1)
    hi = jax.lax.slice_in_dim(x, 0, s, 1, -1)
    return jax.lax.concatenate([lo, hi], x.ndim - 1)


def _selection(wp: int, wn: int, p: int, qh: int, o: int) -> jnp.ndarray:
    """Sel[x, q'] = 1.0 where x == p*(q' - qh) + o (0/1 f32 matrix)."""
    ix = jax.lax.broadcasted_iota(jnp.int32, (wp, wn), 0)
    iq = jax.lax.broadcasted_iota(jnp.int32, (wp, wn), 1)
    return (ix == p * (iq - qh) + o).astype(jnp.float32)


def _row_compaction(bh: int, bp: int, p: int) -> jnp.ndarray:
    """Cp[i, y] = 1.0 where y // p == i ((bh, bh*p) 0/1 f32 matrix)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (bh, bp), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (bh, bp), 1)
    return (ii == iy // p).astype(jnp.float32)


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f32 MXU matmul at full operand precision.

    TPU MXUs multiply bf16 operands by default, which would truncate
    the image values flowing through the selection/compaction matmuls
    (measured: ~1e-2 cost-volume error, ~2.5% disparity flips).
    HIGHEST forces the multipass f32 decomposition, which is EXACT
    here: every matmul in this kernel multiplies f32 values by
    exact-{0,1} selection weights and accumulates in f32.  (Mosaic
    rejects Precision.HIGH inside kernels; HIGHEST is the only
    full-precision option.)
    """
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _cost_block(left: jnp.ndarray, right: jnp.ndarray, *, p: int, d0: int,
                max_d: int, qh: int, dtype) -> jnp.ndarray:
    """(bp, Wp) f32 image row blocks -> (d0, bp//p, Wp//p) cost block."""
    bp, wp = left.shape
    bh, w0 = bp // p, wp // p
    wn = w0 + qh

    # Phased columns of both images via exact selection matmuls:
    # NL[o][y, qh + q] = left[y, p*q + o] (0 outside), same for NR.
    sels = [_selection(wp, wn, p, qh, o) for o in range(p)]
    nl = [_dot(left, s) for s in sels]   # p x (bp, wn)
    nr = [_dot(right, s) for s in sels]
    cpt = _row_compaction(bh, bp, p)

    # Left patch norms: nl2[i, j] = sum_{dr,dc} left[p*i+dr, p*j+dc]^2.
    m2 = None
    for o in range(p):
        sq = nl[o][:, qh: qh + w0]
        sq = sq * sq
        m2 = sq if m2 is None else m2 + sq
    invl = 1.0 / jnp.maximum(jnp.sqrt(_dot(cpt, m2)), _EPS)   # (bh, w0)

    # Right sliding-window norms on the x0 grid: the target window at
    # x0 spans columns [x0, x0+p) and rows [p*i, p*i+p).
    r2row = _dot(cpt, right * right)                          # (bh, wp)
    win = r2row
    for dc in range(1, p):
        win = win + _shift_left(r2row, dc)
    nr_x0 = jnp.sqrt(win)                                     # (bh, wp)
    # Phase it like the data so each d's norms are a static lane slice.
    invr = [1.0 / jnp.maximum(_dot(nr_x0, s), _EPS) for s in sels]

    # Disparity loop (hot loop #1, oracle/reference.py:cost_volume):
    # cost[i, j, d] = relu(<L_ij, R_window(p*j - d)>) / norms, 0 when
    # the window starts left of the image or d >= max_disparity.
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
        raw = _dot(cpt, acc)                                  # (bh, w0)
        s_n = dq + (1 if drem else 0)
        corr = (raw * invl
                * invr[(-d) % p][:, qh - s_n: qh - s_n + w0])
        c = jnp.where(jj * p >= d, jnp.maximum(corr, 0.0), 0.0)
        costs.append(c.astype(dtype))

    return jnp.stack(costs, axis=0)                           # (d0, bh, w0)


def _kernel(l_ref, r_ref, disp_ref, score_ref, *, p: int, d0: int,
            max_d: int, qh: int, levels: int, lam: float, dtype):
    cost0 = _cost_block(l_ref[...], r_ref[...], p=p, d0=d0, max_d=max_d,
                        qh=qh, dtype=dtype)
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
    images = 2 * (bh * p) * (w0 * p) * 4
    return 2 * vol + phased + images      # pyramid transients ~1x vol


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
    kernel = functools.partial(_kernel, p=p, d0=d0, max_d=max_d, qh=qh,
                               levels=levels, lam=lam,
                               dtype=jnp.dtype(dtype))
    in_spec = pl.BlockSpec((bh * p, wp), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bh, w0), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    itemsize = jnp.dtype(dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid=(h0 // bh,),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((h0, w0), jnp.int32),
                   jax.ShapeDtypeStruct((h0, w0), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            # Selection/compaction matmuls dominate the FLOP count.
            flops=2 * hp * wp * (w0 + qh) * 2 * p
            + 2 * max_d * h0 * w0 * (p * p + p)
            + 12 * d0 * h0 * w0,
            bytes_accessed=4 * 2 * hp * wp + 8 * h0 * w0,
            transcendentals=2 * d0 * h0 * w0,
        ),
        interpret=interpret,
    )(left_p, right_p)


def match_rows(left_p: jnp.ndarray, right_p: jnp.ndarray, cfg: Config,
               geom: Geometry):
    """Padded f32 pixel pair -> (disp_patch int32, score f32), (H0, W0).

    Fused fast path for forward matching with 'patch' descriptors;
    callers must check `supported(cfg, geom)` first.
    """
    return _match_rows(left_p, right_p, cfg.patch_size, geom.disparities,
                       cfg.max_disparity, geom.levels, cfg.lam, cfg.dtype,
                       use_interpret())
