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
    Sel_o[x, q] = (x == p*(q - qh) + o).  By default these run as TWO
    native-speed bf16 passes over a hi+residual split of the image
    operand (_DOT_PREC="split2", ~2^-16 relative accuracy, measured
    10.5% faster end-to-end than Mosaic's 6-pass f32 HIGHEST with a
    8.9e-6 decision-disagreement rate; tools/fused_experiments.py /
    FUSED_EXPERIMENTS.json); _DOT_PREC="highest" restores the exact
    6-pass selection (each output then sums one monomial x*1.0 plus
    exact zeros).
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

# Experiment knobs (tools/fused_experiments.py measures these on chip;
# the defaults are the measured winners):
#   _ROW_SUM: how the p patch-row partial sums reduce — "matmul" uses
#     the exact 0/1 row-compaction matmul on the MXU, "reshape" a
#     sublane reshape+sum on the VPU (both exact f32 sums of the same
#     p terms in the same order).
#   _BLOCK_ROWS_OVERRIDE: force the grid's patch-rows-per-step.
#   _DOT_PREC: MXU precision scheme for the selection/compaction
#     matmuls — "highest" is Mosaic's 6-pass full-precision f32;
#     "split2"/"split3" decompose the ARBITRARY operand into 2/3 bf16
#     terms (hi + residual[ + residual²]) against the exact-0/1 other
#     operand, costing 2/3 native-speed bf16 MXU passes for ~2^-16 /
#     ~2^-24 relative accuracy (each pass's products are exact-0/1
#     selections of bf16 terms, accumulated in f32).
_ROW_SUM = "matmul"
_BLOCK_ROWS_OVERRIDE = None
# Measured on chip (FUSED_EXPERIMENTS.json, Middlebury bench geometry):
#   highest 4.27 ms/step, split3 4.93 ms, split2 3.82 ms (-10.5%),
#   reshape row-sums 5.64 ms; split2's decision disagreement vs highest
#   is 8.9e-6 (1 in ~112k patches, near-ties at ~1e-5 score deltas) —
#   far inside the fused path's documented tolerance and bench.py's
#   0.5% parity gate.
_DOT_PREC = "split2"


def _split_terms(x: jnp.ndarray, n: int) -> list:
    """x (f32) as n bf16 terms: x ~= sum(t_i) to ~8n mantissa bits."""
    terms = []
    r = x
    for _ in range(n - 1):
        h = r.astype(jnp.bfloat16)
        terms.append(h)
        r = r - h.astype(jnp.float32)
    terms.append(r.astype(jnp.bfloat16))
    return terms


def _dot_split(arb: jnp.ndarray, sel: jnp.ndarray, arb_left: bool
               ) -> jnp.ndarray:
    """arb @ sel (or sel @ arb) with the split-bf16 scheme of _DOT_PREC.

    `sel` holds exact bf16 values (0/1 selection / compaction weights);
    `arb` is arbitrary f32.  Each bf16 pass accumulates in f32 on the
    MXU; the passes sum the split terms back, so accuracy is set by the
    residual cut (~2^-16 for split2, ~2^-24 for split3), NOT by bf16's
    2^-8 — measured decision flips vs HIGHEST: 0 at the bench geometry
    (FUSED_EXPERIMENTS.json).
    """
    n = 2 if _DOT_PREC == "split2" else 3
    s16 = sel.astype(jnp.bfloat16)
    out = None
    for t in _split_terms(arb, n):
        y = (jnp.dot(t, s16, preferred_element_type=jnp.float32)
             if arb_left else
             jnp.dot(s16, t, preferred_element_type=jnp.float32))
        out = y if out is None else out + y
    return out


def _dot_arb_sel(arb: jnp.ndarray, sel: jnp.ndarray) -> jnp.ndarray:
    """Matmul of an arbitrary-f32 LEFT operand with 0/1 selections."""
    if _DOT_PREC == "highest":
        return _dot(arb, sel)
    return _dot_split(arb, sel, arb_left=True)


def _dot_sel_arb(sel: jnp.ndarray, arb: jnp.ndarray) -> jnp.ndarray:
    """Matmul of 0/1 compaction weights with an arbitrary-f32 RIGHT."""
    if _DOT_PREC == "highest":
        return _dot(sel, arb)
    return _dot_split(arb, sel, arb_left=False)


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
    # NR[o][y, qh + q] = right[y, p*q + o] (0 outside); the LEFT image
    # never needs the qh halo columns (every use below slices
    # [qh : qh + w0]), so its selections are built at exactly w0 lanes
    # — one 128-lane MXU tile instead of two at bench geometry, and a
    # static (unsliced) operand in the disparity loop.
    sels = [_selection(wp, wn, p, qh, o) for o in range(p)]
    lsels = [_selection(wp, w0, p, 0, o) for o in range(p)]
    nl = [_dot_arb_sel(left, s) for s in lsels]  # p x (bp, w0)
    nr = [_dot_arb_sel(right, s) for s in sels]  # p x (bp, wn)
    cpt = _row_compaction(bh, bp, p) if _ROW_SUM == "matmul" else None

    def rows(x):
        """Sum the p patch rows: (bp, n) -> (bh, n)."""
        if cpt is not None:
            return _dot_sel_arb(cpt, x)
        return x.reshape(bh, p, x.shape[-1]).sum(axis=1)

    # Left patch norms: nl2[i, j] = sum_{dr,dc} left[p*i+dr, p*j+dc]^2.
    m2 = None
    for o in range(p):
        sq = nl[o] * nl[o]
        m2 = sq if m2 is None else m2 + sq
    invl = 1.0 / jnp.maximum(jnp.sqrt(rows(m2)), _EPS)        # (bh, w0)

    # Right sliding-window norms on the x0 grid: the target window at
    # x0 spans columns [x0, x0+p) and rows [p*i, p*i+p).
    r2row = rows(right * right)                               # (bh, wp)
    win = r2row
    for dc in range(1, p):
        win = win + _shift_left(r2row, dc)
    nr_x0 = jnp.sqrt(win)                                     # (bh, wp)
    # Phase it like the data so each d's norms are a static lane slice.
    invr = [1.0 / jnp.maximum(_dot_arb_sel(nr_x0, s), _EPS) for s in sels]

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
            term = nl[dc] * nr[o][:, qh - s: qh - s + w0]
            acc = term if acc is None else acc + term
        raw = rows(acc)                                       # (bh, w0)
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


def _block_rows(h0: int, unit: int, d0: int = 64, w0: int = 128,
                p: int = 4, qh: int = 17, itemsize: int = 4) -> int:
    """Patch rows per grid step.

    Bigger blocks raise the selection matmuls' M dimension (M = bh*p
    rows) toward full 128-row MXU tiles — measured 3.99 -> 3.10 ms/step
    going from bh=16 (M=64) to bh=48 (M=192) at the bench geometry
    (FUSED_EXPERIMENTS.json / tools/fused_experiments.py).  Picks the
    LARGEST bh that (a) divides h0, (b) is a multiple of
    lcm(2**levels, 8) so pyramid merges stay in-block and Mosaic's
    sublane tiling holds, (c) keeps bh*p <= 192 pixel rows (M = 384
    blocks crash the remote compile helper), and (d) fits the VMEM
    budget.  Falls back to whole-h0 when nothing divides.
    """
    if _BLOCK_ROWS_OVERRIDE is not None:
        return _BLOCK_ROWS_OVERRIDE
    base = unit * 8 // math.gcd(unit, 8)
    # (bf16 blocks used to trip a Mosaic i1-relayout bug at any size;
    # pyramid_pallas.pyramid_body's c32 comparison widening fixed it —
    # measured bf16 bh=48 compiles and runs at 4.74 ms/step.)
    best = None
    m = base
    while m < h0 and m * p <= 192:
        if h0 % m == 0 and _vmem_estimate(d0, m, w0, p, qh,
                                          itemsize) <= _VMEM_BUDGET:
            best = m
        m += base
    return best if best is not None else h0


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
    itemsize = jnp.dtype(cfg.dtype).itemsize
    qh = (cfg.max_disparity - 1) // cfg.patch_size + 2
    bh = _block_rows(h0, unit, geom.disparities, w0, cfg.patch_size, qh,
                     itemsize)
    if bh % unit:
        return False
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
    qh = (max_d - 1) // p + 2
    itemsize_pick = jnp.dtype(dtype).itemsize
    bh = _block_rows(h0, unit, d0, w0, p, qh, itemsize_pick)
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
