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

How each stage avoids unsupported vector relayouts (Mosaic on v5e
supports neither strided lane slices nor lane-splitting reshapes —
probed on-chip, both fail):

  * Patch phasing (the stride-p pixel->patch-column relayout that XLA
    otherwise does with a materialised transpose-copy) is done on the
    MXU with 0/1 *selection matmuls*, CHUNKED over 128-lane spans of
    the pixel axis: lanes x in [128c, 128(c+1)) hold exactly the
    columns q in [32c, 32(c+1)) of ALL p phases (x = p*q + o), so one
    (128, 128) selection per chunk phases every o at once — p times
    fewer MXU FLOPs than full-width per-phase selections, bitwise
    identical (each output sums one selected value plus exact zeros).
    By default the selections run as TWO native-speed bf16 passes over
    a hi+residual split of the image operand
    (Config.fused_dot_precision="split2", ~2^-16 relative accuracy,
    ~1e-5 decision-disagreement vs exact on near-ties;
    tools/fused_experiments.py / FUSED_EXPERIMENTS.json);
    "highest" restores the exact 6-pass selection.
  * Per-row sums over the p patch rows (descriptor norms and the
    cost-volume row reduction) are row-compaction matmuls with
    Cp[i, y] = (y // p == i) — exact selections plus an f32 MXU
    accumulation of p terms.  The disparity loop's compactions (the
    largest MXU term) are batched _DLOOP_GROUP disparities per matmul
    so the N dimension fills _DLOOP_GROUP 128-lane tiles per weight
    load instead of one.
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
# the defaults are the measured winners — FUSED_EXPERIMENTS.json):
#   _ROW_SUM: how the p patch-row partial sums reduce — "matmul" uses
#     the exact 0/1 row-compaction matmul on the MXU, "reshape" a
#     sublane reshape+sum on the VPU (both f32 sums of the same p
#     terms; the reshape path may round in a different tree order).
#   _DLOOP_ROWS: row-sum method for the disparity loop specifically
#     (None follows _ROW_SUM); "group" batches _DLOOP_GROUP
#     disparities' compactions into one matmul.
#   _PHASING: "chunk" = 128-lane-chunked all-phase selection matmuls
#     (default; p x fewer FLOPs); "selmm" = one full-width selection
#     matmul per phase (the r03 formulation, kept as a control arm).
#   _BLOCK_ROWS_OVERRIDE: force the grid's patch-rows-per-step.
#   _DOT_PREC: override Config.fused_dot_precision (None = use cfg) —
#     "highest" is Mosaic's 6-pass full-precision f32;
#     "split2"/"split3" decompose the ARBITRARY operand into 2/3 bf16
#     terms (hi + residual[ + residual²]) against the exact-0/1 other
#     operand, costing 2/3 native-speed bf16 MXU passes for ~2^-16 /
#     ~2^-24 relative accuracy (each pass's products are exact-0/1
#     selections of bf16 terms, accumulated in f32).
#   _SKIP_PYRAMID: ablation only — replace the pyramid/backtracking
#     stage with a trivial reduction so the prologue+disparity-loop
#     cost can be timed in isolation (tools/fused_experiments.py).
_ROW_SUM = "matmul"
_DLOOP_ROWS = "group"
_DLOOP_GROUP = 8
_PHASING = "chunk"
_BLOCK_ROWS_OVERRIDE = None
_DOT_PREC = None
_SKIP_PYRAMID = False
# Disparity-loop scheduling knobs (tools/dloop_experiments.py):
#   _DLOOP_SCHED: "inline" slices each group's compaction result right
#     after its matmul (the r04 form — the slice VPU ops depend on the
#     MXU result, so in-order issue stalls the next group's VPU work
#     behind the matmul); "deferred" issues ALL groups' matmuls first
#     and slices afterwards, exposing MXU/VPU overlap between group g's
#     matmul and group g+1's accumulation.  Bitwise identical.
#   _DCOMP_PREC: precision override for the DISPARITY-LOOP compaction
#     matmuls only (None follows the main scheme).  "bf16" is a single
#     native pass truncating the pre-normalisation correlation sums to
#     bf16 (~2^-8) — decision flips measured on chip before shipping.
#   _MEMO_PREBUILD: cut every distinct shifted window BEFORE the
#     disparity loop (one funnel-shift batch) instead of lazily at
#     first use inside it.
_DLOOP_SCHED = "inline"
_DCOMP_PREC = None
_MEMO_PREBUILD = False
# grad_hist kernel form: "magbin" exploits the features' one-hot x
# magnitude structure (descriptors.grad_hist_magbin) — the descriptor
# dot is mag_L*mag_R*[bin_L == bin_R], so the kernel carries TWO planes
# per image instead of 8 interleaved feature rows and the row group
# stays p.  Identical products in a different f32 summation tree (the
# dc-sum mixes bins within a pixel row; the interleaved form sums each
# bin's row first): scores agree to ~1e-5, decisions gated like every
# fused variant (measured bit-equal decisions; tests/test_fused_pallas).
# "interleave" keeps the r04 F=8 feature-interleaved-rows form.
_GRADHIST_MODE = "magbin"
# How the magbin equality mask applies (tools/dloop_experiments.py):
#   "where"   term = where(binL == binR, magL*magR, 0)
#   "mulmask" term = magL*magR * f32(binL == binR)
#   "relu"    term = magL*magR * relu(1 - |binL - binR|) — no i1 mask
#     vectors at all (Mosaic relayouts of i1 are a known sore spot);
#     exact for integer-valued bins: |diff| >= 1 -> 0, diff == 0 -> 1.
_GH_MASK = "where"
# Ablation-only knobs (WRONG RESULTS when set; timing isolation for
# tools/ablate_fused.py): _ABL_FIXED_SLICE pins every disparity-loop
# lane slice to offset 0 (isolates lane-rotation cost);
# _ABL_LIVE_D truncates the disparity loop to its first N planes.
_ABL_FIXED_SLICE = False
_ABL_LIVE_D = None
# Fast pyramid mode: defer power rectification past each next level's
# disparity pool (exact-math-equal, 2x fewer rectified planes, top
# rectification skipped; exp2-based pow).  Values round differently
# from jnp.power, so this stays inside the fused path's tolerance gate.
_PYR_FAST = True


def dot_precision(cfg: Config) -> str:
    """Effective selection-matmul precision scheme for `cfg`."""
    return _DOT_PREC or cfg.fused_dot_precision


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


def _dot_split(arb: jnp.ndarray, sel: jnp.ndarray, arb_left: bool,
               prec: str) -> jnp.ndarray:
    """arb @ sel (or sel @ arb) with the split-bf16 scheme `prec`.

    `sel` holds exact bf16 values (0/1 selection / compaction weights);
    `arb` is arbitrary f32.  Each bf16 pass accumulates in f32 on the
    MXU; the passes sum the split terms back, so accuracy is set by the
    residual cut (~2^-16 for split2, ~2^-24 for split3), NOT by bf16's
    2^-8 — measured decision flips vs HIGHEST: ~1e-5 at the bench
    geometry (FUSED_EXPERIMENTS.json).
    """
    n = {"split2": 2, "split3": 3, "bf16": 1}.get(prec, 3)
    s16 = sel.astype(jnp.bfloat16)
    out = None
    for t in _split_terms(arb, n):
        y = (jnp.dot(t, s16, preferred_element_type=jnp.float32)
             if arb_left else
             jnp.dot(s16, t, preferred_element_type=jnp.float32))
        out = y if out is None else out + y
    return out


def _dot_arb_sel(arb: jnp.ndarray, sel: jnp.ndarray, prec: str
                 ) -> jnp.ndarray:
    """Matmul of an arbitrary-f32 LEFT operand with 0/1 selections."""
    if prec == "highest":
        return _dot(arb, sel)
    return _dot_split(arb, sel, True, prec)


def _dot_sel_arb(sel: jnp.ndarray, arb: jnp.ndarray, prec: str
                 ) -> jnp.ndarray:
    """Matmul of 0/1 compaction weights with an arbitrary-f32 RIGHT."""
    if prec == "highest":
        return _dot(sel, arb)
    return _dot_split(arb, sel, False, prec)


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


def _phase_all(img: jnp.ndarray, p: int, prec: str) -> list:
    """All p phases of `img` ((m, wp) -> p x (m, wp//p)), on the MXU.

    out[o][y, q] = img[y, p*q + o].  When the pixel width is a multiple
    of the 128-lane tile, lanes x in [128c, 128(c+1)) hold exactly the
    columns q in [qper*c, qper*(c+1)) of every phase (x = p*q + o with
    qper = 128//p), so ONE (128, 128) selection matmul per chunk
    produces all p phases' columns for that span — p x fewer MXU FLOPs
    than per-phase full-width selections, and bitwise identical (each
    output element sums one selected value plus exact zeros, in any
    accumulation order).  Falls back to full-width per-phase selections
    for unaligned widths or under the "selmm" experiment knob.
    """
    m, wp = img.shape
    w0 = wp // p
    ch = 128
    if _PHASING == "selmm" or wp % ch or ch % p:
        return [_dot_arb_sel(img, _selection(wp, w0, p, 0, o), prec)
                for o in range(p)]
    qper = ch // p
    nchunk = wp // ch
    ix = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    iq = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    # Column iq encodes (o, q_local) = (iq // qper, iq % qper).
    sel = (ix == p * (iq % qper) + iq // qper).astype(jnp.float32)
    outs = [_dot_arb_sel(img[:, c * ch:(c + 1) * ch], sel, prec)
            for c in range(nchunk)]
    return [jax.lax.concatenate(
        [o_[:, o * qper:(o + 1) * qper] for o_ in outs], 1)
        for o in range(p)]


def _with_halo(phase: jnp.ndarray, qh: int) -> jnp.ndarray:
    """Prepend qh zero columns (the out-of-image target halo)."""
    m = phase.shape[0]
    return jax.lax.concatenate(
        [jnp.zeros((m, qh), phase.dtype), phase], 1)


def _row_selection(bh: int, bp: int, p: int, dr: int) -> jnp.ndarray:
    """RSel[i, y] = 1.0 where y == p*i + dr ((bh, bp) 0/1 f32)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (bh, bp), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (bh, bp), 1)
    return (iy == p * ii + dr).astype(jnp.float32)


def _cost_block_rowphase(left: jnp.ndarray, right: jnp.ndarray, *, p: int,
                         d0: int, max_d: int, qh: int, prec: str,
                         dtype) -> jnp.ndarray:
    """Row-phased `_cost_block`: no per-disparity compaction matmuls.

    The lane-phased formulation's disparity loop is MXU-cycle-bound on
    the per-disparity row-compaction matmuls (K = bh*p to sum p values
    per output — 98% of the MACs multiply zeros; measured ~2/3 of the
    cost stage, ABLATE_FUSED.json).  Here both images are additionally
    split by pixel-ROW phase dr (left[p*i + dr, :]) with p row-selection
    matmuls per image — ONCE per block — so every descriptor element
    (dr, dc) lives in its own (bh, w0) plane and the disparity loop is
    a pure VPU multiply-accumulate over the p*p planes with NO row
    reduction afterwards.  The p-row sum happens in the accumulator
    chain (dc-major, dr-minor order; f32 rounding therefore differs
    from the oracle's dot order within the fused path's documented
    ~1e-6 score tolerance).
    """
    bp, wp = left.shape
    bh, w0 = bp // p, wp // p
    rsels = [_row_selection(bh, bp, p, dr) for dr in range(p)]
    lr = [_dot_sel_arb(rs, left, prec) for rs in rsels]   # p x (bh, wp)
    rr = [_dot_sel_arb(rs, right, prec) for rs in rsels]
    nl = [_phase_all(x, p, prec) for x in lr]             # p x p x (bh, w0)
    nr = [[_with_halo(ph, qh) for ph in _phase_all(x, p, prec)]
          for x in rr]                                    # p x p x (bh, wn)

    # Left patch norms, directly at patch-row granularity.
    m2 = None
    for dr in range(p):
        for dc in range(p):
            sq = nl[dr][dc] * nl[dr][dc]
            m2 = sq if m2 is None else m2 + sq
    invl = 1.0 / jnp.maximum(jnp.sqrt(m2), _EPS)          # (bh, w0)

    # Right sliding-window norms on the x0 grid.
    r2row = None
    for dr in range(p):
        sq = rr[dr] * rr[dr]
        r2row = sq if r2row is None else r2row + sq       # (bh, wp)
    win = r2row
    for dc in range(1, p):
        win = win + _shift_left(r2row, dc)
    nr_x0 = jnp.sqrt(win)
    invr = [1.0 / jnp.maximum(_with_halo(ph, qh), _EPS)
            for ph in _phase_all(nr_x0, p, prec)]

    jj = jax.lax.broadcasted_iota(jnp.int32, (bh, w0), 1)
    zero_plane = jnp.zeros((bh, w0), dtype=dtype)

    def cost_for(d):
        dq, drem = divmod(d, p)
        acc = None
        for dc in range(p):
            o = (dc - drem) % p
            s = dq + (1 if dc < drem else 0)
            a = 0 if _ABL_FIXED_SLICE else qh - s
            for dr in range(p):
                term = nl[dr][dc] * nr[dr][o][:, a: a + w0]
                acc = term if acc is None else acc + term
        s_n = dq + (1 if drem else 0)
        a = 0 if _ABL_FIXED_SLICE else qh - s_n
        corr = acc * invl * invr[(-d) % p][:, a: a + w0]
        c = jnp.where(jj * p >= d, jnp.maximum(corr, 0.0), 0.0)
        return c.astype(dtype)

    live = min(d0, max_d)
    if _ABL_LIVE_D is not None:
        live = min(live, _ABL_LIVE_D)
    costs = [cost_for(d) if d < live else zero_plane for d in range(d0)]
    return jnp.stack(costs, axis=0)                       # (d0, bh, w0)


def _cost_block(left: jnp.ndarray, right: jnp.ndarray, *, p: int, d0: int,
                max_d: int, qh: int, prec: str, dtype,
                f_feat: int = 1, left_bin=None,
                right_bin=None) -> jnp.ndarray:
    """(bp, Wp) f32 FEATURE row blocks -> (d0, bp//(p*F), Wp//p) costs.

    For multi-feature descriptors (grad_hist: F = 8 orientation bins)
    the rows are the FEATURE-INTERLEAVED image: row y*F + f holds
    feature f of pixel row y.  The descriptor dot sums over
    (row, column, feature) = (dr, dc, f); since phasing acts on
    COLUMNS only and the row-compaction is just "sum groups of
    consecutive rows", the whole kernel works unchanged with the row
    group widened from p to p*F — the patch case is F = 1.

    MAGBIN form (left_bin/right_bin given, f_feat == 1): left/right are
    the L1 MAGNITUDE planes and the bins are f32 orientation indices
    (descriptors.grad_hist_magbin).  The one-hot feature dot collapses
    to mag_L*mag_R*[bin_L == bin_R]: norms run on the magnitude planes
    unchanged (sum_f (mag*1_f)^2 = mag^2) and the disparity loop gains
    one equality-mask per (dc) term.  The PRODUCTS equal the
    interleaved F = 8 form's exactly, but the f32 summation tree
    differs (the dc-sum here mixes bins within a pixel row; the
    interleaved form sums each bin's feature row over dc first), so
    scores agree to ~1e-5 and decisions are tolerance-gated like every
    fused variant.  Bin phasing is exact: values 0..7 are exact in
    bf16, so every split scheme's hi term carries them with a zero
    residual; the halo's bin 0 can only "match" where its magnitude 0
    zeroes the product anyway.
    """
    bp, wp = left.shape
    g = p * f_feat
    bh, w0 = bp // g, wp // p
    magbin = left_bin is not None

    # Phased columns of both images via exact selection matmuls:
    # NR[o][y, qh + q] = right[y, p*q + o] (0 in the qh-column halo —
    # targets left of the image); the LEFT image never needs the halo
    # (every use below slices [qh : qh + w0]).
    nl = _phase_all(left, p, prec)                  # p x (bp, w0)
    nr = [_with_halo(ph, qh) for ph in _phase_all(right, p, prec)]
    if magbin:
        nlb = _phase_all(left_bin, p, prec)
        nrb = [_with_halo(ph, qh) for ph in _phase_all(right_bin, p, prec)]
    cpt = _row_compaction(bh, bp, g) if _ROW_SUM == "matmul" else None

    def rows(x):
        """Sum each patch's p*F feature rows: (bp, n) -> (bh, n)."""
        if cpt is not None:
            return _dot_sel_arb(cpt, x, prec)
        return x.reshape(bh, g, x.shape[-1]).sum(axis=1)

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
    invr = [1.0 / jnp.maximum(_with_halo(ph, qh), _EPS)
            for ph in _phase_all(nr_x0, p, prec)]

    # Disparity loop (hot loop #1, oracle/reference.py:cost_volume):
    # cost[i, j, d] = relu(<L_ij, R_window(p*j - d)>) / norms, 0 when
    # the window starts left of the image or d >= max_disparity.
    dloop_rows = _DLOOP_ROWS or _ROW_SUM
    jj = jax.lax.broadcasted_iota(jnp.int32, (bh, w0), 1)
    zero_plane = jnp.zeros((bh, w0), dtype=dtype)

    # Shifted-window memo: the d-loop needs nr[o] at lane offsets
    # qh - s for s in [0, max_dq + 1] — only p * (max_dq + 2) DISTINCT
    # windows across the whole loop, but naively slicing inside the
    # loop materialises p per disparity (4x more).  Lane slices at
    # non-128-multiple offsets are vreg funnel shifts — measured ~75%
    # of the cost stage's time at the bench geometry (ABLATE_FUSED.json
    # fixed-slice arm) — so each distinct window is cut exactly once
    # and reused via this memo (Mosaic liveness is SSA-based, so the
    # Python dict does not extend VMEM lifetimes).
    sh_memo, shi_memo, shb_memo = {}, {}, {}

    def sh(o, s):
        if (o, s) not in sh_memo:
            a = 0 if _ABL_FIXED_SLICE else qh - s
            sh_memo[(o, s)] = nr[o][:, a: a + w0]
        return sh_memo[(o, s)]

    def shi(o, s):
        if (o, s) not in shi_memo:
            a = 0 if _ABL_FIXED_SLICE else qh - s
            shi_memo[(o, s)] = invr[o][:, a: a + w0]
        return shi_memo[(o, s)]

    def shb(o, s):
        if (o, s) not in shb_memo:
            a = 0 if _ABL_FIXED_SLICE else qh - s
            shb_memo[(o, s)] = nrb[o][:, a: a + w0]
        return shb_memo[(o, s)]

    def acc_for(d):
        """Unreduced (bp, w0) sum of the p phase products for `d`."""
        dq, drem = divmod(d, p)
        acc = None
        for dc in range(p):
            o = (dc - drem) % p
            s = dq + (1 if dc < drem else 0)
            if magbin:
                prod = nl[dc] * sh(o, s)
                if _GH_MASK == "relu":
                    d_ = nlb[dc] - shb(o, s)
                    term = prod * jnp.maximum(
                        1.0 - jnp.abs(d_), jnp.float32(0.0))
                elif _GH_MASK == "mulmask":
                    term = prod * (nlb[dc] == shb(o, s)
                                   ).astype(jnp.float32)
                else:
                    term = jnp.where(nlb[dc] == shb(o, s), prod,
                                     jnp.float32(0.0))
            else:
                term = nl[dc] * sh(o, s)
            acc = term if acc is None else acc + term
        return acc

    def scale(raw, d):
        """(bh, w0) row-reduced correlations -> masked cost plane.

        The p*j < d mask is load-bearing: a window STARTING left of
        the image may still have in-range taps (partial window), so
        the halo zeros alone do not reproduce the oracle's whole-patch
        zero rule.
        """
        dq, drem = divmod(d, p)
        s_n = dq + (1 if drem else 0)
        corr = raw * invl * shi((-d) % p, s_n)
        c = jnp.where(jj * p >= d, jnp.maximum(corr, 0.0), 0.0)
        return c.astype(dtype)

    live = list(range(min(d0, max_d)))
    if _ABL_LIVE_D is not None:
        live = live[:_ABL_LIVE_D]
    if _MEMO_PREBUILD:
        # Cut every distinct shifted window up front (one funnel-shift
        # batch with no interleaved matmul dependencies) instead of
        # lazily inside the loop.  Values identical; order only.
        for d in live:
            dq, drem = divmod(d, p)
            for dc in range(p):
                o_s = ((dc - drem) % p, dq + (1 if dc < drem else 0))
                sh(*o_s)
                if magbin:
                    shb(*o_s)
            shi((-d) % p, dq + (1 if drem else 0))
    if dloop_rows == "group" and cpt is not None:
        # Batch the row compactions: one (bh, bp) @ (bp, G*w0) matmul
        # covers G disparities, filling G 128-lane N tiles per weight
        # load instead of one.  (Named gn, NOT g: g above is the
        # row-group width p*f_feat used by rows()/red().)
        gn = _DLOOP_GROUP
        dprec = _DCOMP_PREC or prec
        raws = {}
        if _DLOOP_SCHED == "deferred":
            # Issue every group's accumulation + compaction matmul
            # before ANY result is sliced: the slice vreg copies depend
            # on the MXU result, so in-order VPU issue would otherwise
            # stall each group boundary on the matmul (see knob doc).
            groups = [live[g0:g0 + gn] for g0 in range(0, len(live), gn)]
            rs = []
            for grp in groups:
                cat = jax.lax.concatenate([acc_for(d) for d in grp], 1)
                rs.append(_dot_sel_arb(cpt, cat, dprec))      # (bh, G*w0)
            for r, grp in zip(rs, groups):
                for i, d in enumerate(grp):
                    raws[d] = r[:, i * w0:(i + 1) * w0]
        else:
            for g0 in range(0, len(live), gn):
                grp = live[g0:g0 + gn]
                cat = jax.lax.concatenate([acc_for(d) for d in grp], 1)
                r = _dot_sel_arb(cpt, cat, dprec)             # (bh, G*w0)
                for i, d in enumerate(grp):
                    raws[d] = r[:, i * w0:(i + 1) * w0]
        costs = [scale(raws[d], d) if d in raws else zero_plane
                 for d in range(d0)]
    else:
        def red(x):
            if dloop_rows == "matmul" and cpt is not None:
                return _dot_sel_arb(cpt, x, prec)
            return x.reshape(bh, g, w0).sum(axis=1)

        on = set(live)
        costs = [scale(red(acc_for(d)), d) if d in on else zero_plane
                 for d in range(d0)]

    return jnp.stack(costs, axis=0)                           # (d0, bh, w0)


def _kernel(l_ref, r_ref, disp_ref, score_ref, *scratch, p: int, d0: int,
            max_d: int, qh: int, levels: int, lam: float, prec: str,
            dtype, f_feat: int = 1, magbin: bool = False):
    if magbin:
        # l_ref/r_ref carry (2, bp, wp) stacked (magnitude, bin) planes.
        cost0 = _cost_block(l_ref[0], r_ref[0], p=p, d0=d0,
                            max_d=max_d, qh=qh, prec=prec, dtype=dtype,
                            left_bin=l_ref[1], right_bin=r_ref[1])
    elif _PHASING == "rowphase" and f_feat == 1:
        cost0 = _cost_block_rowphase(l_ref[...], r_ref[...], p=p, d0=d0,
                                     max_d=max_d, qh=qh, prec=prec,
                                     dtype=dtype)
    else:
        cost0 = _cost_block(l_ref[...], r_ref[...], p=p, d0=d0,
                            max_d=max_d, qh=qh, prec=prec, dtype=dtype,
                            f_feat=f_feat)
    if _SKIP_PYRAMID:
        # Ablation arm: consume the volume with a trivial reduce so the
        # prologue + disparity loop can be timed without the pyramid.
        disp_ref[...] = jnp.zeros(cost0.shape[1:], jnp.int32)
        score_ref[...] = jnp.sum(cost0, axis=0).astype(jnp.float32)
        return
    if scratch:
        # Large d0: backtracking selects need REF-based fori_loops
        # (pyramid_pallas._plane_select); park the volume in scratch so
        # the score select can load it dynamically.
        scratch[0][...] = cost0
        k, sc = pyramid_pallas.pyramid_body(
            cost0, levels, lam, fast=_PYR_FAST, cost_ref=scratch[0],
            args_refs=list(scratch[1:]))
    else:
        k, sc = pyramid_pallas.pyramid_body(cost0, levels, lam,
                                            fast=_PYR_FAST)
    disp_ref[...] = k
    score_ref[...] = sc


def _block_rows(h0: int, unit: int, d0: int = 64, w0: int = 128,
                p: int = 4, qh: int = 17, itemsize: int = 4,
                f_feat: int = 1, magbin: bool = False) -> int:
    """Patch rows per grid step.

    Bigger blocks raise the selection matmuls' M dimension (M = bh*p
    rows) toward full 128-row MXU tiles and cut grid steps
    (FUSED_EXPERIMENTS.json's bh arms measure the spread — auto/96
    measured faster than the forced bh=16 arm).  Picks the LARGEST bh
    that (a)
    divides h0, (b) is a multiple of lcm(2**levels, 8) so pyramid
    merges stay in-block and Mosaic's sublane tiling holds, (c) keeps
    bh*p <= 192 pixel rows (M = 384 blocks crash the remote compile
    helper), and (d) fits the VMEM budget.  Falls back to whole-h0
    when nothing divides.
    """
    if _BLOCK_ROWS_OVERRIDE is not None:
        return _BLOCK_ROWS_OVERRIDE
    base = unit * 8 // math.gcd(unit, 8)
    # Row cap: full-width (selmm) selection IR crashes the compile
    # helper at M >= 384; the chunked selections compile at least to
    # M = 512 (measured: bh=96 patch blocks and bh=16 grad_hist blocks
    # both build) — the cap is what admits F = 8 descriptors.
    cap = 512 if _PHASING == "chunk" else 192
    best = None
    m = base
    while m < h0 and m * p * f_feat <= cap:
        if h0 % m == 0 and _vmem_estimate(d0, m, w0, p, qh, itemsize,
                                          f_feat, magbin) <= _VMEM_BUDGET:
            best = m
        m += base
    return best if best is not None else h0


def _vmem_estimate(d0: int, bh: int, w0: int, p: int, qh: int,
                   itemsize: int, f_feat: int = 1,
                   magbin: bool = False) -> int:
    vol = d0 * bh * w0 * itemsize
    nplanes = 2 if magbin else 1  # magbin carries (mag, bin) per image
    phased = nplanes * 2 * p * (bh * p * f_feat) * (w0 + qh) * 4
    images = nplanes * 2 * (bh * p * f_feat) * (w0 * p) * 4
    # Large d0 adds REF-based backtracking scratch: a second full cost
    # block plus ~1x vol of int32 per-level args (see _match_rows).
    scratch = 2 * vol if d0 > pyramid_pallas._UNROLL_MAX else 0
    return 2 * vol + phased + images + scratch  # pyramid transients ~1x vol


def _n_features(cfg: Config) -> int:
    return 1 if cfg.descriptor == "patch" else 8


def _gh_magbin(cfg: Config) -> bool:
    return cfg.descriptor == "grad_hist" and _GRADHIST_MODE == "magbin"


def supported(cfg: Config, geom: Geometry) -> bool:
    """True when the fused kernel covers this configuration.

    Both descriptor modes are covered ('grad_hist' runs the kernel on
    (magnitude, bin) planes by default — _GRADHIST_MODE — or on
    feature-interleaved rows, F = 8); centered descriptors,
    VMEM-oversized volumes, and unaligned tile geometries fall back to
    the exact two-kernel path in models/pipeline.py.
    """
    if cfg.center_descriptors:
        return False
    magbin = _gh_magbin(cfg)
    f = 1 if magbin else _n_features(cfg)
    unit = 2 ** geom.levels
    h0, w0 = geom.grid_h, geom.grid_w
    if w0 % unit or h0 % unit or geom.disparities % unit:
        return False
    itemsize = jnp.dtype(cfg.dtype).itemsize
    qh = (cfg.max_disparity - 1) // cfg.patch_size + 2
    bh = _block_rows(h0, unit, geom.disparities, w0, cfg.patch_size, qh,
                     itemsize, f, magbin)
    if bh % unit:
        return False
    return _vmem_estimate(geom.disparities, bh, w0, cfg.patch_size, qh,
                          itemsize, f, magbin) <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("p", "d0", "max_d", "levels",
                                             "lam", "prec", "dtype",
                                             "interpret", "f_feat",
                                             "magbin"))
def _match_rows(left_p: jnp.ndarray, right_p: jnp.ndarray, p: int, d0: int,
                max_d: int, levels: int, lam: float, prec: str, dtype: str,
                interpret: bool, f_feat: int = 1, magbin: bool = False):
    """One pallas_call for BOTH input forms: (Hp*F, Wp) feature rows
    (patch F=1 / interleaved F=8), or — magbin=True — (2, Hp, Wp)
    stacked (magnitude, bin) planes with f_feat == 1."""
    if magbin:
        _, hp, wp = left_p.shape
    else:
        hp, wp = left_p.shape
    g = p * f_feat
    h0, w0 = hp // g, wp // p
    unit = 2 ** levels
    if hp % g or wp % p or w0 % unit or h0 % unit or d0 % unit:
        raise ValueError(
            f"padded pair {left_p.shape} not aligned to patch {p} "
            f"(x{f_feat} features) / quadtree unit {unit}")
    qh = (max_d - 1) // p + 2
    itemsize_pick = jnp.dtype(dtype).itemsize
    bh = _block_rows(h0, unit, d0, w0, p, qh, itemsize_pick, f_feat,
                     magbin)
    kernel = functools.partial(_kernel, p=p, d0=d0, max_d=max_d, qh=qh,
                               levels=levels, lam=lam, prec=prec,
                               dtype=jnp.dtype(dtype), f_feat=f_feat,
                               magbin=magbin)
    in_spec = (pl.BlockSpec((2, bh * g, wp), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM) if magbin else
               pl.BlockSpec((bh * g, wp), lambda i: (i, 0),
                            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((bh, w0), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    itemsize = jnp.dtype(dtype).itemsize
    scratch = ([pltpu.VMEM((d0, bh, w0), jnp.dtype(dtype))]
               + [pltpu.VMEM((d0 >> (l + 1), bh, w0), jnp.int32)
                  for l in range(levels)]
               if d0 > pyramid_pallas._UNROLL_MAX else [])
    return pl.pallas_call(
        kernel,
        grid=(h0 // bh,),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=scratch,
        out_shape=(jax.ShapeDtypeStruct((h0, w0), jnp.int32),
                   jax.ShapeDtypeStruct((h0, w0), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            # Selection/compaction matmuls dominate the FLOP count.
            flops=(2 if magbin else 1) * 2 * hp * wp * (w0 + qh) * 2 * p
            + 2 * max_d * h0 * w0 * (p * p + p)
            + 12 * d0 * h0 * w0,
            bytes_accessed=(2 if magbin else 1) * 4 * 2 * hp * wp
            + 8 * h0 * w0,
            transcendentals=2 * d0 * h0 * w0,
        ),
        interpret=interpret,
    )(left_p, right_p)


def interleave_features(feat: jnp.ndarray) -> jnp.ndarray:
    """(Hp, Wp, F) pixel features -> (Hp*F, Wp) feature-interleaved rows
    (row y*F + f holds feature f of pixel row y) — the layout
    `_cost_block` consumes for multi-feature descriptors."""
    hp, wp, f = feat.shape
    return jnp.swapaxes(feat, 1, 2).reshape(hp * f, wp)


def match_rows(left_p: jnp.ndarray, right_p: jnp.ndarray, cfg: Config,
               geom: Geometry):
    """Padded f32 pixel pair -> (disp_patch int32, score f32), (H0, W0).

    Fused fast path for forward matching; callers must check
    `supported(cfg, geom)` first.  grad_hist mode computes the pixel
    features in XLA (exact comparison binning, models/descriptors.py)
    and feeds the kernel either (magnitude, bin) plane pairs (magbin,
    the default — 2 planes/image, one-hot dot as an equality-masked
    product) or feature-interleaved rows (F = 8); both are exact
    factorings of the one-hot descriptor dot, far less HBM than the
    sliding-descriptor tensors of the two-kernel path, and no
    descriptor round trips.
    """
    if _gh_magbin(cfg):
        from ..models import descriptors as desc_mod

        lm, lb = desc_mod.grad_hist_magbin(left_p)
        rm, rb = desc_mod.grad_hist_magbin(right_p)
        return _match_rows(
            jnp.stack([lm, lb]), jnp.stack([rm, rb]), cfg.patch_size,
            geom.disparities, cfg.max_disparity, geom.levels, cfg.lam,
            dot_precision(cfg), cfg.dtype, use_interpret(), 1, True)
    f = _n_features(cfg)
    if f > 1:
        from ..models import descriptors as desc_mod

        left_p = interleave_features(desc_mod.grad_hist_pixels(left_p))
        right_p = interleave_features(desc_mod.grad_hist_pixels(right_p))
    return _match_rows(left_p, right_p, cfg.patch_size, geom.disparities,
                       cfg.max_disparity, geom.levels, cfg.lam,
                       dot_precision(cfg), cfg.dtype, use_interpret(),
                       f)


# ---------------------------------------------------------------------------
# Fused image -> D-major COST VOLUME kernel (the large-D prologue):
# the same raw-image phasing / norms / disparity loop as the full fused
# kernel, but writing the (D, H0, W0) volume to HBM instead of running
# the VMEM-resident pyramid — for volumes too large for `supported`.
# Replaces the XLA descriptor stage + descriptor-fed cost kernel (whose
# phased descriptor tensors are ~8x the image and round-trip HBM);
# pairs with pyramid_pallas.aggregate_slabs via
# models/pipeline.py:match_dmajor_xla.  Same tolerance class as the
# fused kernel (algebraic normalisation; bench gates decisions).
# ---------------------------------------------------------------------------


def _cost_only_kernel(l_ref, r_ref, out_ref, *, p: int, d0: int,
                      max_d: int, qh: int, prec: str, dtype):
    out_ref[...] = _cost_block(l_ref[...], r_ref[...], p=p, d0=d0,
                               max_d=max_d, qh=qh, prec=prec, dtype=dtype)


def cost_supported(cfg: Config, geom: Geometry) -> bool:
    """True when `cost_volume_rows` covers this configuration."""
    if cfg.descriptor != "patch" or cfg.center_descriptors:
        return False
    h0, w0 = geom.grid_h, geom.grid_w
    itemsize = jnp.dtype(cfg.dtype).itemsize
    # Minimum row block's volume block must stay double-bufferable.
    return (h0 % 8 == 0 and (w0 * cfg.patch_size) % 128 == 0
            and geom.disparities * 8 * w0 * itemsize <= 3 * 1024 * 1024)


# Probe knob (tools-only): force the large-D cost kernel's row block.
_COST_BH_OVERRIDE = None


@functools.partial(jax.jit, static_argnames=("p", "d0", "max_d", "prec",
                                             "dtype", "interpret"))
def _cost_volume_rows(left_p, right_p, p: int, d0: int, max_d: int,
                      prec: str, dtype: str, interpret: bool):
    hp, wp = left_p.shape
    h0, w0 = hp // p, wp // p
    qh = (max_d - 1) // p + 2
    itemsize = jnp.dtype(dtype).itemsize
    # Largest row block whose double-buffered volume block stays small
    # (the out block dominates VMEM here; no pyramid transients).
    bh = 8
    for m in range(8, 65, 8):
        if h0 % m == 0 and d0 * m * w0 * itemsize <= 5 * 1024 * 1024 // 2:
            bh = m
    if _COST_BH_OVERRIDE is not None:
        bh = _COST_BH_OVERRIDE
    kernel = functools.partial(_cost_only_kernel, p=p, d0=d0, max_d=max_d,
                               qh=qh, prec=prec, dtype=jnp.dtype(dtype))
    return pl.pallas_call(
        kernel,
        grid=(h0 // bh,),
        in_specs=[pl.BlockSpec((bh * p, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((d0, bh, w0), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d0, h0, w0), jnp.dtype(dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * hp * wp * 128 * 2 + 2 * max_d * h0 * w0 * (p * p + p),
            bytes_accessed=4 * 2 * hp * wp + itemsize * d0 * h0 * w0,
            transcendentals=0,
        ),
        interpret=interpret,
    )(left_p, right_p)


def cost_volume_rows(left_p: jnp.ndarray, right_p: jnp.ndarray,
                     cfg: Config, geom: Geometry) -> jnp.ndarray:
    """Padded f32 pixel pair -> (D, H0, W0) D-major cost volume.

    Callers must check `cost_supported(cfg, geom)` first.
    """
    return _cost_volume_rows(left_p, right_p, cfg.patch_size,
                             geom.disparities, cfg.max_disparity,
                             dot_precision(cfg), cfg.dtype,
                             use_interpret())
