"""Fused Pallas pyramid + backtracking kernel (C5-C10) — hot loops #2/#3.

The reference runs the aggregation pyramid as per-level NumPy passes and
backtracking as Python recursion (SURVEY.md §3.3/§3.4); the jnp port of
that structure is correct but HBM-hostile on TPU: with the disparity
axis minor, every 3-wide disparity pool and x2 subsample is a strided
*lane* slice (vector-register shuffles), and each level round-trips the
full map through HBM.  Measured, the pyramid was ~75% of the whole
pipeline's device time.

This kernel processes one quadtree-aligned spatial block per grid step
with the cost volume in **D-major** layout (D, h, w) and a
*duplicated-cell* representation of the coarse levels:

  * disparity pool + x2 subsample: a leading-axis (D/2, 2, h, w)
    reshape — free, the minor (h, w) register tile is untouched;
  * spatial x2 subsample is never materialised: a level-l cell's value
    is stored duplicated across its 2**l x 2**l pixel block, so the
    quadtree 4-child merge is two concat-shifts + a parity-mask select
    along each minor axis (exact two-term sums in the oracle's
    ((q00+q01)+(q10+q11)) order, no lane deinterleave, no gather);
  * top-down backtracking (dense argmax propagation, SURVEY.md §3.4)
    then needs NO upsampling — every level's pool-argmax offsets are
    already full-resolution — and runs in the same kernel instance on
    the VMEM-resident pyramid.  Maps/args never touch HBM.

The duplicated representation does ~1.5x the elementwise work of a
shrinking pyramid but keeps every operation a supported, relayout-free
Mosaic vector op; the kernel is HBM-bound on the cost-volume read.

Numerics are bit-identical to ops/pool.py + models/pipeline.py:backtrack
(same -1.0 pool pad, same lo/even/odd tie order, same
((q00+q01)+(q10+q11))*0.25 summation order, first-max argmax, f32 score
cast) — asserted in tests/test_pyramid_pallas.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._dispatch import use_interpret

# VMEM budget for the cost-volume block; pooled maps, recorded argmax
# offsets, and transients add ~2x on top.
_BLOCK_BYTES = 2 * 1024 * 1024

# Experiment knob (tools/ablate_fused.py): implementation of the
# power rectification x -> x**lam in FAST mode.  "pow" is jnp.power;
# "exp2" computes exp2(lam*log2(x)) (exact-math-equal on x >= 0 with
# 0 -> 0, rounds differently); "square" replaces it with x*x (WRONG
# results — timing ablation that bounds the transcendental share).
_POW_IMPL = "exp2"
# HBM dtype of the SLAB path's recorded pool offsets (aggregate_slabs
# only — the VMEM-resident kernel's args never touch HBM).  The values
# are exactly {-1, 0, 1}, exact in bfloat16, which halves the largest
# large-D HBM term (args are ~sum_l D/2^(l+1) planes, written by the
# slab kernels and re-read by the XLA backtracking selects); int32 is
# the bit-anchored form the jnp path uses.  tools/profile_large.py A/Bs
# the two on chip.
_ARGS_DTYPE = "bfloat16"
# D-slab width of the sequential aggregation chain (must divide D and
# be a multiple of 2**levels).  Wider slabs halve the halo round-trips
# and per-call overheads at 2x the VMEM block.
_SLAB = 32


def _rectify(m, lam, dt, fast):
    if fast and _POW_IMPL == "square":
        return m * m
    if fast and _POW_IMPL == "exp2":
        # m >= 0 always (relu-clamped correlations summed); log2(0) =
        # -inf -> exp2(-inf) = 0, so the zero cost planes stay exact.
        # Always in f32: Mosaic cannot legalize bf16 math.log/exp.
        x = m.astype(jnp.float32)
        return jnp.exp2(jnp.float32(lam) * jnp.log2(x)).astype(dt)
    return jnp.power(m, jnp.asarray(lam, dt))


def _shift_up(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """y[i] = x[i + s] along axis (wrap values are never selected)."""
    lo = jax.lax.slice_in_dim(x, s, x.shape[axis], 1, axis)
    hi = jax.lax.slice_in_dim(x, 0, s, 1, axis)
    return jax.lax.concatenate([lo, hi], axis)


def _shift_down(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """y[i] = x[i - s] along axis (wrap values are never selected)."""
    lo = jax.lax.slice_in_dim(x, x.shape[axis] - s, x.shape[axis], 1, axis)
    hi = jax.lax.slice_in_dim(x, 0, x.shape[axis] - s, 1, axis)
    return jax.lax.concatenate([lo, hi], axis)


def _pair_sum(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """Duplicated-cell sibling sum along one spatial axis.

    x holds level values duplicated over size-s cells along `axis`; the
    result holds (left_child + right_child) duplicated over the size-2s
    parent cell, summed in left+right order everywhere (exact: two-term
    f32 addition is commutative and the shifts are value-exact).

    The left/right parity mask is constant over the leading (disparity)
    axis, so for 3-D inputs it is built at the 2-D minor shape and
    broadcast — the full-extent iota/div/mod chain cost D times more
    VPU passes for identical values (bitwise-equal results).
    """
    if x.ndim == 3 and axis in (1, 2):
        minor = x.shape[1:]
        left = jnp.equal(
            jax.lax.div(
                jax.lax.broadcasted_iota(jnp.int32, minor, axis - 1),
                jnp.int32(s)) % 2,
            0)[None]
    else:
        left = jnp.equal(
            jax.lax.div(
                jax.lax.broadcasted_iota(jnp.int32, x.shape, axis),
                jnp.int32(s)) % 2,
            0)
    sib_r = _shift_up(x, s, axis)      # right sibling, valid on left cells
    sib_l = _shift_down(x, s, axis)    # left sibling, valid on right cells
    return jnp.where(left, x + sib_r, sib_l + x)


def pyramid_body(cost0: jnp.ndarray, levels: int, lam: float,
                 fast: bool = False, cost_ref=None, args_refs=None):
    """Bottom-up aggregation + dense backtracking on a VMEM-resident
    (D, bh, wb) cost block; shared by this kernel and the fully fused
    image->disparity kernel (ops/fused_pallas.py).  Returns
    (disp int32 (bh, wb), score float32 (bh, wb)).

    fast=False is bit-identical to the oracle (this kernel's contract).
    fast=True defers each level's power rectification past the NEXT
    level's disparity pool: max commutes exactly with the monotone
    x**lam (also in f32), so pooling the pre-pow values and rectifying
    the POOLED maps computes the same pyramid with 2x fewer rectified
    planes — and the top level needs no rectification at all (argmax of
    a monotone function).  Rectified values use the exp2-based _POW_IMPL
    which rounds differently from jnp.power, so fast mode is reserved
    for the tolerance-gated fused kernel (bench.py parity gate).

    cost_ref/args_refs: for LARGE plane counts (> _UNROLL_MAX) the
    backtracking one-hot selects must run as fori_loops with dynamic
    leading-axis REF loads (Mosaic cannot dynamic-slice values); the
    caller then passes the cost block's input ref and per-level VMEM
    scratch refs for the recorded pool offsets.  Values and order are
    identical to the unrolled in-value path."""
    dt = cost0.dtype

    def c32(x):
        """Comparison operand in f32 (exact widening from bf16).

        Mosaic (v5e, jax 0.9) cannot relayout the i1 mask vectors that
        bf16 comparisons produce inside this kernel ("Invalid relayout:
        Non-singleton logical dimension is replicated in destination
        but not in source for 'vector<...xi1>'"); comparing the exact
        f32 widenings sidesteps the bug without changing any result.
        """
        return x.astype(jnp.float32) if dt != jnp.float32 else x

    d0, bh, wb = cost0.shape

    # Bottom-up aggregation (C5-C7), all levels VMEM-resident, spatial
    # values duplicated over 2**lvl cells.
    args = []
    cur = cost0
    for lvl in range(levels):
        d_l = cur.shape[0]
        half = cur.reshape(d_l // 2, 2, bh, wb)
        even = half[:, 0]                               # d = 2k
        odd = half[:, 1]                                # d = 2k+1
        neg = jnp.full_like(odd[:1], -1.0)
        if d_l == 2:   # single pool window; avoid a zero-size slice
            lo = neg
        else:
            lo = jnp.concatenate([neg, odd[:-1]], axis=0)   # d = 2k-1
        pooled = jnp.maximum(jnp.maximum(lo, even), odd)
        # Same tie order as ops/pool.py: lo, then even, then odd.  In
        # fast mode `cur` holds pre-rectification values for lvl >= 1;
        # max/compare select the same winners (monotone map).
        arg = jnp.where(c32(pooled) == c32(lo), jnp.int32(-1),
                        jnp.where(c32(pooled) == c32(even), jnp.int32(0),
                                  jnp.int32(1)))
        if args_refs is not None:
            args_refs[lvl][...] = arg
        else:
            args.append(arg)
        if fast and lvl > 0:
            # Deferred rectification of the PREVIOUS level's merge,
            # applied post-pool (half the planes).
            pooled = _rectify(pooled, lam, dt, True)
        # Quadtree merge in ((q00+q01)+(q10+q11))*0.25 order: w-pairs
        # first, then h-pairs, on duplicated cells of size 2**lvl.
        s = 2 ** lvl
        b = _pair_sum(pooled, s, axis=2)
        m = _pair_sum(b, s, axis=1)
        scaled = m * jnp.asarray(0.25, dt)
        # In fast mode the rectification is deferred to the next
        # level's pool (or skipped entirely at the top: argmax of a
        # monotone function needs no rectification).
        cur = scaled if fast else _rectify(scaled, lam, dt, False)

    # Top-level argmax, first-max (smallest d) tie rule; cur is the top
    # map, duplicated over 2**levels cells, so k is born full-res.
    best = cur[0]
    k = jnp.zeros(best.shape, jnp.int32)
    for d in range(1, cur.shape[0]):
        better = c32(cur[d]) > c32(best)
        best = jnp.where(better, cur[d], best)
        k = jnp.where(better, jnp.int32(d), k)

    # Top-down propagation (C10): k_child = 2*k + recorded pool offset.
    for lvl in range(levels - 1, -1, -1):
        arg = args_refs[lvl] if args_refs is not None else args[lvl]
        off = _plane_select(arg, k, jnp.zeros_like(k))
        k = 2 * k + off

    sc = _plane_select(cost_ref if cost_ref is not None else cost0, k,
                       jnp.zeros(k.shape, jnp.float32))
    return k, sc


# Above this plane count the one-hot selects compile as fori_loops with
# dynamic leading-axis indexing instead of a full unroll — the unrolled
# form at D=256 (0.5k iterations) crashes the remote compile helper;
# both forms compute identical values in the identical order.
_UNROLL_MAX = 64


def _plane_select(planes, k: jnp.ndarray, init: jnp.ndarray
                  ) -> jnp.ndarray:
    """out = planes[k] per cell (cast to init's dtype), via one-hot
    overwrite in plane order.

    `planes` may be a VALUE (unrolled; any n <= _UNROLL_MAX) or a REF
    (fori_loop with dynamic leading-axis loads — the only form Mosaic
    supports for dynamic indexing, used for large n)."""
    n = planes.shape[0]
    dt = init.dtype
    if n <= _UNROLL_MAX and isinstance(planes, jnp.ndarray):
        out = init
        for dd in range(n):
            out = jnp.where(k == dd, planes[dd].astype(dt), out)
        return out

    def body(dd, out):
        return jnp.where(k == dd, planes[dd].astype(dt), out)

    return jax.lax.fori_loop(0, n, body, init)


def _kernel(cost_ref, disp_ref, score_ref, *scratch, levels: int,
            lam: float):
    k, sc = pyramid_body(cost_ref[...], levels, lam,
                         cost_ref=cost_ref if scratch else None,
                         args_refs=list(scratch) if scratch else None)
    disp_ref[...] = k
    score_ref[...] = sc


def _pick_blocks(h0: int, w0: int, d: int, unit: int, itemsize: int):
    """(bh, wb) — quadtree-aligned blocks obeying Mosaic (8, 128) tiling.

    A split block's dims must be multiples of (8, 128) respectively
    (full-array dims are exempt); both must stay multiples of the
    quadtree unit 2**levels so the pyramid merge never crosses blocks.
    """
    unit_h = unit * 8 // math.gcd(unit, 8)      # lcm(2**levels, 8)
    bh = unit_h if (h0 % unit_h == 0 and unit_h < h0) else h0
    unit_w = unit * 128 // math.gcd(unit, 128)  # lcm(2**levels, 128)
    wb = w0
    while wb > unit_w:
        half = wb // 2
        if (d * bh * wb * itemsize <= _BLOCK_BYTES
                or w0 % half or half % unit_w):
            break
        wb = half
    return bh, wb


def fits(d: int, h0: int, w0: int, levels: int, itemsize: int = 4) -> bool:
    """True when one kernel instance's cost block fits scoped VMEM.

    The kernel needs the FULL disparity axis resident (the pool +
    backtrack walk all of D), so when W cannot split to a 128-lane-
    aligned block (e.g. KITTI w0=320 with unit_w=128) the block is
    d*bh*w0 and large D overflows the ~16 MB scoped-vmem stack
    (measured: D=128, bh=16, w0=320 f32 demands 23 MB).  Callers fall
    back to the XLA pyramid (models/pipeline.py) when this is False.
    """
    unit = 2 ** levels
    if h0 % unit or w0 % unit or d % unit:
        return False
    bh, wb = _pick_blocks(h0, w0, d, unit, itemsize)
    # Callers vmap this kernel over pairs x directions, and Mosaic's
    # scoped-vmem accounting charges the co-resident vmapped instances
    # together (measured: D=128, bh=16, w0=320 f32 — a 2.6 MB block —
    # demanded 23 MB under an 8-wide vmap against the 16 MB cap).
    # 1.5 MB keeps a typical batchx2-direction vmap inside the cap.
    return d * bh * wb * itemsize <= 1536 * 1024


def fits_solo(d: int, h0: int, w0: int, levels: int,
              itemsize: int = 4) -> bool:
    """Like `fits`, but for a SEQUENTIALLY executed instance (callers
    replace their direction/batch vmap with lax.map — the large-D path,
    models/pipeline.py `large=True`).

    Empirical envelope (probed on chip, 2026-08): one instance's 5.2 MB
    block compiles at grid (1, 1) but the SAME block crashes the remote
    compile helper when the grid has multiple steps (Mosaic
    double-buffers the input block across steps), and D = 256 crashes
    at ANY block size; volumes outside this envelope take the D-major
    XLA pyramid instead (models/pipeline.py:match_dmajor_xla)."""
    unit = 2 ** levels
    if h0 % unit or w0 % unit or d % unit or d > 128:
        return False
    bh, wb = _pick_blocks(h0, w0, d, unit, itemsize)
    nbytes = d * bh * wb * itemsize
    grid = (h0 // bh) * (w0 // wb)
    return nbytes <= 6 * 1024 * 1024 and (grid == 1
                                          or nbytes <= 2 * 1024 * 1024)


# ---------------------------------------------------------------------------
# D-slab aggregation kernel (the LARGE-D pyramid, SURVEY.md §7 M3 /
# hard part 4): volumes whose full disparity axis cannot sit in one
# kernel instance's VMEM are aggregated as a SEQUENCE of D-slab kernel
# calls — the on-chip analogue of parallel/ringd.py's decomposition.
# Each slab call pools its local planes (the 3-wide window needs ONE
# halo plane per level from the previous slab, threaded through HBM),
# merges spatially with the duplicated-cell scheme, and emits its
# recorded pool offsets + top planes; the cheap global argmax +
# backtracking then run on the concatenated results in XLA
# (models/pipeline.py:match_dmajor_xla).  Bit-identical to the
# unsharded pyramid: the halo-augmented pool is pool_ops.pool3_subsample
# (lo_pad=...) semantics, proven bitwise by parallel/ringd.py's tests.
# ---------------------------------------------------------------------------


def _slab_kernel(vol_ref, *rest, levels: int, lam: float,
                 fast: bool = False):
    halos = rest[:levels]
    args_out = rest[levels:2 * levels]
    bounds_out = rest[2 * levels:3 * levels]
    top_ref = rest[3 * levels]
    cur = vol_ref[...]
    dt = cur.dtype
    _, bh, wb = cur.shape

    def c32(x):
        # bf16 comparisons make i1 vectors Mosaic cannot relayout
        # (see pyramid_body.c32); exact f32 widening sidesteps it.
        return x.astype(jnp.float32) if dt != jnp.float32 else x
    for lvl in range(levels):
        d_l = cur.shape[0]
        half = cur.reshape(d_l // 2, 2, bh, wb)
        even = half[:, 0]
        odd = half[:, 1]
        # Next slab's lo halo at this level = our last odd plane
        # (pre-pow in fast mode — the next slab pools the same domain).
        # (Positive static index: negative indexing lowers to the
        # unsupported dynamic_slice primitive in Mosaic.)
        bounds_out[lvl][...] = odd[d_l // 2 - 1]
        lo_first = halos[lvl][...][None].astype(dt)
        if d_l == 2:
            lo = lo_first
        else:
            lo = jnp.concatenate([lo_first, odd[:-1]], axis=0)
        pooled = jnp.maximum(jnp.maximum(lo, even), odd)
        if _ARGS_DTYPE == "bfloat16":
            # {-1, 0, 1} offsets, exact in bf16 — halves the args HBM
            # traffic (computed in f32, cast on store; int8/int16
            # selects crash Mosaic, probed on chip, so bf16 is the
            # narrow option).
            arg = jnp.where(
                c32(pooled) == c32(lo), jnp.float32(-1),
                jnp.where(c32(pooled) == c32(even), jnp.float32(0),
                          jnp.float32(1))).astype(jnp.bfloat16)
        else:
            arg = jnp.where(
                c32(pooled) == c32(lo), jnp.int32(-1),
                jnp.where(c32(pooled) == c32(even), jnp.int32(0),
                          jnp.int32(1)))
        args_out[lvl][...] = arg
        if fast and lvl > 0:
            # Deferred rectification (pyramid_body's fast idea applied
            # across the slab chain, AFTER the arg compare): winners
            # are picked on pre-pow values — identical to the exact
            # path since x**lam is strictly monotone — and the
            # previous level's rectification lands here on the POOLED
            # planes, halving the rectified planes.  jnp.power, NOT
            # the exp2 chain: pow commutes bitwise with the max-pool
            # (the pooled element IS the rectified element), so this
            # is flip-free in practice (measured 0 at KITTI D=128),
            # whereas Mosaic's exp2/log2 approximation flipped 2.5%
            # of decisions at the same geometry.  Only the tolerance-
            # gated fused large-D route sets fast (pow-collision ties
            # are the only theoretical divergence).
            pooled = jnp.power(pooled, jnp.asarray(lam, dt))
        s = 2 ** lvl
        b = _pair_sum(pooled, s, axis=2)
        m = _pair_sum(b, s, axis=1)
        scaled = m * jnp.asarray(0.25, dt)
        cur = scaled if fast else _rectify(scaled, lam, dt, False)
    top_ref[...] = cur


def slab_supported(d: int, h0: int, w0: int, levels: int,
                   slab=None) -> bool:
    """True when `aggregate_slabs` covers this geometry."""
    slab = _SLAB if slab is None else slab
    unit = 2 ** levels
    return (d > slab and d % slab == 0 and slab % unit == 0
            and h0 % unit == 0 and w0 % unit == 0)


@functools.partial(jax.jit, static_argnames=("levels", "lam", "slab",
                                             "interpret", "fast"))
def _aggregate_slabs(cost_dm, levels: int, lam: float, slab: int,
                     interpret: bool, fast: bool = False):
    d, h0, w0 = cost_dm.shape
    unit = 2 ** levels
    bh, wb = _pick_blocks(h0, w0, slab, unit, cost_dm.dtype.itemsize)
    plane = jax.ShapeDtypeStruct((h0, w0), cost_dm.dtype)
    args_dt = (jnp.bfloat16 if _ARGS_DTYPE == "bfloat16"
               else jnp.int32)
    out_shapes = tuple(
        [jax.ShapeDtypeStruct((slab >> (l + 1), h0, w0), args_dt)
         for l in range(levels)]
        + [plane] * levels
        + [jax.ShapeDtypeStruct((slab >> levels, h0, w0),
                                cost_dm.dtype)])
    pspec = pl.BlockSpec((bh, wb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    out_specs = tuple(
        [pl.BlockSpec((slab >> (l + 1), bh, wb), lambda i, j: (0, i, j),
                      memory_space=pltpu.VMEM) for l in range(levels)]
        + [pspec] * levels
        + [pl.BlockSpec((slab >> levels, bh, wb),
                        lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)])
    call = pl.pallas_call(
        functools.partial(_slab_kernel, levels=levels, lam=lam,
                          fast=fast),
        grid=(h0 // bh, w0 // wb),
        in_specs=[pl.BlockSpec((slab, bh, wb), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM)]
        + [pspec] * levels,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=12 * slab * h0 * w0,
            bytes_accessed=cost_dm.dtype.itemsize * slab * h0 * w0 * 2,
            transcendentals=2 * slab * h0 * w0,
        ),
        interpret=interpret,
    )
    halos = [jnp.full((h0, w0), -1.0, cost_dm.dtype)
             for _ in range(levels)]
    args = [[] for _ in range(levels)]
    tops = []
    for k in range(d // slab):
        outs = call(cost_dm[k * slab:(k + 1) * slab], *halos)
        for l in range(levels):
            args[l].append(outs[l])
        halos = list(outs[levels:2 * levels])
        tops.append(outs[2 * levels])
    return ([jnp.concatenate(tops, axis=0)]
            + [jnp.concatenate(a, axis=0) for a in args])


def aggregate_slabs(cost_dm: jnp.ndarray, levels: int, lam: float,
                    slab=None, fast: bool = False):
    """(D, H0, W0) D-major volume -> (top_map, [args per level]).

    Sequential D-slab kernel calls with per-level halo planes; callers
    must check `slab_supported` first.  Returns the top-level map
    (D/2**levels, H0, W0) and the recorded pool offsets per level
    ((D/2**(l+1), H0, W0)) — identical values to build_pyramid's when
    fast=False.  fast=True defers each level's rectification past the
    next level's pool using jnp.power (NOT the exp2 chain — see the
    in-kernel comment: Mosaic's exp2 approximation flipped 2.5% of
    decisions at KITTI D=128, while pow commutes bitwise with the
    pool); the top map comes back pre-pow, same argmax winners.
    Reserved for the tolerance-gated fused large-D route.
    """
    out = _aggregate_slabs(cost_dm, levels, lam,
                           _SLAB if slab is None else slab,
                           use_interpret(), fast)
    return out[0], out[1:]


@functools.partial(jax.jit, static_argnames=("levels", "lam", "interpret"))
def _pyramid_backtrack(cost_dm: jnp.ndarray, levels: int, lam: float,
                       interpret: bool):
    d, h0, w0 = cost_dm.shape
    unit = 2 ** levels
    if h0 % unit or w0 % unit or d % unit:
        raise ValueError(
            f"cost volume {cost_dm.shape} not aligned to 2**levels={unit}")
    bh, wb = _pick_blocks(h0, w0, d, unit, cost_dm.dtype.itemsize)
    kernel = functools.partial(_kernel, levels=levels, lam=lam)
    out_spec = pl.BlockSpec((bh, wb), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    # Large D: the backtrack selects run as fori_loops over per-level
    # VMEM scratch refs (see pyramid_body); small D stays fully
    # unrolled over in-register values.
    scratch = ([pltpu.VMEM((d >> (l + 1), bh, wb), jnp.int32)
                for l in range(levels)] if d > _UNROLL_MAX else [])
    return pl.pallas_call(
        kernel,
        grid=(h0 // bh, w0 // wb),
        in_specs=[pl.BlockSpec((d, bh, wb), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=scratch,
        out_shape=(jax.ShapeDtypeStruct((h0, w0), jnp.int32),
                   jax.ShapeDtypeStruct((h0, w0), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            # ~6 elementwise passes over the volume per level at
            # duplicated resolution, geometric in D only.
            flops=12 * d * h0 * w0,
            bytes_accessed=cost_dm.dtype.itemsize * d * h0 * w0 + 8 * h0 * w0,
            transcendentals=2 * d * h0 * w0,
        ),
        interpret=interpret,
    )(cost_dm)


def pyramid_backtrack(cost_dm: jnp.ndarray, levels: int, lam: float):
    """D-major cost volume (D, H0, W0) -> (disp_patch i32, score f32).

    Fused drop-in for models/pipeline.py:build_pyramid + backtrack (which
    take the (H0, W0, D) layout); bit-identical results.
    """
    return _pyramid_backtrack(cost_dm, levels, lam, use_interpret())
