"""Fused pyramid+backtracking kernel vs the jnp path (SURVEY.md §4.2).

The kernel (ops/pyramid_pallas.py) must be BIT-identical to
models/pipeline.py:build_pyramid + backtrack in f32 — same pool pad,
tie orders, summation order, and first-max argmax — including on
adversarial tie-heavy inputs.  Runs in interpreter mode on the CPU
backend (conftest.py), compiled on TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deepmatching_stereo_matching_tpu.models import pipeline
from deepmatching_stereo_matching_tpu.ops import pyramid_pallas


def jnp_reference(cost_hwd, levels, lam):
    maps, args = pipeline.build_pyramid(cost_hwd, levels, lam)
    return pipeline.backtrack(maps, args)


def run_both(cost_hwd, levels, lam=1.4):
    cost_hwd = jnp.asarray(cost_hwd)
    want_d, want_s = jnp_reference(cost_hwd, levels, lam)
    cost_dm = jnp.transpose(cost_hwd, (2, 0, 1))
    got_d, got_s = pyramid_pallas.pyramid_backtrack(cost_dm, levels, lam)
    return ((np.asarray(want_d), np.asarray(want_s)),
            (np.asarray(got_d), np.asarray(got_s)))


@pytest.mark.parametrize("levels,h0,w0,d0", [
    (1, 2, 2, 2),
    (2, 4, 8, 8),
    (3, 8, 16, 16),
    (4, 16, 32, 64),
])
def test_bitwise_random(levels, h0, w0, d0):
    rng = np.random.default_rng(levels)
    cost = np.maximum(
        rng.standard_normal((h0, w0, d0)), 0.0).astype(np.float32)
    (wd, ws), (gd, gs) = run_both(cost, levels)
    np.testing.assert_array_equal(gd, wd)
    np.testing.assert_array_equal(gs, ws)


def test_bitwise_tie_heavy():
    """Quantised costs force max-pool/argmax ties at every level."""
    rng = np.random.default_rng(7)
    cost = rng.integers(0, 3, size=(8, 16, 16)).astype(np.float32) * 0.5
    (wd, ws), (gd, gs) = run_both(cost, levels=3)
    np.testing.assert_array_equal(gd, wd)
    np.testing.assert_array_equal(gs, ws)


def test_bitwise_all_zero():
    """All-zero volume: every tie rule fires; disparity must be 0."""
    cost = np.zeros((4, 8, 8), np.float32)
    (wd, ws), (gd, gs) = run_both(cost, levels=2)
    np.testing.assert_array_equal(gd, wd)
    assert not gd.any()
    np.testing.assert_array_equal(gs, ws)


def test_bitwise_constant_rows():
    """Constant scanlines (textureless stereo worst case)."""
    cost = np.broadcast_to(
        np.linspace(0, 1, 16, dtype=np.float32), (8, 16, 16)).copy()
    (wd, ws), (gd, gs) = run_both(cost, levels=3)
    np.testing.assert_array_equal(gd, wd)
    np.testing.assert_array_equal(gs, ws)


def test_wblock_splitting():
    """Width large enough to trigger the VMEM w-block split."""
    # Force splitting by monkeypatching the budget down.
    rng = np.random.default_rng(11)
    cost = np.maximum(
        rng.standard_normal((8, 64, 16)), 0.0).astype(np.float32)
    old = pyramid_pallas._BLOCK_BYTES
    pyramid_pallas._BLOCK_BYTES = 8 * 64 * 16 * 4 // 4
    try:
        (wd, ws), (gd, gs) = run_both(cost, levels=3)
    finally:
        pyramid_pallas._BLOCK_BYTES = old
    np.testing.assert_array_equal(gd, wd)
    np.testing.assert_array_equal(gs, ws)


def test_bf16_close():
    """bf16 volume: same selection on well-separated costs."""
    rng = np.random.default_rng(3)
    cost = np.maximum(
        rng.standard_normal((8, 16, 16)), 0.0).astype(np.float32)
    cost_bf = jnp.asarray(cost, jnp.bfloat16)
    maps, args = pipeline.build_pyramid(cost_bf, 3, 1.4)
    wd, ws = pipeline.backtrack(maps, args)
    gd, gs = pyramid_pallas.pyramid_backtrack(
        jnp.transpose(cost_bf, (2, 0, 1)), 3, 1.4)
    np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws),
                               rtol=1e-2, atol=1e-2)


def test_misaligned_rejected():
    cost = jnp.zeros((8, 6, 10), jnp.float32)  # h0=6 not divisible by 4
    with pytest.raises(ValueError, match="not aligned"):
        pyramid_pallas.pyramid_backtrack(jnp.transpose(cost, (2, 0, 1)), 2,
                                         1.4)


def test_dmajor_costvol_matches_transposed():
    """cost_volume_dmajor == transpose(cost_volume) elementwise."""
    from deepmatching_stereo_matching_tpu.ops import costvol_pallas

    rng = np.random.default_rng(5)
    h0, w0, p, c, d0 = 4, 8, 4, 8, 8
    src = jnp.asarray(rng.standard_normal((h0, w0, c)).astype(np.float32))
    tgt = jnp.asarray(
        rng.standard_normal((h0, w0 * p, c)).astype(np.float32))
    a = np.asarray(costvol_pallas.cost_volume(src, tgt, d0, p, d0))
    b = np.asarray(costvol_pallas.cost_volume_dmajor(src, tgt, d0, p, d0))
    np.testing.assert_array_equal(b, a.transpose(2, 0, 1))


def test_plane_select_fori_matches_unrolled():
    """The fori_loop select path (plane count > _UNROLL_MAX, the
    large-D regime) computes exactly the unrolled one-hot select."""
    import jax.numpy as jnp
    from deepmatching_stereo_matching_tpu.ops import pyramid_pallas as pp

    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.standard_normal((130, 8, 16)).astype("f4"))
    k = jnp.asarray(rng.integers(0, 130, (8, 16)).astype("i4"))
    init = jnp.zeros((8, 16), jnp.float32)
    got = pp._plane_select(planes, k, init)       # fori path (130 > 64)
    want = np.zeros((8, 16), np.float32)
    kp = np.asarray(k)
    for dd in range(130):
        want = np.where(kp == dd, np.asarray(planes)[dd], want)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pyramid_large_d_fori_path_bitwise():
    """D=128 (> _UNROLL_MAX) drives the kernel's fori selects; still
    bitwise-equal to the jnp pyramid+backtrack."""
    import jax.numpy as jnp
    from deepmatching_stereo_matching_tpu.models import pipeline
    from deepmatching_stereo_matching_tpu.ops import pyramid_pallas as pp

    rng = np.random.default_rng(1)
    d, h0, w0, levels = 128, 16, 16, 2
    vol = jnp.asarray(np.maximum(
        rng.standard_normal((h0, w0, d)).astype("f4"), 0.0))
    maps, args = pipeline.build_pyramid(vol, levels, 1.4)
    wk, ws = pipeline.backtrack(maps, args)
    gk, gs = pp.pyramid_backtrack(jnp.moveaxis(vol, -1, 0), levels, 1.4)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(ws))


def test_aggregate_slabs_fast_matches_exact_decisions():
    """fast=True (deferred-pow slab chain, the fused large-D route)
    picks the SAME winners as the exact chain: pow commutes bitwise
    with the max-pool, so args, backtracked disparities, and scores
    all match (pow-collision ties are the only theoretical divergence;
    none occur on this data).  Measured flip-free on chip at KITTI
    D=128 (jnp.power form; Mosaic's exp2 approximation flipped 2.5%
    and is NOT used here)."""
    import jax.numpy as jnp
    from deepmatching_stereo_matching_tpu.models import pipeline

    rng = np.random.default_rng(5)
    d, h0, w0, levels = 64, 16, 32, 2
    vol = jnp.asarray(np.maximum(
        rng.standard_normal((d, h0, w0)).astype("f4"), 0.0))
    ke, se = pipeline.match_dmajor_xla(vol, levels, 1.4, fast=False)
    kf, sf = pipeline.match_dmajor_xla(vol, levels, 1.4, fast=True)
    np.testing.assert_array_equal(np.asarray(ke), np.asarray(kf))
    np.testing.assert_array_equal(np.asarray(se), np.asarray(sf))


def test_aggregate_slabs_bf16_args_roundtrip():
    """bf16 HBM storage of the recorded pool offsets ({-1, 0, 1},
    exact in bfloat16) backtracks identically to int32 storage."""
    import jax.numpy as jnp
    from deepmatching_stereo_matching_tpu.models import pipeline
    from deepmatching_stereo_matching_tpu.ops import pyramid_pallas as pp

    rng = np.random.default_rng(6)
    d, h0, w0, levels = 64, 16, 32, 2
    vol = jnp.asarray(np.maximum(
        rng.standard_normal((d, h0, w0)).astype("f4"), 0.0))
    outs = {}
    prev = pp._ARGS_DTYPE
    try:
        for dt in ("bfloat16", "int32"):
            pp._ARGS_DTYPE = dt
            pp._aggregate_slabs.clear_cache()
            outs[dt] = pipeline.match_dmajor_xla(vol, levels, 1.4)
    finally:
        pp._ARGS_DTYPE = prev
        pp._aggregate_slabs.clear_cache()
    np.testing.assert_array_equal(np.asarray(outs["bfloat16"][0]),
                                  np.asarray(outs["int32"][0]))
    np.testing.assert_array_equal(np.asarray(outs["bfloat16"][1]),
                                  np.asarray(outs["int32"][1]))
