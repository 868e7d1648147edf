"""Pallas cost-volume kernel vs the jnp reference (SURVEY.md §4.2).

Adversarial coverage of the kernel's static phase/shift decomposition
(ops/costvol_pallas.py): forward and reverse directions, halo-extended
targets (origin_offset), disparity padding (max_disparity < D0), edge
columns where targets run out of range, and degenerate ranges.  Runs in
interpreter mode on the CPU backend (conftest.py), compiled on TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deepmatching_stereo_matching_tpu.ops import costvol, costvol_pallas


def rand_desc(rng, h0, w, c):
    d = rng.standard_normal((h0, w, c)).astype(np.float32)
    return d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-8)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("d0,max_d", [(16, 16), (16, 13), (8, 1)])
def test_matches_jnp_reference(reverse, d0, max_d):
    rng = np.random.default_rng(0)
    h0, w0, p, c = 5, 12, 4, 16
    src = jnp.asarray(rand_desc(rng, h0, w0, c))
    tgt = jnp.asarray(rand_desc(rng, h0, w0 * p, c))
    want = costvol.cost_volume(src, tgt, d0, p, max_d, reverse=reverse)
    got = costvol_pallas.cost_volume(src, tgt, d0, p, max_d,
                                     reverse=reverse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
    # Padding bins are exactly zero.
    assert not np.asarray(got)[:, :, max_d:].any()


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("origin_offset", [1, 3])
def test_halo_extended_targets(reverse, origin_offset):
    """Target array extended left by origin_offset patch columns."""
    rng = np.random.default_rng(1)
    h0, w0, p, c, d0 = 3, 8, 4, 8, 8
    src = jnp.asarray(rand_desc(rng, h0, w0, c))
    wt = p * (w0 + origin_offset) + p  # halo left + one extra col right
    tgt = jnp.asarray(rand_desc(rng, h0, wt, c))
    want = costvol.cost_volume(src, tgt, d0, p, d0, reverse=reverse,
                               origin_offset=origin_offset)
    got = costvol_pallas.cost_volume(src, tgt, d0, p, d0, reverse=reverse,
                                     origin_offset=origin_offset)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_halo_equals_unsharded_slice():
    """A W-tile with a left halo reproduces the global volume's columns.

    The halo-extension contract of SURVEY.md §5.7: tile-local
    correlation over halo-extended targets == the corresponding slice
    of the unsharded volume.
    """
    rng = np.random.default_rng(2)
    h0, w0, p, c, d0 = 3, 16, 4, 8, 8
    src = jnp.asarray(rand_desc(rng, h0, w0, c))
    tgt = jnp.asarray(rand_desc(rng, h0, w0 * p, c))
    full = np.asarray(costvol_pallas.cost_volume(src, tgt, d0, p, d0))

    tile = slice(8, 16)            # right half of the patch columns
    halo_cols = d0 // p + (1 if d0 % p else 0)  # patch cols of halo
    src_t = src[:, tile]
    tgt_lo = p * (tile.start - halo_cols)
    tgt_t = tgt[:, tgt_lo: p * tile.stop]
    got = np.asarray(costvol_pallas.cost_volume(
        src_t, tgt_t, d0, p, d0, origin_offset=halo_cols))
    np.testing.assert_array_equal(got, full[:, tile])


def test_zero_descriptors_score_zero():
    h0, w0, p, c, d0 = 2, 6, 4, 8, 4
    src = jnp.zeros((h0, w0, c), jnp.float32)
    tgt = jnp.zeros((h0, w0 * p, c), jnp.float32)
    got = np.asarray(costvol_pallas.cost_volume(src, tgt, d0, p, d0))
    assert not got.any()


def test_out_of_range_targets_masked():
    """Column j with d > p*j must be zero (target left of the image)."""
    rng = np.random.default_rng(3)
    h0, w0, p, c, d0 = 2, 4, 4, 8, 16
    src = jnp.asarray(rand_desc(rng, h0, w0, c))
    tgt = jnp.asarray(np.abs(rand_desc(rng, h0, w0 * p, c)))
    got = np.asarray(costvol_pallas.cost_volume(src, tgt, d0, p, d0))
    for j in range(w0):
        assert not got[:, j, p * j + 1:].any()


def test_indivisible_target_width_rejected():
    src = jnp.zeros((2, 4, 8), jnp.float32)
    tgt = jnp.zeros((2, 15, 8), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        costvol_pallas.cost_volume(src, tgt, 4, 4, 4)


def test_cost_volume_slab_matches_jnp_d_offset():
    """Pallas slab volume (traced d_offset, target pre-shift) == the
    jnp d_offset path, for forward and reverse matching."""
    import jax
    from deepmatching_stereo_matching_tpu.ops import costvol as costvol_ops

    rng = np.random.default_rng(7)
    h0, w0, c, p, max_d, dl = 8, 24, 16, 4, 24, 8
    src = jnp.asarray(rng.standard_normal((h0, w0, c)).astype("f4"))
    tgt = jnp.asarray(rng.standard_normal((h0, w0 * p, c)).astype("f4"))
    for reverse in (False, True):
        for d_off in (0, 8, 16):
            want = np.asarray(costvol_ops.cost_volume(
                src, tgt, dl, p, max_d, reverse=reverse, d_offset=d_off))
            got = np.asarray(costvol_pallas.cost_volume_slab(
                src, tgt, dl, p, max_d, reverse=reverse,
                d_offset=jnp.int32(d_off)))
            np.testing.assert_allclose(
                got, want, atol=2e-6,
                err_msg=f"reverse={reverse} d_off={d_off}")
