"""Fully fused image->disparity kernel vs the oracle (SURVEY.md §4.2).

ops/fused_pallas.py computes descriptors, cost volume, pyramid, and
backtracking in ONE kernel with a different (algebraically equal)
normalisation order than the oracle, so scores are compared at ~1e-5
tolerance; disparity decisions must match exactly on non-degenerate
random data.  Runs in interpreter mode on CPU (conftest.py), compiled
on TPU where the selection matmuls additionally exercise the
full-precision MXU path (fused_pallas._dot).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deepmatching_stereo_matching_tpu import Config
from deepmatching_stereo_matching_tpu.data import synthetic
from deepmatching_stereo_matching_tpu.models import pipeline
from deepmatching_stereo_matching_tpu.ops import fused_pallas
from deepmatching_stereo_matching_tpu.oracle import reference as oracle


def rand_pair(rng, hp, wp):
    l = (rng.standard_normal((hp, wp)).astype(np.float32) * 0.3 + 0.5)
    r = (rng.standard_normal((hp, wp)).astype(np.float32) * 0.3 + 0.5)
    return l, r


def oracle_match(left, right, cfg, max_d, levels):
    dl = oracle.left_descriptors(left, cfg)
    dr = oracle.right_sliding_descriptors(right, cfg)
    cost = oracle.cost_volume(dl, dr, cfg_d0(max_d, levels), cfg.patch_size,
                              max_d)
    maps, args = oracle.build_pyramid(cost, levels, cfg.lam)
    return oracle.backtrack(maps, args)


def cfg_d0(max_d, levels):
    unit = 2 ** levels
    return ((max_d + unit - 1) // unit) * unit


@pytest.mark.parametrize("h0,w0,max_d,levels", [
    (8, 16, 16, 2),       # single block
    (16, 16, 16, 2),      # two row blocks
    (16, 24, 13, 2),      # padding bins d >= max_disparity
    (32, 48, 32, 3),      # deeper pyramid, bh=lcm(8, 8)
])
def test_matches_oracle(h0, w0, max_d, levels):
    rng = np.random.default_rng(h0 + w0 + max_d)
    p = 4
    cfg = Config(max_disparity=max_d, levels=levels)
    left, right = rand_pair(rng, h0 * p, w0 * p)
    wd, ws = oracle_match(left, right, cfg, max_d, levels)
    d0 = cfg_d0(max_d, levels)
    gd, gs = fused_pallas._match_rows(
        jnp.asarray(left), jnp.asarray(right), p, d0, max_d, levels,
        cfg.lam, fused_pallas.dot_precision(cfg), "float32",
        fused_pallas.use_interpret())
    np.testing.assert_array_equal(np.asarray(gd), wd)
    np.testing.assert_allclose(np.asarray(gs), ws, atol=2e-5)


def test_left_edge_out_of_range_zero():
    """Patches with p*j < d must score exactly 0 (oracle zero rule)."""
    rng = np.random.default_rng(7)
    p, h0, w0, max_d, levels = 4, 8, 8, 16, 2
    left, right = rand_pair(rng, h0 * p, w0 * p)
    gd, gs = fused_pallas._match_rows(
        jnp.asarray(left), jnp.asarray(right), p, max_d, max_d, levels,
        1.4, "split2", "float32", fused_pallas.use_interpret())
    wd, ws = oracle_match(left, right, Config(max_disparity=max_d,
                                              levels=levels),
                          max_d, levels)
    np.testing.assert_array_equal(np.asarray(gd), wd)


def test_supported_gating():
    cfg = Config(max_disparity=64)
    geom = cfg.geometry(375, 450)
    assert fused_pallas.supported(cfg, geom)
    # grad_hist is covered since r4 (feature-interleaved rows, F=8).
    assert fused_pallas.supported(
        Config(max_disparity=64, descriptor="grad_hist"), geom)
    assert not fused_pallas.supported(
        Config(max_disparity=64, center_descriptors=True), geom)
    # KITTI-scale deep pyramid overflows the fused VMEM budget -> the
    # pipeline must fall back to the two-kernel path, not crash.
    big = Config(max_disparity=192)
    bgeom = big.geometry(375, 1242)
    assert fused_pallas.supported(big, bgeom) in (True, False)  # no raise


def test_full_pipeline_fused_equals_exact():
    """match_padded impl='fused' == impl='jnp' disparity decisions."""
    h, w, max_d = 96, 128, 16
    cfg = Config(max_disparity=max_d)
    geom = cfg.geometry(h, w)
    rng = np.random.default_rng(3)
    field = synthetic.block_disparity_field(h, w, max_d, rng, block=16)
    left, right, _ = synthetic.make_pair(h, w, field, seed=3)
    lp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(left), geom))
    rp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(right), geom))
    got = pipeline.match_padded(lp, rp, cfg, h, w, "fused")
    want = pipeline.match_padded(lp, rp, cfg, h, w, "jnp")
    np.testing.assert_array_equal(np.asarray(got["disparity_raw"]),
                                  np.asarray(want["disparity_raw"]))
    np.testing.assert_array_equal(np.asarray(got["valid"]),
                                  np.asarray(want["valid"]))
    np.testing.assert_allclose(np.asarray(got["score"]),
                               np.asarray(want["score"]), atol=2e-5)


def test_fused_bf16_quality():
    """bf16 storage keeps the bad-pixel bound on a synthetic scene."""
    from deepmatching_stereo_matching_tpu.utils import metrics

    h, w, max_d = 96, 128, 16
    cfg = Config(max_disparity=max_d, dtype="bfloat16")
    geom = cfg.geometry(h, w)
    rng = np.random.default_rng(5)
    field = synthetic.block_disparity_field(h, w, max_d, rng, block=16)
    left, right, gt = synthetic.make_pair(h, w, field, seed=5)
    lp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(left), geom))
    rp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(right), geom))
    out = pipeline.match_padded(lp, rp, cfg, h, w, "fused")
    rate = metrics.bad_pixel_rate(np.asarray(out["disparity"]), gt,
                                  count_invalid=False)
    assert rate < 0.10, rate


def test_cost_volume_rows_matches_descriptor_path():
    """Fused image->cost-volume kernel (the large-D prologue) scores
    ~equal to the exact descriptor-path volume; disparity decisions
    through the same pyramid match on non-degenerate data."""
    from deepmatching_stereo_matching_tpu.models import (
        descriptors as desc_mod, pipeline)
    from deepmatching_stereo_matching_tpu.ops import costvol_pallas

    rng = np.random.default_rng(4)
    h, w, max_d = 96, 128, 24
    cfg = Config(max_disparity=max_d, levels=2)
    geom = cfg.geometry(h, w)
    assert fused_pallas.cost_supported(cfg, geom)
    field = synthetic.block_disparity_field(h, w, max_d, rng, block=16)
    left, right, _ = synthetic.make_pair(h, w, field, seed=4)
    lp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(left), geom))
    rp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(right), geom))
    got = np.asarray(fused_pallas.cost_volume_rows(lp, rp, cfg, geom))
    ds = desc_mod.left_descriptors(lp, cfg)
    dt = desc_mod.right_sliding_descriptors(rp, cfg)
    want = np.asarray(costvol_pallas.cost_volume_dmajor(
        ds, dt, geom.disparities, cfg.patch_size, cfg.max_disparity))
    np.testing.assert_allclose(got, want, atol=2e-5)
    gk, _ = pipeline.match_dmajor_xla(jnp.asarray(got), geom.levels,
                                      cfg.lam)
    wk, _ = pipeline.match_dmajor_xla(jnp.asarray(want), geom.levels,
                                      cfg.lam)
    assert np.mean(np.asarray(gk) != np.asarray(wk)) < 0.005


def test_fused_grad_hist_matches_exact():
    """F=8 grad_hist through the feature-interleaved fused kernel ==
    the exact two-kernel path on disparity decisions (scores at the
    fused normalisation tolerance)."""
    h, w, max_d = 96, 128, 16
    cfg = Config(max_disparity=max_d, descriptor="grad_hist")
    geom = cfg.geometry(h, w)
    assert fused_pallas.supported(cfg, geom)
    rng = np.random.default_rng(9)
    field = synthetic.block_disparity_field(h, w, max_d, rng, block=16)
    left, right, _ = synthetic.make_pair(h, w, field, seed=9)
    lp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(left), geom))
    rp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(right), geom))
    got = pipeline.match_padded(lp, rp, cfg, h, w, "fused")
    want = pipeline.match_padded(lp, rp, cfg, h, w, "jnp")
    np.testing.assert_array_equal(np.asarray(got["disparity_raw"]),
                                  np.asarray(want["disparity_raw"]))
    np.testing.assert_array_equal(np.asarray(got["valid"]),
                                  np.asarray(want["valid"]))
    np.testing.assert_allclose(np.asarray(got["score"]),
                               np.asarray(want["score"]), atol=2e-5)


def test_fused_grad_hist_magbin_equals_interleave():
    """The magbin grad_hist kernel (mag_L*mag_R*[bin_L == bin_R] on
    (magnitude, bin) planes) matches the F=8 feature-interleaved form:
    identical disparity decisions, scores within the documented f32
    summation-tree tolerance (~1e-5) — the products are identical, only
    the addition order differs (ops/fused_pallas.py:_cost_block)."""
    h, w, max_d = 96, 128, 16
    cfg = Config(max_disparity=max_d, descriptor="grad_hist")
    geom = cfg.geometry(h, w)
    assert fused_pallas._GRADHIST_MODE == "magbin"
    assert fused_pallas.supported(cfg, geom)
    rng = np.random.default_rng(12)
    field = synthetic.block_disparity_field(h, w, max_d, rng, block=16)
    left, right, _ = synthetic.make_pair(h, w, field, seed=12)
    lp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(left), geom))
    rp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(right), geom))
    d_mb, s_mb = fused_pallas.match_rows(lp, rp, cfg, geom)
    try:
        fused_pallas._GRADHIST_MODE = "interleave"
        d_il, s_il = fused_pallas.match_rows(lp, rp, cfg, geom)
    finally:
        fused_pallas._GRADHIST_MODE = "magbin"
    np.testing.assert_array_equal(np.asarray(d_mb), np.asarray(d_il))
    np.testing.assert_allclose(np.asarray(s_mb), np.asarray(s_il),
                               rtol=1e-4, atol=1e-5)
