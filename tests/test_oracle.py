"""Golden-model (NumPy oracle) self-consistency tests (SURVEY.md §4.1).

The oracle defines the pipeline semantics; these tests pin down that it
actually recovers known disparity on synthetic rectified pairs, that its
deterministic tie-breaking holds, and that its building blocks satisfy
the DeepMatching recurrence invariants [DM §3.2-3.3].
"""

import numpy as np
import pytest

from deepmatching_stereo_matching_tpu.config import Config
from deepmatching_stereo_matching_tpu.data.synthetic import (
    constant_disparity_field,
    make_block_pair,
    make_pair,
)
from deepmatching_stereo_matching_tpu.oracle import reference as oracle
from deepmatching_stereo_matching_tpu.utils.metrics import (
    bad_pixel_rate,
    coverage,
)


def test_geometry_padding():
    cfg = Config(max_disparity=60, levels=3)
    geom = cfg.geometry(100, 150)
    assert geom.disparities % 8 == 0 and geom.disparities >= 60
    assert geom.padded_height % (4 * 8) == 0
    assert geom.padded_width % (4 * 8) == 0
    assert geom.level_shape(3)[2] == geom.disparities // 8


def test_pool3_subsample_semantics():
    rng = np.random.default_rng(0)
    m = rng.uniform(0, 1, size=(2, 3, 8)).astype(np.float32)
    sub, arg = oracle.pool3_subsample(m)
    assert sub.shape == (2, 3, 4) and arg.shape == (2, 3, 4)
    for i in range(2):
        for j in range(3):
            for k in range(4):
                d = 2 * k
                window = m[i, j, max(0, d - 1): d + 2]
                assert sub[i, j, k] == window.max()
                chosen = d + arg[i, j, k]
                assert m[i, j, chosen] == window.max()


def test_pool3_tie_breaks_to_smallest_d():
    m = np.zeros((1, 1, 8), dtype=np.float32)
    m[0, 0, :] = [0.5, 0.5, 0.5, 0.1, 0.2, 0.2, 0.0, 0.0]
    sub, arg = oracle.pool3_subsample(m)
    # d=0: window {0,1} both 0.5 -> offset 0 (smallest d in range)
    assert arg[0, 0, 0] == 0
    # d=2: window {1,2,3} = .5,.5,.1 -> ties at d=1,2 -> smallest d=1 -> off -1
    assert arg[0, 0, 1] == -1
    # d=4: window {3,4,5} = .1,.2,.2 -> ties at 4,5 -> d=4 -> off 0
    assert arg[0, 0, 2] == 0


def test_aggregate_children_mean_and_power():
    sub = np.arange(2 * 2 * 4, dtype=np.float32).reshape(2, 2, 4) / 16.0
    out = oracle.aggregate_children(sub, lam=1.4)
    assert out.shape == (1, 1, 4)
    expect = np.power(sub.mean(axis=(0, 1)), 1.4)
    np.testing.assert_allclose(out[0, 0], expect, rtol=1e-6)


def test_constant_disparity_exact_recovery():
    """A patch-aligned constant shift must be recovered exactly."""
    h, w, d_true = 96, 160, 12
    field = constant_disparity_field(h, w, d_true)
    left, right, gt = make_pair(h, w, field, seed=1)
    cfg = Config(max_disparity=32, levels=3)
    res = oracle.match_stereo(left, right, cfg)
    # Away from the occluded left band (one top-level cell = 32 px), the
    # shift must be recovered exactly.  The band itself is coarse-to-fine
    # collateral that the LR check is responsible for invalidating.
    interior = res.disparity_raw[:, 32:]
    assert (interior == d_true).mean() > 0.999
    assert bad_pixel_rate(res.disparity, gt) < 0.06
    # LR may invalidate the rightmost patch column (right-edge effect).
    assert res.valid[:, 32:-4].mean() > 0.999


def test_block_disparity_recovery():
    left, right, gt = make_block_pair(128, 192, max_disparity=32, seed=3)
    cfg = Config(max_disparity=32, levels=3)
    res = oracle.match_stereo(left, right, cfg)
    # Unfiltered map: block edges / occlusions dominate the error.
    raw_rate = bad_pixel_rate(res.disparity_raw.astype(np.float32), gt)
    assert raw_rate < 0.10, raw_rate
    # Pixels the LR filter KEEPS must be almost all correct.
    kept_rate = bad_pixel_rate(res.disparity, gt, count_invalid=False)
    assert kept_rate < 0.02, kept_rate
    assert coverage(res.disparity) > 0.5


def test_lr_check_invalidates_occlusions():
    left, right, gt = make_block_pair(128, 192, max_disparity=32, seed=5)
    cfg_lr = Config(max_disparity=32, levels=3, lr_check=True)
    cfg_no = Config(max_disparity=32, levels=3, lr_check=False)
    res_lr = oracle.match_stereo(left, right, cfg_lr)
    res_no = oracle.match_stereo(left, right, cfg_no)
    assert coverage(res_lr.disparity) < coverage(res_no.disparity) + 1e-9
    # LR filtering must improve accuracy on the surviving pixels.
    assert bad_pixel_rate(res_lr.disparity, gt, count_invalid=False) <= \
        bad_pixel_rate(res_no.disparity, gt, count_invalid=False) + 1e-9


def test_grad_hist_descriptor_mode_runs():
    left, right, gt = make_block_pair(64, 96, max_disparity=16, seed=7)
    cfg = Config(max_disparity=16, levels=2, descriptor="grad_hist")
    res = oracle.match_stereo(left, right, cfg)
    assert res.disparity.shape == (64, 96)
    assert bad_pixel_rate(res.disparity, gt) < 0.5


def test_determinism():
    left, right, _ = make_block_pair(64, 96, max_disparity=16, seed=9)
    cfg = Config(max_disparity=16, levels=2)
    a = oracle.match_stereo(left, right, cfg)
    b = oracle.match_stereo(left, right, cfg)
    np.testing.assert_array_equal(a.disparity_raw, b.disparity_raw)
    np.testing.assert_array_equal(a.valid, b.valid)
