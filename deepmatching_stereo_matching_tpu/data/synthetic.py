"""Synthetic rectified stereo pairs with exact integer ground truth.

The reference validates visually on Middlebury cones/teddy pairs
(BASELINE.json:7); those images are not available in this offline
environment, so tests and benchmarks use synthetic pairs with *known*
integer disparity (SURVEY.md §4.3): a random right-image texture is warped
into the left image by a piecewise-constant disparity field, which the
pipeline must recover exactly away from occlusions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def block_disparity_field(height: int, width: int, max_disparity: int,
                          rng: np.random.Generator, block: int = 32,
                          align: int = 4) -> np.ndarray:
    """Piecewise-constant random integer disparity field (H, W).

    Values are multiples of `align` (default: the patch size) so every
    atomic 4x4 patch sees a single, patch-aligned shift — making exact
    recovery possible and tie-free in expectation.
    """
    bh = (height + block - 1) // block
    bw = (width + block - 1) // block
    n_vals = max(1, (max_disparity - 1) // align)
    vals = rng.integers(0, n_vals + 1, size=(bh, bw)) * align
    vals = np.minimum(vals, max_disparity - 1)
    field = np.repeat(np.repeat(vals, block, axis=0), block, axis=1)
    return field[:height, :width].astype(np.int32)


def constant_disparity_field(height: int, width: int,
                             disparity: int) -> np.ndarray:
    return np.full((height, width), disparity, dtype=np.int32)


def make_pair(height: int, width: int, disparity_field: np.ndarray,
              seed: int = 0, smooth: int = 0
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build (left, right, gt_disparity) from a texture + disparity field.

    right is random texture; left[y, x] = right[y, x - d(y, x)].
    Pixels whose source column falls outside the right image keep random
    texture and are marked invalid (gt = -1).
    """
    rng = np.random.default_rng(seed)
    right = rng.uniform(0.0, 1.0, size=(height, width)).astype(np.float32)
    if smooth > 0:
        k = np.ones(smooth, dtype=np.float32) / smooth
        right = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1, right)
        right = np.apply_along_axis(
            lambda c: np.convolve(c, k, mode="same"), 0, right)
    xs = np.arange(width)[None, :]
    src = xs - disparity_field
    valid = (src >= 0) & (src < width)
    src_safe = np.clip(src, 0, width - 1)
    left = np.take_along_axis(right, src_safe, axis=1)
    fill = rng.uniform(0.0, 1.0, size=left.shape).astype(np.float32)
    left = np.where(valid, left, fill).astype(np.float32)
    gt = np.where(valid, disparity_field, -1).astype(np.int32)
    return left, right, gt


def make_block_pair(height: int = 128, width: int = 192,
                    max_disparity: int = 32, seed: int = 0,
                    block: int = 32, align: int = 4
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Convenience: random texture + block disparity field in one call."""
    rng = np.random.default_rng(seed + 1)
    field = block_disparity_field(height, width, max_disparity, rng,
                                  block=block, align=align)
    return make_pair(height, width, field, seed=seed)
