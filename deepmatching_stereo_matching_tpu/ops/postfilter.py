"""Disparity post-filtering (C13, SURVEY.md §2.1): median + occlusion fill.

The reference's presence of a post-filter is unverified ([K-low], mount
empty — SURVEY.md §0/§2 row C13); it is included "for parity safety" and
off by default (Config.median_filter=0, fill_invalid=False).

Semantics (shared bit-for-bit with the NumPy oracle,
oracle/reference.py:postfilter):

  * median: k*k window with edge-clamped borders; invalid (non-finite)
    pixels are excluded; the LOWER median of the n valid values (sorted
    index (n-1)//2) is taken, so integer disparities stay integral and
    ties are deterministic.  A pixel with an all-invalid window — or an
    invalid centre when fill_invalid is off — stays invalid.
  * fill: each remaining invalid pixel takes min(nearest valid left,
    nearest valid right) on its scanline — the classic occlusion
    background-fill (occluded surface is the farther/background one).

Runs on the final (H, W) map AFTER cropping, outside the shard_map
cores: a k*k window crosses H-tile boundaries, and at O(H*W) cost XLA's
automatic partitioning of this tail is cheaper than threading halo
machinery through the tiles.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _window_stack(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(H, W) -> (H, W, k*k) edge-clamped k*k neighbourhoods."""
    h, w = x.shape
    r = k // 2
    rows = jnp.clip(jnp.arange(h)[:, None] + jnp.arange(-r, r + 1)[None, :],
                    0, h - 1)                       # (H, k)
    cols = jnp.clip(jnp.arange(w)[:, None] + jnp.arange(-r, r + 1)[None, :],
                    0, w - 1)                       # (W, k)
    g = x[rows]                                     # (H, k, W)
    g = g[:, :, cols]                               # (H, k, W, k)
    return jnp.transpose(g, (0, 2, 1, 3)).reshape(h, w, k * k)


def median_valid(disp: jnp.ndarray, k: int, keep_invalid_center: bool
                 ) -> jnp.ndarray:
    """Lower-median of valid values per k*k window (see module docstring)."""
    win = _window_stack(disp, k)
    finite = jnp.isfinite(win)
    n = jnp.sum(finite, axis=-1)
    vals = jnp.sort(jnp.where(finite, win, jnp.inf), axis=-1)
    idx = jnp.maximum(n - 1, 0) // 2
    med = jnp.take_along_axis(vals, idx[..., None], axis=-1)[..., 0]
    out = jnp.where(n > 0, med, disp)
    if keep_invalid_center:
        out = jnp.where(jnp.isfinite(disp), out, disp)
    return out


def fill_background(disp: jnp.ndarray) -> jnp.ndarray:
    """Fill invalid pixels with min(nearest valid left, right) per row."""
    h, w = disp.shape
    valid = jnp.isfinite(disp)
    iota = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (h, w))
    left_idx = lax.cummax(jnp.where(valid, iota, -1), axis=1)
    right_idx = w - 1 - lax.cummax(
        jnp.where(valid, w - 1 - iota, -1), axis=1, reverse=True)
    safe = jnp.nan_to_num(disp, nan=jnp.inf, posinf=jnp.inf)
    left_val = jnp.where(left_idx >= 0,
                         jnp.take_along_axis(safe, jnp.maximum(left_idx, 0),
                                             axis=1), jnp.inf)
    right_val = jnp.where(right_idx <= w - 1,
                          jnp.take_along_axis(safe,
                                              jnp.minimum(right_idx, w - 1),
                                              axis=1), jnp.inf)
    fill = jnp.minimum(left_val, right_val)
    filled = jnp.where(valid, disp, fill)
    return jnp.where(jnp.isfinite(filled), filled, disp)


def postfilter(disp: jnp.ndarray, median: int, fill: bool) -> jnp.ndarray:
    """Apply the configured post-filter chain to one (H, W) float map."""
    out = disp
    if median:
        out = median_valid(out, median, keep_invalid_center=not fill)
    if fill:
        out = fill_background(out)
    return out
