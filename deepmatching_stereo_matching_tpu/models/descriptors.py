"""On-device patch descriptors (C2+C3, SURVEY.md §2.1).

jnp implementations matching the NumPy oracle
(`oracle/reference.py:left_descriptors` / `right_sliding_descriptors`)
element-for-element in float32: raw-intensity 'patch' mode and the
dense-SIFT-like 'grad_hist' mode [DM §3.1].  These run inside the jitted
pipeline; on TPU the descriptor construction is pure VPU work that XLA
fuses with the correlation prologue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config

_EPS = 1e-8


def _gradient_1d(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    """np.gradient semantics: central differences, one-sided at edges."""
    upper = jnp.take(img, jnp.arange(2, img.shape[axis]), axis=axis)
    lower = jnp.take(img, jnp.arange(0, img.shape[axis] - 2), axis=axis)
    interior = (upper - lower) * jnp.float32(0.5)
    first = jnp.take(img, jnp.arange(1, 2), axis=axis) - jnp.take(
        img, jnp.arange(0, 1), axis=axis)
    n = img.shape[axis]
    last = jnp.take(img, jnp.arange(n - 1, n), axis=axis) - jnp.take(
        img, jnp.arange(n - 2, n - 1), axis=axis)
    return jnp.concatenate([first, interior, last], axis=axis)


def grad_hist_pixels(img: jnp.ndarray, bins: int = 8) -> jnp.ndarray:
    """Per-pixel orientation histogram, (H, W) -> (H, W, bins).

    Matches oracle/reference.py:_grad_hist_pixels (magnitude-weighted
    hard assignment into `bins` orientation bins).
    """
    gy = _gradient_1d(img, 0)
    gx = _gradient_1d(img, 1)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    idx = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * bins).astype(jnp.int32)
    idx = jnp.clip(idx, 0, bins - 1)
    return jax.nn.one_hot(idx, bins, dtype=jnp.float32) * mag[..., None]


def pixel_features(img: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    if cfg.descriptor == "patch":
        return img[..., None]
    return grad_hist_pixels(img)


def _normalize(desc: jnp.ndarray) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True))
    return desc / jnp.maximum(norm, jnp.float32(_EPS))


def left_descriptors(img: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """(Hp, Wp) -> (H0, W0, C): non-overlapping patches at stride p."""
    p = cfg.patch_size
    feat = pixel_features(img, cfg)
    h, w, f = feat.shape
    h0, w0 = h // p, w // p
    blocks = feat[: h0 * p, : w0 * p].reshape(h0, p, w0, p, f)
    desc = blocks.transpose(0, 2, 1, 3, 4).reshape(h0, w0, p * p * f)
    if cfg.center_descriptors:
        desc = desc - desc.mean(axis=-1, keepdims=True)
    return _normalize(desc)


def right_sliding_descriptors(img: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """(Hp, Wp) -> (H0, Wp, C): patch descriptors at EVERY column offset.

    Entry [i, x0] describes the patch with top-left corner (p*i, x0);
    windows overrunning the right edge (x0 > Wp - p) are all-zero, as in
    the oracle.
    """
    p = cfg.patch_size
    feat = pixel_features(img, cfg)
    h, w, f = feat.shape
    h0 = h // p
    rows = feat[: h0 * p].reshape(h0, p, w, f)
    # windows[i, x0, dr, dc, f] = rows[i, dr, x0 + dc, f]
    shifted = [
        jnp.pad(rows[:, :, dc:, :], ((0, 0), (0, 0), (0, dc), (0, 0)))
        for dc in range(p)
    ]
    windows = jnp.stack(shifted, axis=3)          # (H0, p, Wp, p, F)
    windows = windows.transpose(0, 2, 1, 3, 4)    # (H0, Wp, p, p, F)
    desc = windows.reshape(h0, w, p * p * f)
    # Zero the partial windows at the right edge to match the oracle.
    x0 = jnp.arange(w)[None, :, None]
    desc = jnp.where(x0 <= w - p, desc, jnp.float32(0.0))
    if cfg.center_descriptors:
        desc = desc - desc.mean(axis=-1, keepdims=True)
    return _normalize(desc)
