"""On-device patch descriptors (C2+C3, SURVEY.md §2.1).

jnp implementations matching the NumPy oracle
(`oracle/reference.py:left_descriptors` / `right_sliding_descriptors`)
element-for-element in float32: raw-intensity 'patch' mode and the
dense-SIFT-like 'grad_hist' mode [DM §3.1].  These run inside the jitted
pipeline; on TPU the descriptor construction is pure VPU work that XLA
fuses with the correlation prologue.
"""

from __future__ import annotations

import functools

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config

_EPS = 1e-8


def _gradient_1d(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    """np.gradient semantics: central differences, one-sided at edges.

    Static slices, NOT jnp.take with index vectors: take lowers to a
    real gather on TPU, which dominated the grad_hist feature prep
    (measured r5: the magbin kernel's XLA prologue was ~3.8 of 6.1 ms
    at the bench geometry before this change).  Same elements,
    bitwise identical to np.gradient.  (A clamped-shift + iota-mask
    variant with no 1-wide arithmetic measured SLOWER on chip — 912 vs
    1157 Mpx/s full-step — so the three-piece form stands.)
    """
    n = img.shape[axis]
    sl = functools.partial(jax.lax.slice_in_dim, img, axis=axis)
    interior = (sl(2, n) - sl(0, n - 2)) * jnp.float32(0.5)
    first = sl(1, 2) - sl(0, 1)
    last = sl(n - 1, n) - sl(n - 2, n - 1)
    return jnp.concatenate([first, interior, last], axis=axis)


def magbin_from_gradients(gx: jnp.ndarray, gy: jnp.ndarray) -> tuple:
    """(gx, gy) -> (L1 magnitude, int32 octant index), elementwise.

    THE single definition of the comparison-based octant binning + L1
    magnitude (EXACT float ops only, matching
    oracle/reference.py:_grad_hist_pixels — sqrt/arctan2 compile to
    fusion-dependent FMA/veclib code whose ULP drift flips bins; see
    the oracle docstring).  Both the one-hot tensor form
    (`hist_from_gradients`) and the fused kernel's magbin plane form
    derive from this helper so the binning rule cannot desynchronize.
    """
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    mag = ax + ay
    idx_up = jnp.where(gx > 0, jnp.where(ay >= ax, 5, 4),
                       jnp.where(ay > ax, 6, 7))
    idx_dn = jnp.where(gx >= 0, jnp.where(ay > ax, 2, 3),
                       jnp.where(ay >= ax, 1, 0))
    idx = jnp.where(gy >= 0, idx_up, idx_dn).astype(jnp.int32)
    return mag, idx


def hist_from_gradients(gx: jnp.ndarray, gy: jnp.ndarray,
                        bins: int = 8) -> jnp.ndarray:
    """(gx, gy) -> magnitude-weighted orientation histogram (..., bins).

    The shared tail of `grad_hist_pixels` and the halo-corrected sharded
    feature builder (parallel/wtiled.py); one-hot encoding of
    `magbin_from_gradients`.
    """
    if bins != 8:
        raise ValueError("grad_hist is defined for 8 orientation bins")
    mag, idx = magbin_from_gradients(gx, gy)
    return jax.nn.one_hot(idx, bins, dtype=jnp.float32) * mag[..., None]


def grad_hist_pixels(img: jnp.ndarray, bins: int = 8) -> jnp.ndarray:
    """Per-pixel orientation histogram, (H, W) -> (H, W, bins).

    Matches oracle/reference.py:_grad_hist_pixels (magnitude-weighted
    hard assignment into `bins` orientation bins).
    """
    gy = _gradient_1d(img, 0)
    gx = _gradient_1d(img, 1)
    return hist_from_gradients(gx, gy, bins)


def grad_hist_magbin(img: jnp.ndarray) -> tuple:
    """Per-pixel (magnitude, bin) planes, (H, W) -> 2x (H, W) f32.

    The grad_hist features are one-hot x magnitude (exactly one of the
    8 bins is nonzero per pixel, `hist_from_gradients`), so the dense
    (H, W, 8) tensor factors losslessly into an L1-magnitude plane and
    an orientation-index plane: the descriptor dot becomes
    mag_L*mag_R*[bin_L == bin_R] — exactly the matching one-hot product
    plus exact zeros.  The bin index is returned as f32 (values 0..7,
    exact in f32 AND bf16, so the fused kernel's split-bf16 selection
    matmuls phase it exactly).  Consumed by the fused kernel's magbin
    mode (ops/fused_pallas.py)."""
    gy = _gradient_1d(img, 0)
    gx = _gradient_1d(img, 1)
    mag, idx = magbin_from_gradients(gx, gy)
    return mag.astype(jnp.float32), idx.astype(jnp.float32)


def pixel_features(img: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    if cfg.descriptor == "patch":
        return img[..., None]
    return grad_hist_pixels(img)


def _normalize(desc: jnp.ndarray) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True))
    return desc / jnp.maximum(norm, jnp.float32(_EPS))


def patch_descriptors(feat: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """(Hp', W', F) pixel features -> (H0, W0, C) patch descriptors.

    The feature->descriptor stage of `left_descriptors`, split out so the
    W-tiled sharded path (parallel/wtiled.py) can feed halo-corrected
    tile-local features through the identical code.
    """
    p = cfg.patch_size
    h, w, f = feat.shape
    h0, w0 = h // p, w // p
    blocks = feat[: h0 * p, : w0 * p].reshape(h0, p, w0, p, f)
    desc = blocks.transpose(0, 2, 1, 3, 4).reshape(h0, w0, p * p * f)
    if cfg.center_descriptors:
        desc = desc - desc.mean(axis=-1, keepdims=True)
    return _normalize(desc)


def sliding_descriptors(feat: jnp.ndarray, cfg: Config,
                        col0: int = 0,
                        width_global: Optional[int] = None) -> jnp.ndarray:
    """(Hp', W', F) features -> (H0, W', C) descriptors at every column.

    Entry [i, x] describes the patch with top-left pixel (p*i, col0+x) in
    GLOBAL coordinates; windows whose global start falls outside
    [0, width_global - p] are all-zero.  With col0=0 and width_global=W'
    this is exactly the unsharded rule (partial right-edge windows are
    zeroed; nothing starts left of 0).  A W-tile passes its halo-extended
    feature slab with col0 = tile_start - halo so out-of-image halo
    columns zero out — zero descriptors correlate to 0, which is the
    unsharded out-of-range cost rule (ops/costvol.py).

    `col0` may be a traced scalar (e.g. derived from lax.axis_index).
    """
    p = cfg.patch_size
    h, w, f = feat.shape
    if width_global is None:
        width_global = w
    h0 = h // p
    rows = feat[: h0 * p].reshape(h0, p, w, f)
    # windows[i, x0, dr, dc, f] = rows[i, dr, x0 + dc, f]
    shifted = [
        jnp.pad(rows[:, :, dc:, :], ((0, 0), (0, 0), (0, dc), (0, 0)))
        for dc in range(p)
    ]
    windows = jnp.stack(shifted, axis=3)          # (H0, p, W', p, F)
    windows = windows.transpose(0, 2, 1, 3, 4)    # (H0, W', p, p, F)
    desc = windows.reshape(h0, w, p * p * f)
    xg = jnp.asarray(col0, jnp.int32) + jnp.arange(w, dtype=jnp.int32)
    ok = (xg >= 0) & (xg <= width_global - p)
    desc = jnp.where(ok[None, :, None], desc, jnp.float32(0.0))
    if cfg.center_descriptors:
        desc = desc - desc.mean(axis=-1, keepdims=True)
    return _normalize(desc)


def left_descriptors(img: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """(Hp, Wp) -> (H0, W0, C): non-overlapping patches at stride p."""
    return patch_descriptors(pixel_features(img, cfg), cfg)


def right_sliding_descriptors(img: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """(Hp, Wp) -> (H0, Wp, C): patch descriptors at EVERY column offset.

    Entry [i, x0] describes the patch with top-left corner (p*i, x0);
    windows overrunning the right edge (x0 > Wp - p) are all-zero, as in
    the oracle.
    """
    return sliding_descriptors(pixel_features(img, cfg), cfg)
