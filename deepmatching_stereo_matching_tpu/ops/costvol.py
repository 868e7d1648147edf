"""Level-0 correlation cost volume (C4) — jnp reference implementation.

The reference computes this with Python loops over patches and
disparities (BASELINE.json:5 "per-patch correlation kernel, NumPy/loop
code"; SURVEY.md §3.2).  Here it is a single fused XLA computation: a
`lax.scan` over the disparity axis, each step gathering the shifted
right-descriptor columns and contracting the descriptor dimension at
HIGHEST precision (exact f32 on the MXU).

The Pallas MXU kernel (`ops/costvol_pallas.py`) replaces this on the hot
path; this version is the semantics anchor and the fallback for odd
shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def cost_volume(desc_l: jnp.ndarray, desc_r: jnp.ndarray, disparities: int,
                patch_size: int, max_disparity: int) -> jnp.ndarray:
    """C0[i, j, d] = max(0, <descL[i, j], descR[i, p*j - d]>).

    Out-of-range targets (p*j - d < 0) and padded bins (d >= max_disparity)
    score 0.  Matches oracle/reference.py:cost_volume exactly in f32.

    Args:
      desc_l: (H0, W0, C) L2-normalised left patch descriptors.
      desc_r: (H0, Wp, C) right sliding descriptors, Wp = p * W0.
      disparities: D0, the padded disparity count (static).
      patch_size: p (static).
      max_disparity: effective search bound (static).

    Returns: (H0, W0, D0) float32.
    """
    w0 = desc_l.shape[1]
    xs = jnp.arange(w0, dtype=jnp.int32) * patch_size

    def one_d(d: jnp.ndarray) -> jnp.ndarray:
        x0 = xs - d
        valid = (x0 >= 0) & (d < max_disparity)
        tgt = jnp.take(desc_r, jnp.clip(x0, 0, None), axis=1)  # (H0, W0, C)
        corr = jnp.einsum("ijc,ijc->ij", desc_l, tgt, precision=_HI)
        return jnp.where(valid[None, :], jnp.maximum(corr, 0.0),
                         jnp.float32(0.0))

    _, planes = jax.lax.scan(
        lambda _, d: (None, one_d(d)), None,
        jnp.arange(disparities, dtype=jnp.int32))
    return jnp.moveaxis(planes, 0, -1)  # (H0, W0, D0)
