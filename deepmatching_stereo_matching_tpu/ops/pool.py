"""Pyramid level ops (C5-C7): disparity max-pool + subsample, quadtree
merge, power rectification — jnp reference implementations.

Tie-breaking is deterministic (smallest resulting disparity wins), which
makes every run bit-reproducible across shardings (SURVEY.md §5.2) and
identical to the NumPy oracle (`oracle/reference.py:pool3_subsample` /
`aggregate_children`).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pool3_subsample(maps: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3-wide max-pool along d + x2 subsample, with argmax offsets.

    Returns (sub, arg), both (H, W, D//2); arg[..., k] in {-1, 0, +1} is
    the offset of the pool winner around d = 2k (pad value -1.0 < every
    valid correlation, so winners always point in range; ties pick the
    smallest d).
    """
    h, w, d = maps.shape
    pad = jnp.full((h, w, 1), -1.0, dtype=maps.dtype)
    lo = jnp.concatenate([pad, maps[:, :, :-1]], axis=2)   # offset -1
    hi = jnp.concatenate([maps[:, :, 1:], pad], axis=2)    # offset +1
    stack = jnp.stack([lo, maps, hi], axis=-1)
    arg = jnp.argmax(stack, axis=-1).astype(jnp.int32) - 1  # first max
    pooled = jnp.max(stack, axis=-1)
    return pooled[:, :, ::2], arg[:, :, ::2]


def aggregate_children(sub: jnp.ndarray, lam: float) -> jnp.ndarray:
    """Quadtree 4-child average + x**lam rectification ([DM §3.2])."""
    h, w, k = sub.shape
    quad = sub.reshape(h // 2, 2, w // 2, 2, k)
    # Fixed summation order — identical to the oracle and across shardings.
    merged = ((quad[:, 0, :, 0] + quad[:, 0, :, 1])
              + (quad[:, 1, :, 0] + quad[:, 1, :, 1])) * jnp.float32(0.25)
    return jnp.power(merged, jnp.float32(lam))
