"""Kernel dispatch helpers.

Pallas TPU kernels run compiled on TPU and in interpreter mode on CPU
(SURVEY.md §4.2: kernel unit tests run on the CPU backend), selected
automatically from the default JAX backend.  `set_implementation` lets
callers force the jnp reference path (e.g. to A/B a kernel against XLA's
own fusion on real hardware).
"""

from __future__ import annotations

import contextlib
import threading

import jax

_state = threading.local()


def use_interpret() -> bool:
    """True when Pallas kernels must run in interpreter mode (non-TPU)."""
    return jax.default_backend() != "tpu"


def implementation() -> str:
    """Current implementation: 'fused' (default), 'pallas', or 'jnp'.

    'fused' runs the single image->disparity kernel where supported
    (ops/fused_pallas.py) and falls back to the exact two-kernel
    'pallas' path otherwise.
    """
    return getattr(_state, "impl", "fused")


@contextlib.contextmanager
def set_implementation(impl: str):
    if impl not in ("fused", "pallas", "jnp"):
        raise ValueError(f"unknown implementation {impl!r}")
    prev = implementation()
    _state.impl = impl
    try:
        yield
    finally:
        _state.impl = prev
