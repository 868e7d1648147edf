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
    """Current cost-path implementation: 'pallas' (default) or 'jnp'."""
    return getattr(_state, "impl", "pallas")


@contextlib.contextmanager
def set_implementation(impl: str):
    if impl not in ("pallas", "jnp"):
        raise ValueError(f"unknown implementation {impl!r}")
    prev = implementation()
    _state.impl = impl
    try:
        yield
    finally:
        _state.impl = prev
