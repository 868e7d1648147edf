"""One repo-wide device timing protocol (VERDICT r3 item 2).

Round 3 left the repo with 2x spreads between nominally identical
measurements (ROOFLINE.json timed the fused kernel at 2.33 ms where
FUSED_EXPERIMENTS.json said 1.085 ms at the same geometry) because every
tool rolled its own single-shot enqueue-slope timing.  This module is
now the ONLY timing routine: bench.py, tools/roofline.py,
tools/fused_experiments.py and tools/bench_large.py all call
`steady_state`, which

  * uses the enqueue-slope method (difference two enqueue depths so the
    axon relay's constant ~5-30 ms fetch round-trip cancels — on this
    backend `block_until_ready` does NOT wait for device completion, so
    completion is forced by fetching a scalar that data-depends on the
    last enqueued step);
  * repeats the slope measurement `repeats` times and reports the
    MEDIAN with min/max spread;
  * records every sample so artifacts can be audited.

Docs and artifacts must quote `median` and its spread; no artifact may
quote a single-shot number.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Sequence


def _probe_scalar(out):
    """Force device completion by fetching one dependent scalar."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


def steady_state(fn: Callable, args: Sequence, *,
                 depths: Sequence[int] = (8, 40),
                 repeats: int = 5) -> Dict[str, object]:
    """Median steady-state seconds per `fn(*args)` call on device.

    Returns {"median": s, "min": s, "max": s, "samples": [s, ...],
    "depths": [...], "repeats": n}.  `fn` must return jax arrays (any
    pytree); it is called once for warm-up (compile + relay warm) before
    sampling.
    """
    out = fn(*args)
    _probe_scalar(out)  # compile + first-fetch warm-up
    samples = []
    for _ in range(repeats):
        ts = []
        for n in depths:
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(n)]
            _probe_scalar(outs[-1])
            ts.append((n, time.perf_counter() - t0))
        (n1, t1), (n2, t2) = ts[0], ts[-1]
        samples.append((t2 - t1) / (n2 - n1))
    ordered = sorted(samples)
    median = ordered[len(ordered) // 2] if len(ordered) % 2 else (
        0.5 * (ordered[len(ordered) // 2 - 1] + ordered[len(ordered) // 2]))
    return {
        "median": median,
        "min": ordered[0],
        "max": ordered[-1],
        "samples": samples,
        "depths": list(depths),
        "repeats": repeats,
    }


def fmt(stats: Dict[str, object], unit_scale: float = 1e3,
        unit: str = "ms") -> str:
    """'median [min..max] unit' one-liner for logs."""
    return (f"{stats['median'] * unit_scale:.3f} "
            f"[{stats['min'] * unit_scale:.3f}.."
            f"{stats['max'] * unit_scale:.3f}] {unit}")
