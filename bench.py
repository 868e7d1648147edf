#!/usr/bin/env python
"""Round benchmark: full-pipeline Mpx/s per chip vs the CPU oracle.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "Mpx/s", "vs_baseline": ...}

Config: Middlebury-class geometry (450x375, D=64; BASELINE.md config 2)
on synthetic pairs (no Middlebury data in this offline environment),
full pipeline including both LR-consistency directions.  The baseline
denominator is the NumPy oracle's Mpx/s on this machine's CPU —
the stand-in for the pure-NumPy reference (SURVEY.md §4.1/§6) — measured
once and cached in ORACLE_BASELINE.json.

All diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

H, W, MAX_D = 375, 450, 64
BATCH = 32
ITERS = 10
ORACLE_FILE = os.path.join(REPO, "ORACLE_BASELINE.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_config():
    from deepmatching_stereo_matching_tpu import Config

    return Config(max_disparity=MAX_D)


def make_pairs(n):
    from deepmatching_stereo_matching_tpu.data import synthetic

    pairs = []
    for i in range(n):
        rng = np.random.default_rng(100 + i)
        field = synthetic.block_disparity_field(H, W, MAX_D, rng, block=32)
        left, right, gt = synthetic.make_pair(H, W, field, seed=100 + i)
        pairs.append((left, right, gt))
    return pairs


def oracle_mpxs(pairs):
    """CPU-reference Mpx/s (cached across rounds; same geometry)."""
    key = {"height": H, "width": W, "max_disparity": MAX_D,
           "lr_check": True, "descriptor": "patch"}
    if os.path.exists(ORACLE_FILE):
        with open(ORACLE_FILE) as f:
            data = json.load(f)
        if data.get("config") == key:
            log(f"oracle baseline (cached): {data['mpx_per_s']:.4f} Mpx/s")
            return data["mpx_per_s"]

    from deepmatching_stereo_matching_tpu.oracle import reference as oracle

    cfg = bench_config()
    left, right, _ = pairs[0]
    t0 = time.perf_counter()
    oracle.match_stereo(left, right, cfg)
    dt = time.perf_counter() - t0
    v = H * W * 1e-6 / dt
    with open(ORACLE_FILE, "w") as f:
        json.dump({"config": key, "mpx_per_s": v, "seconds_per_pair": dt,
                   "note": "NumPy oracle (stand-in for the pure-NumPy "
                           "reference, SURVEY.md §4.1) on this host's CPU"},
                  f, indent=1)
    log(f"oracle baseline (measured): {v:.4f} Mpx/s ({dt:.2f} s/pair)")
    return v


def tpu_mpxs(pairs):
    import jax
    import jax.numpy as jnp

    from deepmatching_stereo_matching_tpu.models import pipeline
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle

    cfg = bench_config()
    geom = cfg.geometry(H, W)
    log(f"backend: {jax.default_backend()}, geom: {geom}")

    lp = np.stack([oracle.pad_image(oracle.to_grayscale_f32(l), geom)
                   for l, _, _ in pairs])
    rp = np.stack([oracle.pad_image(oracle.to_grayscale_f32(r), geom)
                   for _, r, _ in pairs])

    impl = "fused" if jax.default_backend() == "tpu" else "jnp"

    @functools.partial(jax.jit, static_argnames=())
    def step(ls, rs):
        return jax.vmap(
            lambda a, b: pipeline.match_padded_core(a, b, cfg, geom, impl)
        )(ls, rs)

    # Warm-up: first device->host transfer takes 10-250 s on this machine
    # (axon relay claim); do it on a scalar before timing anything.
    np.asarray(jnp.zeros(()))
    ls = jax.device_put(jnp.asarray(lp))
    rs = jax.device_put(jnp.asarray(rp))
    t0 = time.perf_counter()
    out = step(ls, rs)
    np.asarray(out["disparity"][0, 0, 0])
    log(f"compile+first run: {time.perf_counter() - t0:.1f} s")

    # Steady-state streaming throughput.  On the axon relay backend,
    # jax.block_until_ready does NOT wait for device completion, so
    # timing must force completion by FETCHING a scalar that depends on
    # the last of N enqueued steps (the TPU runs enqueued programs in
    # order).  The constant relay round-trip (~30 ms) is removed by
    # differencing two N values (slope method).
    @jax.jit
    def probe(o):
        return o["disparity"][0, 0, 0]

    float(probe(step(ls, rs)))
    times = []
    for n in (ITERS // 2, ITERS * 2):
        t0 = time.perf_counter()
        outs = [step(ls, rs) for _ in range(n)]
        float(probe(outs[-1]))
        times.append((n, time.perf_counter() - t0))
    (n1, t1), (n2, t2) = times
    t = (t2 - t1) / (n2 - n1)
    lat = t1 / n1
    v = BATCH * H * W * 1e-6 / t
    log(f"device step: {t * 1e3:.2f} ms steady-state / {lat * 1e3:.2f} ms "
        f"incl. relay round-trip, for {BATCH} pairs")

    # Quality cross-check on the bench scene (kept-pixel bad rate).
    from deepmatching_stereo_matching_tpu.utils import metrics

    disp = np.asarray(out["disparity"])[:, :H, :W]
    rates = [metrics.bad_pixel_rate(disp[i], pairs[i][2],
                                    count_invalid=False)
             for i in range(BATCH)]
    log(f"kept-pixel bad rates: {[f'{r:.4f}' for r in rates]}")
    return v


def main():
    pairs = make_pairs(BATCH)
    base = oracle_mpxs(pairs)
    v = tpu_mpxs(pairs)
    print(json.dumps({
        "metric": "full_pipeline_throughput_per_chip",
        "value": round(v, 3),
        "unit": "Mpx/s",
        "vs_baseline": round(v / base, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
