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

Besides throughput, every bench run gates QUALITY on the real chip
(VERDICT.md r2 item 3): the compiled two-kernel Pallas path must match
the NumPy oracle BITWISE on disparity decisions for PARITY_PAIRS bench
pairs, and the fused kernel (different-but-algebraically-equal
normalisation, ops/fused_pallas.py) may flip at most FUSED_DECISION_TOL
of patch decisions.  Any violation exits nonzero, so a Mosaic-only
numerics break can never ship inside a green bench.  It also smoke-runs
the wtiled + dslab sharded strategies on a 1-device mesh on the chip
(shard_map + Pallas must lower on real Mosaic, not just CPU interpret)
and measures the bf16 fused path.

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
# Enqueue depths (ITERS//2, ITERS*2): the differenced window must
# dwarf the axon relay's ~30 ms fetch-latency jitter or slope samples
# can even go negative (observed at (5, 20) with ~2 ms steps).
ITERS = 16
ORACLE_FILE = os.path.join(REPO, "ORACLE_BASELINE.json")
# On-chip parity gate: pairs checked against the NumPy oracle, and the
# documented fused-kernel tolerance — the fused normalisation differs
# from the oracle's by rounding only (scores agree to ~1e-5), so
# disparity decisions may flip only on near-ties; allow 0.5% of patch
# decisions, gate bitwise for the two-kernel 'pallas' path.
PARITY_PAIRS = 4
FUSED_DECISION_TOL = 0.005


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

    # Steady-state streaming throughput via the repo-wide protocol
    # (utils/timing.py): repeat-measured enqueue slopes, median +
    # spread.  On the axon relay backend, jax.block_until_ready does
    # NOT wait for device completion, so the protocol forces completion
    # by fetching a scalar depending on the last enqueued step.
    from deepmatching_stereo_matching_tpu.utils import timing

    stats = timing.steady_state(step, (ls, rs),
                                depths=(ITERS // 2, ITERS * 2))
    t = stats["median"]
    v = BATCH * H * W * 1e-6 / t
    log(f"device step: {timing.fmt(stats)} steady-state "
        f"for {BATCH} pairs")

    # Quality cross-check on the bench scene (kept-pixel bad rate).
    from deepmatching_stereo_matching_tpu.utils import metrics

    disp = np.asarray(out["disparity"])[:, :H, :W]
    rates = [metrics.bad_pixel_rate(disp[i], pairs[i][2],
                                    count_invalid=False)
             for i in range(BATCH)]
    log(f"kept-pixel bad rates: {[f'{r:.4f}' for r in rates]}")
    return v


def parity_gate(pairs):
    """Compiled-on-chip outputs vs the NumPy oracle (exit 1 on failure).

    'pallas' (two-kernel) must be BITWISE equal on every output;
    'fused' may flip <= FUSED_DECISION_TOL of patch decisions.
    """
    import jax
    import jax.numpy as jnp

    from deepmatching_stereo_matching_tpu.models import pipeline
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle
    from deepmatching_stereo_matching_tpu.utils import metrics

    cfg = bench_config()
    sub = pairs[:PARITY_PAIRS]
    t0 = time.perf_counter()
    want = [oracle.match_stereo(l, r, cfg) for l, r, _ in sub]
    log(f"parity gate: oracle on {len(sub)} pairs took "
        f"{time.perf_counter() - t0:.1f} s")

    failures = []
    for impl in ("pallas", "fused"):
        outs = []
        for left, right, _ in sub:
            o = pipeline.match_padded(
                jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(left),
                                             cfg.geometry(H, W))),
                jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(right),
                                             cfg.geometry(H, W))),
                cfg, H, W, impl)
            outs.append({k: np.asarray(v) for k, v in o.items()})
        for i, (got, w_) in enumerate(zip(outs, want)):
            raw_neq = np.mean(got["disparity_raw"] != w_.disparity_raw)
            val_neq = np.mean(got["valid"] != w_.valid)
            bad_tpu = metrics.bad_pixel_rate(got["disparity"], sub[i][2],
                                             count_invalid=False)
            bad_ora = metrics.bad_pixel_rate(w_.disparity, sub[i][2],
                                             count_invalid=False)
            log(f"parity[{impl}] pair {i}: raw_neq={raw_neq:.2e} "
                f"valid_neq={val_neq:.2e} bad_tpu={bad_tpu:.4f} "
                f"bad_oracle={bad_ora:.4f} delta={bad_tpu - bad_ora:+.4f}")
            if impl == "pallas":
                # Disparity DECISIONS are the bitwise contract; scores
                # may differ in the last ulp (XLA fuses the descriptor
                # normalisation differently than NumPy rounds it).
                ok = (raw_neq == 0.0 and val_neq == 0.0
                      and np.array_equal(got["disparity"], w_.disparity,
                                         equal_nan=True)
                      and np.array_equal(got["disparity_right"],
                                         w_.disparity_right)
                      and np.allclose(got["score"], w_.score, rtol=1e-5))
                if not ok:
                    failures.append(f"pallas pair {i}: not bitwise "
                                    f"(raw_neq={raw_neq}, "
                                    f"valid_neq={val_neq})")
            else:
                if (raw_neq > FUSED_DECISION_TOL
                        or val_neq > FUSED_DECISION_TOL
                        or abs(bad_tpu - bad_ora) > FUSED_DECISION_TOL):
                    failures.append(f"fused pair {i}: decision "
                                    f"disagreement {raw_neq:.4f} / "
                                    f"{val_neq:.4f} beyond "
                                    f"{FUSED_DECISION_TOL}")
    if failures:
        for f_ in failures:
            log("PARITY FAILURE:", f_)
        sys.exit(1)
    log("parity gate: PASS (pallas bitwise, fused within tolerance)")


def sharded_smoke():
    """One wtiled + dslab + ringd step on a 1-device mesh ON THE CHIP.

    Proves the shard_map + Pallas composition lowers through real
    Mosaic (VERDICT.md r2 item 10); bitwise vs the unsharded pipeline.
    Since r4 the dslab/ringd shard bodies run the Pallas slab cost
    volume (sharded.slab_cost_volume) when impl='pallas', so this
    smoke exercises the kernel-speed shard bodies on real Mosaic.
    """
    import jax
    import jax.numpy as jnp

    from deepmatching_stereo_matching_tpu import Config, parallel
    from deepmatching_stereo_matching_tpu.models import pipeline
    from deepmatching_stereo_matching_tpu.parallel import sharded
    from deepmatching_stereo_matching_tpu.data import synthetic
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle

    h, w, max_d = 96, 128, 16
    cfg = Config(max_disparity=max_d, levels=2)
    rng = np.random.default_rng(3)
    field = synthetic.block_disparity_field(h, w, max_d, rng, block=24)
    left, right, _ = synthetic.make_pair(h, w, field, seed=3)
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"

    # Per-case reference impl: scores from the Pallas kernels round
    # differently at the last ulp than XLA's jnp path on real Mosaic
    # (decisions stay bitwise), so each case compares against the jnp
    # unsharded reference with the allclose-score contract below.
    # The "tiled" case runs the FLAGSHIP fused kernel inside the shard
    # body (VERDICT r4 item 2: the DP/H-tile deployment must run
    # kernel-speed per chip) and is therefore compared against the
    # unsharded fused path — same kernel, sharding-invariance contract.
    fused_impl = "fused" if jax.default_backend() == "tpu" else "jnp"
    cases = [("tiled", parallel.make_mesh(1, 1), None, fused_impl,
              fused_impl),
             ("wtiled", parallel.make_mesh2d(1, 1, 1), 1, impl, impl),
             ("dslab", parallel.make_mesh(1, 1), None, impl, "jnp"),
             ("ringd", parallel.make_mesh(1, 1), None, impl, "jnp")]
    for strategy, mesh, merge_level, body_impl, ref_impl in cases:
        lp = sharded.pad_batch([left], cfg, h, w, mesh, strategy,
                               merge_level)
        rp = sharded.pad_batch([right], cfg, h, w, mesh, strategy,
                               merge_level)
        out = sharded.match_batch_sharded(
            jnp.asarray(lp), jnp.asarray(rp), cfg, h, w, mesh, strategy,
            body_impl, merge_level)
        # Same impl on both sides: the contract is sharding-invariance
        # (compiled Pallas on real Mosaic rounds VPU reduces differently
        # than XLA's jnp path at the last ulp of `score`, which is why
        # the oracle gate above compares decisions bitwise but scores
        # at 1e-5).
        ref = pipeline.match_padded(
            jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(left),
                                         cfg.geometry(h, w))),
            jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(right),
                                         cfg.geometry(h, w))),
            cfg, h, w, ref_impl)
        for k in ref:
            a, b = np.asarray(out[k][0]), np.asarray(ref[k])
            if k == "score":
                # Decisions are the bitwise contract; scores may differ
                # in the last ulp across kernel VARIANTS on real Mosaic
                # (the wtiled merge path runs the row-layout costvol
                # kernel, unsharded runs the D-major one; their VPU
                # reduce trees round differently on chip but not in
                # CPU interpret mode).
                ok = np.allclose(a, b, rtol=1e-5, atol=1e-6)
            else:
                ok = np.array_equal(a, b, equal_nan=True)
            if not ok:
                log(f"SHARDED SMOKE FAILURE: {strategy}[{k}] != unsharded")
                sys.exit(1)
        log(f"sharded smoke [{strategy}]: 1-device mesh on "
            f"{jax.default_backend()}, impl={body_impl}: bitwise OK")

    # Sharded perf rows (VERDICT r3 item 5 / r4 item 2): time each
    # strategy's step at the BENCH geometry on the 1-device chip mesh,
    # so shard_map overhead vs the unsharded fused path has a number.
    # The "tiled" row runs the flagship FUSED kernel inside its shard
    # body — the per-chip speed the recommended DP deployment inherits.
    from deepmatching_stereo_matching_tpu.utils import timing

    bcfg = bench_config()
    nb = 8
    rng = np.random.default_rng(11)
    field = synthetic.block_disparity_field(H, W, MAX_D, rng, block=32)
    bl, br, _ = synthetic.make_pair(H, W, field, seed=11)
    for strategy, mesh, merge_level, row_impl in (
            ("tiled", parallel.make_mesh(1, 1), None, fused_impl),
            ("wtiled", parallel.make_mesh2d(1, 1, 1), 1, impl),
            ("dslab", parallel.make_mesh(1, 1), None, impl),
            ("ringd", parallel.make_mesh(1, 1), None, impl)):
        lp = jnp.asarray(sharded.pad_batch([bl] * nb, bcfg, H, W, mesh,
                                           strategy, merge_level))
        rp = jnp.asarray(sharded.pad_batch([br] * nb, bcfg, H, W, mesh,
                                           strategy, merge_level))

        def stepf(a, b, _s=strategy, _m=mesh, _ml=merge_level,
                  _i=row_impl):
            return sharded.match_batch_sharded(a, b, bcfg, H, W, _m, _s,
                                               _i, _ml)

        st = timing.steady_state(stepf, (lp, rp), depths=(2, 8))
        v = nb * H * W * 1e-6 / st["median"]
        log(f"sharded perf [{strategy}] 1-device mesh, batch {nb}: "
            f"{timing.fmt(st)}/step = {v:.1f} Mpx/s (impl={row_impl})")


def bf16_mpxs(pairs):
    """Fused-path bf16 throughput + quality row (VERDICT.md r2 item 6)."""
    import dataclasses
    import functools
    import jax
    import jax.numpy as jnp

    from deepmatching_stereo_matching_tpu.models import pipeline
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle
    from deepmatching_stereo_matching_tpu.utils import metrics

    cfg = dataclasses.replace(bench_config(), dtype="bfloat16")
    geom = cfg.geometry(H, W)
    from deepmatching_stereo_matching_tpu.ops import fused_pallas
    impl = "fused" if (jax.default_backend() == "tpu"
                       and fused_pallas.supported(cfg, geom)) else "jnp"
    lp = np.stack([oracle.pad_image(oracle.to_grayscale_f32(l), geom)
                   for l, _, _ in pairs])
    rp = np.stack([oracle.pad_image(oracle.to_grayscale_f32(r), geom)
                   for _, r, _ in pairs])

    @functools.partial(jax.jit)
    def step(ls, rs):
        return jax.vmap(
            lambda a, b: pipeline.match_padded_core(a, b, cfg, geom, impl)
        )(ls, rs)

    from deepmatching_stereo_matching_tpu.utils import timing

    ls, rs = jnp.asarray(lp), jnp.asarray(rp)
    out = step(ls, rs)
    stats = timing.steady_state(step, (ls, rs),
                                depths=(ITERS // 2, ITERS * 2))
    t = stats["median"]
    v = BATCH * H * W * 1e-6 / t
    disp = np.asarray(out["disparity"])[:, :H, :W]
    rates = [metrics.bad_pixel_rate(disp[i], pairs[i][2],
                                    count_invalid=False)
             for i in range(BATCH)]
    log(f"bf16 fused: {timing.fmt(stats)}/step = {v:.1f} Mpx/s "
        f"(impl={impl}), mean kept-pixel bad rate "
        f"{float(np.mean(rates)):.4f}")
    return v


def grad_hist_mpxs(pairs):
    """grad_hist-descriptor throughput row (VERDICT r3 item 8).

    The fused kernel covers only 'patch' descriptors; the reference's
    actual variant is unverifiable (SURVEY.md §7 hard part 6), so the
    8-bin gradient-histogram pipeline's two-kernel throughput is
    measured and published so the flagship claim is honest under
    either resolution of the ambiguity.
    """
    import dataclasses
    import jax
    import jax.numpy as jnp

    from deepmatching_stereo_matching_tpu.models import pipeline
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle
    from deepmatching_stereo_matching_tpu.utils import metrics, timing

    from deepmatching_stereo_matching_tpu.ops import fused_pallas

    cfg = dataclasses.replace(bench_config(), descriptor="grad_hist")
    geom = cfg.geometry(H, W)
    if jax.default_backend() != "tpu":
        impl = "jnp"
    elif fused_pallas.supported(cfg, geom):
        impl = "fused"   # F=8 feature-interleaved fused kernel
    else:
        impl = "pallas"
    lp = np.stack([oracle.pad_image(oracle.to_grayscale_f32(l), geom)
                   for l, _, _ in pairs])
    rp = np.stack([oracle.pad_image(oracle.to_grayscale_f32(r), geom)
                   for _, r, _ in pairs])

    step = jax.jit(lambda a, b: jax.vmap(
        lambda x, y: pipeline.match_padded_core(x, y, cfg, geom, impl)
    )(a, b))
    ls, rs = jnp.asarray(lp), jnp.asarray(rp)
    out = step(ls, rs)
    stats = timing.steady_state(step, (ls, rs),
                                depths=(ITERS // 2, ITERS * 2))
    v = BATCH * H * W * 1e-6 / stats["median"]
    disp = np.asarray(out["disparity"])[:, :H, :W]
    rates = [metrics.bad_pixel_rate(disp[i], pairs[i][2],
                                    count_invalid=False)
             for i in range(BATCH)]
    log(f"grad_hist: {timing.fmt(stats)}/step = {v:.1f} "
        f"Mpx/s (impl={impl}), mean kept-pixel bad rate "
        f"{float(np.mean(rates)):.4f}")
    return v


def adversarial_row():
    """Quality on hostile scenes (occlusion/textureless/photometric
    asymmetry — VERDICT r3 item 7): on-chip outputs vs the oracle,
    plus the kept-pixel bad rate and the LR check's occlusion
    rejection rate, on data/synthetic.py:adversarial_pair scenes."""
    import jax
    import jax.numpy as jnp

    from deepmatching_stereo_matching_tpu.data import synthetic
    from deepmatching_stereo_matching_tpu.models import pipeline
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle

    cfg = bench_config()
    h, w = 240, 360
    occ_tot = rej = kept = bad = 0
    fails = []
    for seed in range(2):
        left, right, gt, occ = synthetic.adversarial_pair(
            h, w, MAX_D, seed=seed)
        geom = cfg.geometry(h, w)
        lp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(left),
                                          geom))
        rp = jnp.asarray(oracle.pad_image(oracle.to_grayscale_f32(right),
                                          geom))
        got = {k: np.asarray(v) for k, v in pipeline.match_padded(
            lp, rp, cfg, h, w, "pallas").items()}
        want = oracle.match_stereo(left, right, cfg)
        # Textureless regions are ALL exact ties by construction, so
        # device-vs-NumPy ULP differences in equal-valued correlations
        # can legitimately flip winners there — decisions are gated at
        # a small rate, not bitwise (the bitwise contract is gated on
        # non-degenerate scenes in parity_gate above).
        raw_neq = float(np.mean(got["disparity_raw"]
                                != want.disparity_raw))
        val_neq = float(np.mean(got["valid"] != want.valid))
        log(f"adversarial seed {seed}: raw_neq={raw_neq:.2e} "
            f"val_neq={val_neq:.2e}")
        if raw_neq > 0.01 or val_neq > 0.01:
            fails.append(f"adversarial seed {seed}: decision "
                         f"disagreement {raw_neq:.4f}/{val_neq:.4f}")
        valid = got["valid"]
        occ_tot += occ.sum()
        rej += (~valid[occ]).sum()
        keep = valid & ~occ & (gt >= 0)
        kept += keep.sum()
        bad += (np.abs(got["disparity"][keep] - gt[keep]) > 1).sum()
    log(f"adversarial scenes: occ_rejection={rej / max(occ_tot, 1):.3f} "
        f"kept-nonocc-bad={bad / max(kept, 1):.4f} "
        f"(oracle decisions {'OK' if not fails else 'FAIL'})")
    # Floors sit just below the measured values (r4: 0.75 / 0.080) so a
    # real quality regression on hostile scenes fails the bench instead
    # of shipping green (VERDICT r4 weak #6).
    if fails or rej / max(occ_tot, 1) < 0.6 or bad / max(kept, 1) > 0.15:
        for f_ in fails:
            log("ADVERSARIAL FAILURE:", f_)
        log("ADVERSARIAL FAILURE: quality below floor")
        sys.exit(1)


def native_io_row(pairs):
    """Host input-path throughput: native prefetch loader vs Python.

    Measured on RGB PPM pairs at the bench resolution (the Middlebury-
    realistic decode: Python pays numpy temporaries for the grayscale
    matmul; the C++ loader does decode+gray+normalise+pad in one pass
    on worker threads).  Also measures the OVERLAP case — a consumer
    that "computes" ~5 ms per pair, like the device stream — where
    prefetch should hide the input path entirely.  Host-only; no
    device involvement.  (For pre-grayscale u8 PGMs numpy's vectorised
    reader is faster serially; the loader's win there is overlap only.)
    """
    import tempfile

    from deepmatching_stereo_matching_tpu import native
    from deepmatching_stereo_matching_tpu.io import images
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle

    if not native.available():
        log(f"native io: unavailable ({native.build_error()})")
        return
    cfg = bench_config()
    geom = cfg.geometry(H, W)
    tmp = tempfile.mkdtemp(prefix="bench_native_io_")
    rng = np.random.default_rng(0)
    lefts, rights = [], []
    for i in range(len(pairs)):
        for side, acc in (("l", lefts), ("r", rights)):
            img = rng.integers(0, 256, (H, W, 3), dtype="uint8")
            p = os.path.join(tmp, f"{i}_{side}.ppm")
            native.write_pnm(p, img)
            acc.append(p)

    def py_load(lp, rp):
        return tuple(
            oracle.pad_image(oracle.to_grayscale_f32(images._load_pnm(p)),
                             geom) for p in (lp, rp))

    # Serial decode throughput.
    t0 = time.perf_counter()
    for lp, rp in zip(lefts, rights):
        py_load(lp, rp)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    with native.PairLoader(lefts, rights, geom.padded_height,
                           geom.padded_width, num_threads=4) as ld:
        n = sum(1 for _ in ld)
    t_nat = time.perf_counter() - t0
    assert n == len(lefts)
    log(f"native io: decode+pad {n} RGB pairs: python {t_py*1e3:.1f} ms, "
        f"native 4-thread prefetch {t_nat*1e3:.1f} ms "
        f"({t_py / max(t_nat, 1e-9):.1f}x)")

    # Overlap: consumer busy ~5 ms/pair (device-step stand-in).
    def busy(seconds):
        t_end = time.perf_counter() + seconds
        while time.perf_counter() < t_end:
            pass

    t0 = time.perf_counter()
    for lp, rp in zip(lefts, rights):
        py_load(lp, rp)
        busy(0.005)
    t_py_ov = time.perf_counter() - t0
    t0 = time.perf_counter()
    with native.PairLoader(lefts, rights, geom.padded_height,
                           geom.padded_width, num_threads=4) as ld:
        for _ in ld:
            busy(0.005)
    t_nat_ov = time.perf_counter() - t0
    compute = 0.005 * n
    log(f"native io overlap (5 ms/pair consumer): python adds "
        f"{(t_py_ov - compute)*1e3:.1f} ms over compute, native adds "
        f"{(t_nat_ov - compute)*1e3:.1f} ms "
        f"({(t_py_ov - compute) / max(t_nat_ov - compute, 1e-9):.1f}x "
        f"less input latency)")


def main():
    pairs = make_pairs(BATCH)
    base = oracle_mpxs(pairs)
    v = tpu_mpxs(pairs)
    parity_gate(pairs)
    sharded_smoke()
    bf16_mpxs(pairs)
    grad_hist_mpxs(pairs)
    adversarial_row()
    native_io_row(pairs)
    print(json.dumps({
        "metric": "full_pipeline_throughput_per_chip",
        "value": round(v, 3),
        "unit": "Mpx/s",
        "vs_baseline": round(v / base, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
