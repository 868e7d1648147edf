#!/usr/bin/env python
"""On-chip A/B harness for the fused kernel's DISPARITY-LOOP knobs (r5).

ROOFLINE r4 put the fused kernel at 27% of its VPU bound with neither
MXU nor VPU saturated — the time is sequencing.  ABLATE_FUSED r4
attributes ~0.97 ms of the 1.45 ms kernel to the disparity loop, whose
per-group code path is [accumulate (VPU)] -> [concat] -> [split-bf16
casts] -> [compaction matmul (MXU)] -> [slice results (VPU, depends on
MXU)]: the result slicing right after each matmul can stall in-order
VPU issue at every group boundary.  This tool measures, at the bench
geometry with the shared timing protocol:

  * sched=inline vs deferred  (_DLOOP_SCHED — bitwise identical)
  * group size 8/16/32        (_DLOOP_GROUP — bitwise identical)
  * dcomp=bf16                (_DCOMP_PREC — single-pass compaction,
                               truncates correlation sums to bf16;
                               decision flips measured vs the exact
                               6-pass reference)
  * memo prebuild             (_MEMO_PREBUILD — bitwise identical)

Writes DLOOP_EXPERIMENTS.json; winners get baked into ops/fused_pallas
defaults.  Same-process A/B only (the shared axon chip varies ~2x
across processes).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W, MAX_D, BATCH = 375, 450, 64, 32
RETRIES = 3


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--gh-only", action="store_true",
                    help="run only the grad_hist arms (appends to the "
                         "existing DLOOP_EXPERIMENTS.json results)")
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepmatching_stereo_matching_tpu import Config
    from deepmatching_stereo_matching_tpu.ops import fused_pallas
    from deepmatching_stereo_matching_tpu.oracle import reference as oracle
    from deepmatching_stereo_matching_tpu.data import synthetic
    from deepmatching_stereo_matching_tpu.utils import timing

    cfg = Config(max_disparity=MAX_D)
    geom = cfg.geometry(H, W)
    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    lp, rp = [], []
    for i in range(BATCH):
        rng = np.random.default_rng(100 + i)
        field = synthetic.block_disparity_field(H, W, MAX_D, rng, block=32)
        left, right, _ = synthetic.make_pair(H, W, field, seed=100 + i)
        lp.append(oracle.pad_image(oracle.to_grayscale_f32(left), geom))
        rp.append(oracle.pad_image(oracle.to_grayscale_f32(right), geom))
    lpa = jnp.asarray(np.stack(lp))
    rpa = jnp.asarray(np.stack(rp))
    ls = jnp.concatenate([lpa, rpa[:, :, ::-1]])
    rs = jnp.concatenate([rpa, lpa[:, :, ::-1]])
    np.asarray(jnp.zeros(()))  # warm the relay

    saved = {k: getattr(fused_pallas, k) for k in
             ("_DLOOP_SCHED", "_DLOOP_GROUP", "_DCOMP_PREC",
              "_MEMO_PREBUILD", "_SKIP_PYRAMID", "_DOT_PREC",
              "_BLOCK_ROWS_OVERRIDE", "_GRADHIST_MODE", "_GH_MASK")}
    # (name, sched, group, dcomp_prec, prebuild, skip_pyramid)
    variants = [
        ("exact-ref", "inline", 8, None, False, False),  # highest, below
        ("r04-baseline", "inline", 8, None, False, False),
        ("deferred", "deferred", 8, None, False, False),
        ("deferred-g16", "deferred", 16, None, False, False),
        ("deferred-g32", "deferred", 32, None, False, False),
        ("deferred-bf16comp", "deferred", 8, "bf16", False, False),
        ("deferred-prebuild", "deferred", 8, None, True, False),
        ("ABL-baseline-nopyr", "inline", 8, None, False, True),
        ("ABL-deferred-nopyr", "deferred", 8, None, False, True),
        ("ABL-deferred-bf16comp-nopyr", "deferred", 8, "bf16", False,
         True),
    ]
    results = []
    if cli.gh_only:
        prev = os.path.join(REPO, "DLOOP_EXPERIMENTS.json")
        if os.path.exists(prev):
            with open(prev) as f:
                results = [r for r in json.load(f)["results"]
                           if not r.get("name", "").startswith("gh-")]
        variants = []
    ref_disp = None
    for name, sched, grp, dprec, pre, nopyr in variants:
        fused_pallas._DLOOP_SCHED = sched
        fused_pallas._DLOOP_GROUP = grp
        fused_pallas._DCOMP_PREC = dprec
        fused_pallas._MEMO_PREBUILD = pre
        fused_pallas._SKIP_PYRAMID = nopyr
        if name == "exact-ref":
            fused_pallas._DOT_PREC = "highest"
            fused_pallas._BLOCK_ROWS_OVERRIDE = 16  # bh=48 IR crashes
        else:
            fused_pallas._DOT_PREC = None
            fused_pallas._BLOCK_ROWS_OVERRIDE = None
        rec = {"name": name, "sched": sched, "group": grp,
               "dcomp_prec": dprec, "prebuild": pre,
               "skip_pyramid": nopyr}
        for attempt in range(RETRIES):
            fused_pallas._match_rows.clear_cache()
            fn = jax.jit(lambda a, b: jax.vmap(
                lambda x, y: fused_pallas.match_rows(x, y, cfg, geom)
            )(a, b))
            try:
                stats = timing.steady_state(fn, (ls, rs))
                out = fn(ls, rs)
                disp = np.asarray(out[0])
                rec.pop("failed", None)
                rec.pop("error", None)
                break
            except Exception as e:
                print(f"{name}: attempt {attempt + 1} FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr, flush=True)
                rec.update(failed=True, error=str(e)[:300])
        if rec.get("failed"):
            results.append(rec)
            continue
        if nopyr:
            neq = None  # ablation arm emits dummy outputs
        elif ref_disp is None:
            ref_disp = disp
            neq = 0.0
        else:
            neq = float(np.mean(disp != ref_disp))
        rec.update(ms_per_step=round(stats["median"] * 1e3, 3),
                   timing={k: stats[k] for k in
                           ("median", "min", "max", "samples")},
                   decision_disagreement=neq)
        print(f"{name}: {timing.fmt(stats)}  neq="
              f"{'n/a' if neq is None else f'{neq:.2e}'}",
              file=sys.stderr, flush=True)
        results.append(rec)
    # Restore the saved module defaults (NOT hardcoded literals — if a
    # default changes, a literal would silently leave the process in a
    # non-default configuration).
    for k, v in saved.items():
        setattr(fused_pallas, k, v)

    # grad_hist arms: the r5 magbin kernel (2 planes/image,
    # equality-masked products) vs the r04 F=8 interleaved-rows form.
    import dataclasses

    gh_cfg = dataclasses.replace(cfg, descriptor="grad_hist")
    gh_ref = None
    for name, mode, sched, mask in (
            ("gh-interleave-r04", "interleave", "inline", "where"),
            ("gh-magbin", "magbin", "inline", "where"),
            ("gh-magbin-deferred", "magbin", "deferred", "where"),
            ("gh-magbin-mulmask", "magbin", "inline", "mulmask"),
            ("gh-magbin-relu", "magbin", "inline", "relu")):
        fused_pallas._GRADHIST_MODE = mode
        fused_pallas._DLOOP_SCHED = sched
        fused_pallas._GH_MASK = mask
        rec = {"name": name, "gradhist_mode": mode, "sched": sched,
               "gh_mask": mask}
        if not fused_pallas.supported(gh_cfg, geom):
            rec.update(failed=True, error="not supported")
            results.append(rec)
            continue
        for attempt in range(RETRIES):
            fused_pallas._match_rows.clear_cache()
            fn = jax.jit(lambda a, b: jax.vmap(
                lambda x, y: fused_pallas.match_rows(x, y, gh_cfg, geom)
            )(a, b))
            try:
                stats = timing.steady_state(fn, (ls, rs))
                out = fn(ls, rs)
                disp = np.asarray(out[0])
                rec.pop("failed", None)
                rec.pop("error", None)
                break
            except Exception as e:
                print(f"{name}: attempt {attempt + 1} FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr, flush=True)
                rec.update(failed=True, error=str(e)[:300])
        if rec.get("failed"):
            results.append(rec)
            continue
        if gh_ref is None:
            gh_ref = disp
            neq = 0.0
        else:
            neq = float(np.mean(disp != gh_ref))
        rec.update(ms_per_step=round(stats["median"] * 1e3, 3),
                   timing={k: stats[k] for k in
                           ("median", "min", "max", "samples")},
                   decision_disagreement=neq)
        print(f"{name}: {timing.fmt(stats)}  neq={neq:.2e}",
              file=sys.stderr, flush=True)
        results.append(rec)
    for k, v in saved.items():
        setattr(fused_pallas, k, v)
    fused_pallas._match_rows.clear_cache()

    out_path = os.path.join(REPO, "DLOOP_EXPERIMENTS.json")
    with open(out_path, "w") as f:
        json.dump({"geometry": [H, W, MAX_D], "directions": 2 * BATCH,
                   "results": results}, f, indent=1)
    print(f"wrote {out_path}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
