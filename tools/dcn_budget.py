#!/usr/bin/env python
"""Analytic DCN traffic budget for the 2-host scaling target.

BASELINE.json:5 sets ">= 80% scaling efficiency at 2 hosts"; real
multi-host hardware is not reachable in this environment
(SURVEY.md §0), so this note rests the claim on arithmetic instead of
nothing (VERDICT.md r2 weak #4): for every parallel strategy it counts
the BYTES that cross the host boundary per stereo pair and compares
them, at assumed DCN rates, against the measured per-pair compute time
from the real chip (ROOFLINE.json / BENCH_r*.json).

Model:  efficiency = t_compute / (t_compute + t_dcn),
        t_dcn = cross_host_bytes / DCN_BW,
assuming no compute/comm overlap (pessimistic) and ignoring latency
(optimistic at tiny messages; the volumes here are >= 50 KB, where
bandwidth dominates).  Writes DCN_BUDGET.md at the repo root.

Assumed rates (stated, not measured):
  DCN     25 GB/s per host pair (2x200GbE per v5e host, derated 50%)
  ICI     intra-host; never the bottleneck at these sizes
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DCN_BW = 25e9            # bytes/s across the host boundary
F32 = 4

# Bench geometry (bench.py): Middlebury-class pair, both LR directions.
H, W, MAX_D = 375, 450, 64


def per_pair_compute_seconds() -> float:
    """Measured single-chip seconds per pair (both directions)."""
    rl = os.path.join(REPO, "ROOFLINE.json")
    if os.path.exists(rl):
        with open(rl) as f:
            r = json.load(f)
        return (r["rows"]["full_step_fused"]["seconds"]
                / r["geometry"]["batch_pairs"])
    return 5.06e-3 / 32  # BENCH_r03 fallback


def budget(levels=4, n_hosts=2, chips_per_host=8):
    from deepmatching_stereo_matching_tpu import Config

    cfg = Config(max_disparity=MAX_D)
    geom = cfg.geometry(H, W)
    h0, w0, d0 = geom.grid_h, geom.grid_w, geom.disparities
    hp, wp = geom.padded_height, geom.padded_width
    p = cfg.patch_size
    ndir = 2                       # LR flip mode matches 2 directions
    t_pair = per_pair_compute_seconds()
    # Per-pair compute shrinks with total chips under any strategy that
    # splits work; DCN time does not.  Efficiency at N hosts compares
    # the per-host step time with and without the DCN term.
    n_chips = n_hosts * chips_per_host

    rows = []

    def row(name, axis_over_dcn, bytes_per_pair, note):
        t_comp = t_pair / n_chips            # perfectly split compute
        t_dcn = bytes_per_pair / DCN_BW
        eff = t_comp / (t_comp + t_dcn)
        rows.append({
            "strategy": name,
            "axis_over_dcn": axis_over_dcn,
            "cross_host_bytes_per_pair": int(bytes_per_pair),
            "dcn_seconds_per_pair": t_dcn,
            "efficiency_at_2_hosts": eff,
            "meets_80pct": eff >= 0.8,
            "note": note,
        })

    # 1. DP: the data axis spans the hosts.  Each host feeds its own
    # batch shard from local disk (runner._put builds only addressable
    # shards) and consumes its own outputs; nothing crosses DCN in
    # steady state.  With the optional cross-process output gather
    # (on_result), the 5 output maps cross once.
    row("DP (data axis over DCN)", "data", 0.0,
        "inputs and outputs stay host-local; recommended layout")
    out_bytes = 5 * H * W * F32
    row("DP + full output gather", "data", out_bytes,
        "only when on_result needs every pair on every host")

    # 2. tiled (H-tiles): zero-communication by construction.
    row("tiled H-tiles (model axis over DCN)", "model", 0.0,
        "quadtree-aligned row tiles need no halo (parallel/mesh.py)")

    # 3. wtiled: per direction, per W-neighbour edge crossing DCN:
    # descriptor halo columns once + LR halo once.  With n_tw tiles
    # split across 2 hosts, exactly ONE tile edge crosses the boundary.
    halo_q = (MAX_D - 1) // p + 2       # halo width in patch columns
    desc_halo = hp * (halo_q * p) * F32     # image columns, both sides-ish
    lr_halo = h0 * (halo_q + 1) * F32
    # merge_level=1 all_gather of the level-1 maps: each host must
    # receive the other host's half of the (H0/2, W0/2, D/2) level map.
    merge = (h0 // 2) * (w0 // 2) * (d0 // 2) * F32 / 2
    wt = ndir * (desc_halo + lr_halo + merge)
    row("wtiled + merge_level=1 (tw over DCN)", "model", wt,
        "1 tile edge on DCN: descriptor+LR halos + coarse merge")
    wt0 = ndir * (desc_halo + lr_halo)
    row("wtiled, tile-local pyramid (tw over DCN)", "model", wt0,
        "merge_level=None: halos only")

    # 4. dslab: the all_to_all moves (K-1)/K of the full volume through
    # every chip; across a 2-host split, HALF the volume crosses DCN.
    vol = h0 * w0 * d0 * F32
    row("dslab all_to_all (model axis over DCN)", "model",
        ndir * vol / 2,
        "half the (H0,W0,D) volume crosses the boundary per direction")

    # 5. ringd: per direction, per DCN-crossing ring edge (2 in a
    # 2-host ring): one halo plane per level + the accumulated argmax
    # pair per ring step that crosses + one psum plane per level.
    plane = h0 * w0 * F32
    ring = ndir * 2 * (levels * plane        # pool halos
                       + 2 * plane           # (val, idx) ring steps
                       + levels * 2 * plane  # psum up+down per level
                       )
    row("ringd (model axis over DCN)", "model", ring,
        "only (H0,W0) planes ever cross; 2 DCN edges in a 2-host ring")

    # 6. Large-D comparison (KITTI class, D=256): compute scales ~D,
    # dslab traffic scales ~D, ringd traffic is D-INDEPENDENT.
    scale_d = 256 // MAX_D
    t_comp = t_pair * scale_d / n_chips
    for name, b in (("dslab, D=256 (model over DCN)",
                     ndir * vol * scale_d / 2),
                    ("ringd, D=256 (model over DCN)", ring)):
        t_dcn = b / DCN_BW
        rows.append({
            "strategy": name, "axis_over_dcn": "model",
            "cross_host_bytes_per_pair": int(b),
            "dcn_seconds_per_pair": t_dcn,
            "efficiency_at_2_hosts": t_comp / (t_comp + t_dcn),
            "meets_80pct": t_comp / (t_comp + t_dcn) >= 0.8,
            "note": "compute x4, ringd traffic unchanged",
        })

    return rows, t_pair, n_chips


def main():
    rows, t_pair, n_chips = budget()
    lines = [
        "# DCN traffic budget — 2-host scaling target",
        "",
        "Generated by `tools/dcn_budget.py` (see its docstring for the",
        "model and assumed rates).  Measured single-chip compute: "
        f"**{t_pair*1e6:.0f} us/pair** (ROOFLINE.json full step), split "
        f"over {n_chips} chips at 2 hosts.",
        "",
        "| strategy | axis on DCN | bytes/pair | DCN us/pair | eff@2hosts "
        "| >=80% |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['strategy']} | {r['axis_over_dcn']} | "
            f"{r['cross_host_bytes_per_pair']:,} | "
            f"{r['dcn_seconds_per_pair']*1e6:.0f} | "
            f"{r['efficiency_at_2_hosts']*100:.0f}% | "
            f"{'yes' if r['meets_80pct'] else 'NO'} |")
    lines += [
        "",
        "Read: at full 16-chip throughput only the **zero-traffic** "
        "layouts meet the 80% bar — DP with host-local outputs (the "
        "layout `tools/multihost_sim.py` exercises and the recommended "
        "deployment) and zero-halo H-tiles.  Every byte-moving "
        "model-axis split fails at this tiny per-pair compute "
        "(Middlebury D=64 is ~10 us/pair across 16 chips); model axes "
        "belong INSIDE a host, on ICI.  Among volume-sharded "
        "strategies the ring matters at scale: dslab's all_to_all "
        "traffic grows with D while ringd's plane traffic does not, so "
        "at KITTI D=256 ringd moves ~4.6x fewer cross-host bytes for "
        "the same result (last two rows) — it is the least-bad "
        "cross-host layout when a single host cannot hold the volume, "
        "and the gap widens linearly in D.",
        "",
        "Batch-size note: the DCN terms above are per pair and "
        "amortise nothing; DP's zero-traffic result is independent of "
        "batch size, so >=80% at 2 hosts holds for every batch size "
        "under DP, and the table's model-axis rows bound the worst "
        "case.",
    ]
    out = os.path.join(REPO, "DCN_BUDGET.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
