#!/usr/bin/env python
"""Per-stage timing of the jitted pipeline on the current backend.

On the axon relay backend `jax.block_until_ready` does NOT wait for
device completion, so naive timing is meaningless.  This harness forces
real completion by fetching a scalar probe that depends on the LAST of N
enqueued steps (TPU executes enqueued programs in order), and removes
the constant relay round-trip latency by differencing two N values
(slope method): t_step = (t(N2) - t(N1)) / (N2 - N1).
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from deepmatching_stereo_matching_tpu import Config
from deepmatching_stereo_matching_tpu.models import descriptors, pipeline
from deepmatching_stereo_matching_tpu.ops import costvol_pallas, costvol as costvol_ops
from deepmatching_stereo_matching_tpu.oracle import reference as oracle
from deepmatching_stereo_matching_tpu.data import synthetic

H, W, MAX_D, BATCH = 375, 450, 64, 32
N1, N2 = 5, 25


@jax.jit
def _probe(x):
    leaves = jax.tree_util.tree_leaves(x)
    return sum(jnp.ravel(l)[0].astype(jnp.float32) for l in leaves)


def timeit(fn, *args):
    """Steady-state seconds/step via the slope method."""
    float(_probe(fn(*args)))  # compile + warm
    ts = []
    for n in (N1, N2):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        float(_probe(outs[-1]))
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (N2 - N1)


def main():
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    cfg = Config(max_disparity=MAX_D)
    geom = cfg.geometry(H, W)
    print(f"backend={jax.default_backend()} impl={impl} geom={geom}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    lp, rp = [], []
    for i in range(BATCH):
        field = synthetic.block_disparity_field(H, W, MAX_D, rng, block=32)
        left, right, _ = synthetic.make_pair(H, W, field, seed=i)
        lp.append(oracle.pad_image(oracle.to_grayscale_f32(left), geom))
        rp.append(oracle.pad_image(oracle.to_grayscale_f32(right), geom))
    ls = jnp.asarray(np.stack(lp))
    rs = jnp.asarray(np.stack(rp))

    rows = []

    @jax.jit
    def f_desc(ls, rs):
        d1 = jax.vmap(lambda x: descriptors.left_descriptors(x, cfg))(ls)
        d2 = jax.vmap(
            lambda x: descriptors.right_sliding_descriptors(x, cfg))(rs)
        return d1, d2

    rows.append(("descriptors(L+R)", timeit(f_desc, ls, rs)))
    d_src, d_tgt = f_desc(ls, rs)

    if impl == "pallas":
        from deepmatching_stereo_matching_tpu.ops import pyramid_pallas

        @jax.jit
        def f_cv(a, b):
            return jax.vmap(lambda s, t_: costvol_pallas.cost_volume_dmajor(
                s, t_, geom.disparities, cfg.patch_size,
                cfg.max_disparity))(a, b)

        rows.append(("costvol[pallas dmajor]", timeit(f_cv, d_src, d_tgt)))
        cost_dm = f_cv(d_src, d_tgt)

        @jax.jit
        def f_pb(c):
            return jax.vmap(lambda x: pyramid_pallas.pyramid_backtrack(
                x, geom.levels, cfg.lam))(c)

        rows.append(("pyramid+backtrack[pallas]", timeit(f_pb, cost_dm)))
        disp, _ = f_pb(cost_dm)
    else:
        @jax.jit
        def f_cv(a, b):
            return jax.vmap(lambda s, t_: costvol_ops.cost_volume(
                s, t_, geom.disparities, cfg.patch_size,
                cfg.max_disparity))(a, b)

        rows.append(("costvol[jnp]", timeit(f_cv, d_src, d_tgt)))
        cost0 = f_cv(d_src, d_tgt)

        @jax.jit
        def f_pyr(c):
            return jax.vmap(lambda x: pipeline.build_pyramid(
                x, geom.levels, cfg.lam))(c)

        rows.append(("pyramid", timeit(f_pyr, cost0)))
        maps, args = f_pyr(cost0)

        @jax.jit
        def f_bt(maps, args):
            return jax.vmap(pipeline.backtrack)(list(maps), list(args))

        rows.append(("backtrack", timeit(f_bt, maps, args)))
        disp, _ = f_bt(maps, args)

    @jax.jit
    def f_lr(a):
        return jax.vmap(lambda x: pipeline.lr_consistency_patch(
            x, x, cfg.tau, geom.disparities, cfg.patch_size))(a)

    rows.append(("lr_check(patch)", timeit(f_lr, disp)))

    @jax.jit
    def f_full(a, b):
        return jax.vmap(lambda l, r: pipeline.match_padded_core(
            l, r, cfg, geom, impl))(a, b)

    rows.append(("FULL (2 dirs)", timeit(f_full, ls, rs)))

    one_dir = sum(t for _, t in rows[:-1])
    print(f"\n{'stage':<22}{'ms/batch32':>12}{'% of 2x1dir':>14}")
    for name, t in rows:
        print(f"{name:<22}{t * 1e3:>12.2f}{t / (2 * one_dir) * 100:>13.1f}%")
    full = rows[-1][1]
    print(f"\nfull: {full * 1e3:.2f} ms -> "
          f"{BATCH * H * W * 1e-6 / full:.1f} Mpx/s")


if __name__ == "__main__":
    main()
