"""Where do voxelize_jnp's 14.9 ms/batch (B2, 65536 pts) go?

Times, on chip, the candidate costs inside the on-device voxelizer:
  argsort    : stable argsort of the (P,) int32 cell ids           (suspect)
  sort1      : single-operand jnp.sort of the same keys (floor for any
               sort-based algorithm)
  sortP      : lax.sort of (key, idx, x, y, z, r) — sort the payload along
               instead of gathering after
  gathers    : the three post-sort gathers (points, lin, coords)
  scatters   : the voxel/coord/num_points scatter set
  e2e        : full voxelize_jnp (vmap over B)
Each timed with enqueue-N-sync-once, B samples vmapped like the bench.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      str(Path(__file__).resolve().parent.parent / '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import numpy as np

B = int(os.environ.get('BENCH_BATCH', '2'))
P = int(os.environ.get('BENCH_MAX_POINTS', '65536'))
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.ops.voxelizer import voxelize_jnp

    rng = np.random.RandomState(0)
    pts = rng.uniform(-40, 70, size=(B, P, 4)).astype(np.float32)
    mask = np.ones((B, P), bool)
    mask[:, 30000:] = False  # bench scenes carry ~25-30k real points
    vsz = (0.16, 0.16, 4.0)
    rng_pc = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    nx, ny = 432, 496

    pts_j = jnp.asarray(pts)
    mask_j = jnp.asarray(mask)

    def lin_ids(p, m):
        voxel_size = jnp.asarray(vsz, jnp.float32)
        pc = jnp.asarray(rng_pc, jnp.float32)
        coords = jnp.floor((p[:, :3] - pc[:3]) / voxel_size).astype(jnp.int32)
        grid = jnp.asarray([nx, ny, 1], jnp.int32)
        ok = ((coords >= 0) & (coords < grid[None, :])).all(axis=1) & m
        lin = (coords[:, 2] * ny + coords[:, 1]) * nx + coords[:, 0]
        return jnp.where(ok, lin, nx * ny)

    def f_argsort(p, m):
        lin = jax.vmap(lin_ids)(p, m)
        return jax.vmap(lambda l: jnp.argsort(l, stable=True))(lin)

    def f_sort1(p, m):
        lin = jax.vmap(lin_ids)(p, m)
        return jax.vmap(jnp.sort)(lin)

    def f_sortP(p, m):
        lin = jax.vmap(lin_ids)(p, m)
        def one(l, pp):
            ops = (l, pp[:, 0], pp[:, 1], pp[:, 2], pp[:, 3])
            return jax.lax.sort(ops, num_keys=1)
        return jax.vmap(one)(lin, p)

    # host-generated random permutation: a data-dependent gather XLA cannot
    # specialize (a reversed iota lowers to a cheap reverse — ADVICE r4)
    perm_np = np.stack([np.random.RandomState(7 + b).permutation(P)
                        for b in range(pts_j.shape[0])]).astype(np.int32)
    perm_j = jnp.asarray(perm_np)

    def f_gathers(p, m, idx=perm_j):
        def one(pp, ii):
            lin = jnp.arange(P, dtype=jnp.int32)
            return pp[ii], lin[ii], pp[ii, :3]
        return jax.vmap(one)(p, idx)

    def f_e2e(p, m):
        return jax.vmap(lambda a, b: voxelize_jnp(
            a, b, vsz, rng_pc, 32, 12000))(p, m)

    def run(name, fn):
        jf = jax.jit(fn)
        out = jf(pts_j, mask_j)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = jf(pts_j, mask_j)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(json.dumps({'stage': name, 'ms_per_batch': round(dt, 2),
                          'B': B, 'P': P}), flush=True)

    run('argsort', f_argsort)
    run('sort1', f_sort1)
    run('sortP', f_sortP)
    run('gathers', f_gathers)
    run('e2e', f_e2e)


if __name__ == '__main__':
    main()
