"""Profile the sparse-conv library on the real chip at SECOND's operating
point (B=2, V=16k, grid (41, 1600, 1408)).

Methodology: the remote-PJRT tunnel adds ~30 ms of dispatch+fetch latency to
every jit call, swamping per-op costs.  So each measurement places K
*distinct* instances of the op inside ONE jit (different voxel-id sets so XLA
cannot CSE them), fetches one scalar, and reports (t_K - t_1) / (K - 1).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      str(Path(__file__).resolve().parent.parent / '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax
import jax.numpy as jnp
import numpy as np

from pcdet_tpu.ops import sparse

B, V, C = 2, 16000, 64
SHAPE = (41, 1600, 1408)
K = 8


def make_level(rng, v=V, c=C, shape=SHAPE, n_active=None):
    n_active = n_active or v
    per = []
    for _ in range(B):
        z = rng.randint(0, min(shape[0], 20), size=(n_active,))
        y = rng.randint(0, shape[1], size=(n_active,))
        x = rng.randint(0, shape[2], size=(n_active,))
        ids = np.unique((z * shape[1] + y) * shape[2] + x)
        n = len(ids)
        buf = np.full((v,), sparse.INT_MAX, np.int64)
        buf[:n] = ids
        mask = np.zeros((v,), bool)
        mask[:n] = True
        cz = buf // (shape[1] * shape[2])
        rem = buf % (shape[1] * shape[2])
        coords = np.stack([cz, rem // shape[2], rem % shape[2]], -1)
        coords = np.where(mask[:, None], coords, -1).astype(np.int32)
        feats = rng.randn(v, c).astype(np.float32) * mask[:, None]
        per.append((feats, buf.astype(np.int32), coords, mask))
    f, i, co, m = (np.stack([lv[j] for lv in per]) for j in range(4))
    return sparse.SparseLevel(jnp.asarray(f), jnp.asarray(i), jnp.asarray(co),
                              jnp.asarray(m), SHAPE)


def flat(levels):
    out = []
    for lv in levels:
        out += [lv.features, lv.ids, lv.coords, lv.mask]
    return out


def unflat(arrays, shape=SHAPE):
    return [sparse.SparseLevel(*arrays[4 * i: 4 * i + 4], shape)
            for i in range(len(arrays) // 4)]


def measure(name, per_level_fn, levels, iters=5, k=K):
    """per_level_fn: SparseLevel -> scalar contribution."""
    def prog(kk):
        def f(*arrays):
            acc = 0.0
            for lv in unflat(arrays[:4 * kk]):
                acc = acc + per_level_fn(lv)
            return acc
        return jax.jit(f)
    f1, fK = prog(1), prog(k)
    a = flat(levels)
    for f, kk in ((f1, 1), (fK, k)):
        np.asarray(jax.device_get(f(*a[:4 * kk])))

    def run(f, kk):
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(jax.device_get(f(*a[:4 * kk])))
        return (time.perf_counter() - t0) / iters
    t1, tK = run(f1, 1), run(fK, k)
    print(f'{name:46s} {(tK - t1) / (k - 1) * 1e3:8.2f} ms', flush=True)


def main():
    print('backend:', jax.default_backend())
    rng = np.random.RandomState(0)
    levels = [make_level(rng) for _ in range(K)]
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.05)

    def rules_b(lv):
        def per(f, i, c_, m):
            l1 = sparse.SparseLevel(f, i, c_, m, SHAPE)
            rows, found = sparse._rules_affine(
                l1, l1.coords, l1.mask, l1.coords, (3, 3, 3), (-1, -1, -1))
            return rows.sum() + found.sum()
        return jax.vmap(per)(lv.features, lv.ids, lv.coords, lv.mask).sum()
    measure('rules_affine only (27-tap)', rules_b, levels)

    def merge_b(lv):
        def per(f, i, c_, m):
            base = sparse.linearize(c_, SHAPE)
            qs = jnp.concatenate([base + k for k in
                                  (-2252800, -1408, 0, 1408, 2252800,
                                   -2254208, -2251392, 2251392, 2254208)])
            return sparse._merge_pos_right(i, qs).sum()
        return jax.vmap(per)(lv.features, lv.ids, lv.coords, lv.mask).sum()
    measure('merge_pos_right only (9 groups)', merge_b, levels)

    def apply_b(lv):
        def per(f, i, c_, m):
            l1 = sparse.SparseLevel(f, i, c_, m, SHAPE)
            rows = (jnp.arange(V, dtype=jnp.int32)[:, None]
                    + jnp.arange(27, dtype=jnp.int32)) % V
            found = m[:, None] & jnp.ones((V, 27), bool)
            return sparse._apply_rules(l1, m, rows, found, w).sum()
        return jax.vmap(per)(lv.features, lv.ids, lv.coords, lv.mask).sum()
    measure('apply_rules only (gather+GEMM)', apply_b, levels)

    measure('subm conv x1', lambda lv: sparse.subm_conv3d_batched(
        lv, w).features.sum(), levels)
    measure('subm conv x2 (same set: rules CSE)', lambda lv:
            sparse.subm_conv3d_batched(
                sparse.subm_conv3d_batched(lv, w), w2).features.sum(), levels)
    measure('strided conv s2', lambda lv: sparse.sparse_conv3d_batched(
        lv, w, stride=2, out_cap=V).features.sum(), levels)
    measure('sparse maxpool', lambda lv: sparse.sparse_maxpool3d_batched(
        lv, out_cap=V).features.sum(), levels)
    measure('to_dense', lambda lv: sparse.to_dense_batched(
        lv._replace(shape=(2, 200, 176),
                    ids=lv.ids % (2 * 200 * 176),
                    coords=lv.coords % jnp.asarray([2, 200, 176]))).sum(),
            levels)

    from pcdet_tpu.models.backbones3d import BackBone8x
    bb = BackBone8x(sparse_shape=SHAPE)
    lv16_0 = levels[0]._replace(features=levels[0].features[..., :16])
    vars_ = bb.init(jax.random.PRNGKey(0), lv16_0, False)
    measure('BackBone8x fwd (B=2)', lambda lv: bb.apply(
        vars_, lv._replace(features=lv.features[..., :16]), False,
        mutable=False)[0].sum(), levels, iters=3, k=3)


if __name__ == '__main__':
    main()
