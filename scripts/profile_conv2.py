"""Split the SECOND conv2-block eval cost (the single largest backbone item,
166 ms/B8 per PROFILE_EVAL_STAGES.json) into its pieces on the real chip:

  subm rulebook build | subm gather-GEMM (packed / f32) | full subm conv |
  strided conv2_0 (candidate-sort rulebook + gather-GEMM)

Shapes: conv2 level of second.yaml at real-KITTI density — B=8 vmapped,
V_out=43520, C=32, grid (21, 800, 704); strided input V=25088, C=16.

Methodology: warm up, enqueue ITERS executions of one jit, fetch ONE scalar
(block_until_ready is a no-op through the axon tunnel; results are eagerly
shipped, so every timed fn returns a scalar).
"""
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', str(ROOT / '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax
import jax.numpy as jnp
import numpy as np

from pcdet_tpu.ops import sparse

B = 8
SHAPE2 = (21, 800, 704)          # conv2-level grid
V2, C2 = 43520, 32
V1, C1 = 25088, 16               # conv2_0 strided input (conv1 level)
WARMUP, ITERS = 2, 10


def make_level(rng, v, c, shape, n_active):
    """Run-structured active set: x-runs of 3-8 voxels (LiDAR-ish) so the
    x-neighbour found-rate matches real scans (affects nothing timed here
    but keeps the data honest)."""
    per = []
    for _ in range(B):
        n_seeds = n_active // 5
        z = rng.randint(0, shape[0], size=(n_seeds,))
        y = rng.randint(0, shape[1], size=(n_seeds,))
        x = rng.randint(0, shape[2] - 8, size=(n_seeds,))
        run = rng.randint(3, 8, size=(n_seeds,))
        xs = [x + i for i in range(8)]
        keep = [i < run for i in range(8)]
        allx = np.concatenate([np.where(k, xx, -1) for xx, k in zip(xs, keep)])
        allz = np.tile(z, 8)
        ally = np.tile(y, 8)
        m = allx >= 0
        ids = np.unique((allz[m] * shape[1] + ally[m]) * shape[2] + allx[m])
        ids = ids[:v]
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
    f, i, co, mk = (np.stack([lv[j] for lv in per]) for j in range(4))
    return sparse.SparseLevel(jnp.asarray(f), jnp.asarray(i), jnp.asarray(co),
                              jnp.asarray(mk), shape)


def timed(fn, *args):
    out = fn(*args)
    for _ in range(WARMUP - 1):
        out = fn(*args)
    float(np.asarray(jax.device_get(out)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(np.asarray(jax.device_get(out)).ravel()[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.RandomState(0)
    lv2 = make_level(rng, V2, C2, SHAPE2, int(V2 * 0.77))   # ~33.3k active
    lv1 = make_level(rng, V1, C1, (41, 1600, 1408), int(V1 * 0.77))
    w_subm = jnp.asarray(rng.randn(27, C2, C2).astype(np.float32) * 0.05)
    w_str = jnp.asarray(rng.randn(27, C1, C2).astype(np.float32) * 0.05)
    rows = []

    def vm(fn):
        return jax.jit(jax.vmap(fn))

    # 1. subm k3 rulebook alone
    def rules_only(f, ids, c, m):
        lv = sparse.SparseLevel(f, ids, c, m, SHAPE2)
        r, fd = sparse._rules_subm(lv, (3, 3, 3))
        return r.sum() + fd.sum()
    t = timed(lambda *a: vm(rules_only)(*a).sum(),
              lv2.features, lv2.ids, lv2.coords, lv2.mask)
    rows.append(('subm k3 rulebook (V=%d)' % V2, t))

    # precompute rules for apply-only timing
    rules_np = jax.jit(jax.vmap(lambda f, ids, c, m: sparse._rules_subm(
        sparse.SparseLevel(f, ids, c, m, SHAPE2), (3, 3, 3))))(
        lv2.features, lv2.ids, lv2.coords, lv2.mask)
    rr, ff = rules_np

    # 2. subm gather-GEMM only, packed bf16
    def apply_only(f, ids, c, m, r, fd, dtype):
        lv = sparse.SparseLevel(f, ids, c, m, SHAPE2)
        out = sparse._apply_rules(lv, m, r, fd, w_subm,
                                  compute_dtype=dtype, mirror=True)
        return out.sum()
    for dt, tag in ((jnp.bfloat16, 'packed bf16'), (None, 'f32')):
        t = timed(lambda *a, dt=dt: vm(
            lambda f, ids, c, m, r, fd: apply_only(f, ids, c, m, r, fd, dt))(
            *a).sum(), lv2.features, lv2.ids, lv2.coords, lv2.mask, rr, ff)
        rows.append(('subm gather-GEMM %s (V=%d C=%d)' % (tag, V2, C2), t))

    # 3. full subm conv (rulebook + gather)
    def full_subm(f, ids, c, m):
        lv = sparse.SparseLevel(f, ids, c, m, SHAPE2)
        out = sparse.subm_conv3d(lv, w_subm, 3, compute_dtype=jnp.bfloat16)
        return out.features.sum()
    t = timed(lambda *a: vm(full_subm)(*a).sum(),
              lv2.features, lv2.ids, lv2.coords, lv2.mask)
    rows.append(('full subm conv packed', t))

    # 4. strided conv2_0 (V1 -> V2): candidate-sort rulebook + gather
    def full_strided(f, ids, c, m):
        lv = sparse.SparseLevel(f, ids, c, m, (41, 1600, 1408))
        out = sparse.sparse_conv3d(lv, w_str, 3, 2, 1, out_cap=V2,
                                   compute_dtype=jnp.bfloat16)
        return out.features.sum()
    t = timed(lambda *a: vm(full_strided)(*a).sum(),
              lv1.features, lv1.ids, lv1.coords, lv1.mask)
    rows.append(('strided conv2_0 full (V=%d->%d)' % (V1, V2), t))

    # 5. strided rulebook alone
    def strided_rules(f, ids, c, m):
        lv = sparse.SparseLevel(f, ids, c, m, (41, 1600, 1408))
        out = sparse._strided_out_set(lv, (3, 3, 3), (2, 2, 2), (1, 1, 1), V2)
        return out[0].sum() + out[5].sum() + out[6].sum()
    t = timed(lambda *a: vm(strided_rules)(*a).sum(),
              lv1.features, lv1.ids, lv1.coords, lv1.mask)
    rows.append(('strided rulebook alone', t))

    print('== conv2-block microprofile, B=%d (ms/batch)' % B)
    for name, ms in rows:
        print('  %-44s %8.2f' % (name, ms))
    out = {n: round(t, 2) for n, t in rows}
    p = ROOT / 'PROFILE_EVAL_STAGES.json'
    d = json.loads(p.read_text()) if p.exists() else {}
    d['conv2_micro'] = out
    p.write_text(json.dumps(d, indent=1))


if __name__ == '__main__':
    main()
