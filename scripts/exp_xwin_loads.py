"""Validate + time the x-window gather kernel on the TPU.

Every kw=3 rulebook satisfies the x-window property (ids q-1, q, q+1 of a
tap group occupy consecutive sorted-table rows — tests/test_xwin_property),
so the 27 per-row loads per output collapse to 9 dynamic (3, C) block
loads.  This script compares the OLD per-row kernels against the new
x-window kernels on the same real rulebook at conv2 shapes (V=43520,
C=32->32), both f32 and bf16-pair-packed, asserting equality and timing.
"""
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
from pcdet_tpu.ops.pallas import gather_gemm as gg

V, C = 43520, 32
SHAPE = (21, 800, 704)
B = 8
WARMUP, ITERS = 2, 20


def make_level(rng, v=V, c=C, shape=SHAPE, frac=0.77):
    n_seeds = int(v * frac) // 5
    z = rng.randint(0, shape[0], size=(n_seeds,))
    y = rng.randint(0, shape[1], size=(n_seeds,))
    x = rng.randint(0, shape[2] - 8, size=(n_seeds,))
    run = rng.randint(3, 8, size=(n_seeds,))
    allx = np.concatenate([np.where(i < run, x + i, -1) for i in range(8)])
    allz, ally = np.tile(z, 8), np.tile(y, 8)
    m = allx >= 0
    ids = np.unique((allz[m] * shape[1] + ally[m]) * shape[2] + allx[m])[:v]
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
    return sparse.SparseLevel(jnp.asarray(feats), jnp.asarray(
        buf.astype(np.int32)), jnp.asarray(coords), jnp.asarray(mask), shape)


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
    lv = make_level(rng)
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.05)
    rows, found = jax.jit(lambda: sparse._rules_subm(lv, (3, 3, 3)))()
    n_in = lv.features.shape[0]
    rules = jnp.where(found, rows, n_in)
    fp = jnp.concatenate([lv.features,
                          jnp.zeros((1, C), jnp.float32)], axis=0)

    variants = {
        'f32 rows': jax.jit(lambda: gg._gather_matmul_fwd_only(
            fp, rules, w)),
        'f32 xwin': jax.jit(lambda: gg._gm_any(fp, rules, w, False, True)),
        'packed rows': jax.jit(lambda: gg._gm_any(fp, rules, w, True, False)),
        'packed xwin': jax.jit(lambda: gg._gm_any(fp, rules, w, True, True)),
    }
    outs = {}
    for name, fn in variants.items():
        outs[name] = np.asarray(jax.device_get(fn()))
    scale = np.abs(outs['f32 rows']).max()
    print('f32  xwin vs rows max rel err:',
          np.abs(outs['f32 xwin'] - outs['f32 rows']).max() / scale)
    print('pack xwin vs pack rows   err:',
          np.abs(outs['packed xwin'] - outs['packed rows']).max() / scale)
    print('pack rows vs f32 rows    err:',
          np.abs(outs['packed rows'] - outs['f32 rows']).max() / scale)

    # timing: B=8 vmapped like the backbone (one kernel grid per sample)
    rules_b = jnp.broadcast_to(rules[None], (B,) + rules.shape)
    fp_b = jnp.broadcast_to(fp[None], (B,) + fp.shape)
    for name, one in [
            ('f32 rows', lambda f, r: gg._gather_matmul_fwd_only(f, r, w)),
            ('f32 xwin', lambda f, r: gg._gm_any(f, r, w, False, True)),
            ('packed rows', lambda f, r: gg._gm_any(f, r, w, True, False)),
            ('packed xwin', lambda f, r: gg._gm_any(f, r, w, True, True))]:
        fn = jax.jit(lambda f, r, one=one: jax.vmap(one)(f, r).sum())
        t = timed(fn, fp_b, rules_b)
        print('B%d %-12s %8.2f ms/batch' % (B, name, t))


if __name__ == '__main__':
    main()
