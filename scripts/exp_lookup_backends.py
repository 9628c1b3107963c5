"""Rulebook lookup backends on the chip: merge-sort vs windowed Pallas rank.

The subm/inverse rulebooks position queries in the sorted id table with ONE
stable bitonic sort of [table, queries] (`_merge_lookup_ext`) — O((V+Q)
log^2) element moves; the r5 bitmap-micro step measured that sort at
21-40 ms/batch PER LEVEL on SECOND B8 (~30-40%% of the whole eval step).
`window_lookup.window_lookup_ext` replaces it with per-tile windowed
compare-counts (queries are table_ids + const per tap group, so ranks are
local).  This measures both at the real SECOND eval shapes.

Timed per backend x level: subm k3 rulebook alone, the full subm conv
(rulebook + gather-GEMM), and the full strided conv.  Methodology as
profile_conv2.py: one jit, warm, enqueue ITERS, fetch one scalar.
"""
import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', str(ROOT / '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax
import jax.numpy as jnp
import numpy as np

from pcdet_tpu.ops import sparse

sys.path.insert(0, str(ROOT / 'scripts'))
from profile_conv2 import make_level, timed  # noqa: E402

LEVELS = [
    ('conv1 (V=25088 C=16)', 25088, 16, (41, 1600, 1408)),
    ('conv2 (V=43520 C=32)', 43520, 32, (21, 800, 704)),
    ('conv3 (V=29184 C=64)', 29184, 64, (11, 400, 352)),
]


def main():
    rng = np.random.RandomState(0)
    rows = []
    for label, v, c, shape in LEVELS:
        lv = make_level(rng, v, c, shape, int(v * 0.77))
        w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.05)
        for backend in ('sort', 'window'):
            sparse.LOOKUP_BACKEND = backend

            # distinct closures per backend: the global is read at trace time
            def rules_only(f, ids, co, m, shape=shape):
                l2 = sparse.SparseLevel(f, ids, co, m, shape)
                r, fd = sparse._rules_subm(l2, (3, 3, 3))
                return (r.sum() + fd.sum()).astype(jnp.float32)

            def full_conv(f, ids, co, m, shape=shape, w=w):
                l2 = sparse.SparseLevel(f, ids, co, m, shape)
                out = sparse.subm_conv3d(l2, w, 3,
                                         compute_dtype=jnp.bfloat16)
                return out.features.sum()

            def strided(f, ids, co, m, shape=shape, w=w, cap=v):
                l2 = sparse.SparseLevel(f, ids, co, m, shape)
                out = sparse.sparse_conv3d(l2, w, 3, 2, 1, out_cap=cap,
                                           compute_dtype=jnp.bfloat16)
                return out.features.sum()

            jr = jax.jit(lambda *a, fn=rules_only: jax.vmap(fn)(*a).sum())
            jc = jax.jit(lambda *a, fn=full_conv: jax.vmap(fn)(*a).sum())
            js = jax.jit(lambda *a, fn=strided: jax.vmap(fn)(*a).sum())
            try:
                t_r = timed(jr, lv.features, lv.ids, lv.coords, lv.mask)
                t_c = timed(jc, lv.features, lv.ids, lv.coords, lv.mask)
                t_s = timed(js, lv.features, lv.ids, lv.coords, lv.mask)
            except Exception as e:
                print('  %s %s FAILED: %s'
                      % (label, backend, str(e).splitlines()[0][:160]))
                continue
            rows.append(('%s %s rulebook' % (label, backend), t_r))
            rows.append(('%s %s full subm conv' % (label, backend), t_c))
            rows.append(('%s %s full strided conv' % (label, backend), t_s))
    sparse.LOOKUP_BACKEND = 'sort'

    print('== rulebook lookup backends, B=8 (ms/batch)')
    for name, ms in rows:
        print('  %-52s %8.2f' % (name, ms))
    p = ROOT / 'PROFILE_EVAL_STAGES.json'
    d = json.loads(p.read_text()) if p.exists() else {}
    d['lookup_backends'] = {n: round(t, 2) for n, t in rows}
    p.write_text(json.dumps(d, indent=1))


if __name__ == '__main__':
    main()
