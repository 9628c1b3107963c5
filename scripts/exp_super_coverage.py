"""Superwindow coverability statistics on realistic scan rulebooks (CPU).

For chunks of R consecutive output rows of a kw=3 subm rulebook, measures
the fraction whose non-miss x-window span fits one (SUPER_W, Cin) load —
the superwindow kernel's covered branch (pallas/gather_gemm.py).  Miss
rows select nothing and are excluded from the span.  These numbers sized
PCDET_XWIN_SUPER_R (PERF_NOTES "Superwindow gather"): R=6 covers 82-98%
at conv1-3 eval shapes -> 3.2-5.5x load-issue cut, ~2x lane-bytes.

Usage: python scripts/exp_super_coverage.py   (CPU, ~3 min on this host)
"""
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / 'scripts'))
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from bench_models import build, realistic_cfg
from pcdet_tpu.models.backbones3d import _resolve_caps
from pcdet_tpu.models.vfe import MeanVFE
from pcdet_tpu.ops import sparse

SUPER_W = 8


def stats_for(lv, name):
    rows, found = sparse._rules_subm(lv, (3, 3, 3))
    v = lv.ids.shape[0]
    rules = jnp.where(found, rows, v)
    base, sel = sparse._xwin_selectors(rules, v)
    base = np.asarray(base)
    sel = np.asarray(sel)
    n_act = int(np.asarray(lv.mask).sum())
    base, rowmiss = base[:n_act], (sel == 0x3f)[:n_act]
    g = base.shape[1]
    print(f'-- {name}: V={v} act={n_act}')
    for r in (4, 6, 8):
        n_chunks = n_act // r
        b2 = base[:n_chunks * r].reshape(n_chunks, r, g)
        m2 = rowmiss[:n_chunks * r].reshape(n_chunks, r, g)
        lo = np.where(m2, 2 ** 31, b2).min(axis=1)
        hi = np.where(m2, -1, b2 + 3).max(axis=1)
        ok = ((hi - lo) <= SUPER_W) | m2.all(axis=1)
        cov = ok.mean()
        issue = r / (cov * 1 + (1 - cov) * r)
        lane = (cov * SUPER_W + (1 - cov) * 3 * r) / r
        print(f'  R={r}: coverable {cov:.1%}  issue-reduction x{issue:.2f}'
              f'  lane-bytes x{3 / lane:.2f}')


def main():
    cfg = realistic_cfg('second.yaml')
    model, batch = build(cfg, training=False, batch_size=2)
    mod = model.module
    feats = MeanVFE().apply({}, batch['voxels'], batch['num_points'],
                            batch['coordinates'], batch['voxel_mask'], False)
    level_b = sparse.from_voxelizer(feats, batch['coordinates'],
                                    batch['voxel_mask'], mod.sparse_shape)
    cap = int(level_b.features.shape[1])
    caps = _resolve_caps(cap, mod.level_caps_test or mod.level_caps,
                         mod.level_caps_frac, train=False)

    lv0 = sparse.SparseLevel(level_b.features[0], level_b.ids[0],
                             level_b.coords[0], level_b.mask[0],
                             mod.sparse_shape)
    stats_for(lv0, 'conv1-res')
    l2 = sparse.sparse_conv3d(
        lv0, jnp.zeros((27, lv0.features.shape[-1], 8)), 3, 2, 1,
        out_cap=int(caps[0]))
    stats_for(l2, 'conv2-res')
    l3 = sparse.sparse_conv3d(l2, jnp.zeros((27, 8, 8)), 3, 2, 1,
                              out_cap=int(caps[1]))
    stats_for(l3, 'conv3-res')


if __name__ == '__main__':
    main()
