"""Per-(tile, tap-group) table-segment span statistics (CPU).

Sizes the SEGMENT gather kernel (round 5): for a tile of TV consecutive
output rows and one (dz, dy) tap group, the set of table rows its x-windows
touch is an interval [min base, max base + 3) (sorted-id monotonicity).  If
that span fits a static S, the tile-group needs ONE dynamic (S, Cin) block
load + one-hot MXU routing instead of 3*TV per-row loads — the direct fix
for the issue-bound SECOND eval profile (ROOFLINE.json: 5.4% MFU, 13.7%
HBM at B8).

Prints, per level and TV in {64, 128, 256}, the span CDF at candidate S
values, plus the same for the STRIDED entry conv book (whose outputs live
on the coarser grid, so spans are wider).

Usage: python scripts/exp_seg_span.py   (CPU, ~3 min)
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


def span_stats(base, sel, n_act, name):
    base = np.asarray(base)[:n_act]
    rowmiss = (np.asarray(sel) == 0x3f)[:n_act]
    g = base.shape[1]
    print(f'-- {name}: act={n_act} groups={g}')
    for tv in (64, 128, 256):
        n_tiles = (n_act + tv - 1) // tv
        pad = n_tiles * tv - n_act
        b2 = np.pad(base, ((0, pad), (0, 0))).reshape(n_tiles, tv, g)
        m2 = np.pad(rowmiss, ((0, pad), (0, 0)),
                    constant_values=True).reshape(n_tiles, tv, g)
        b2 = b2.astype(np.int64)
        lo = np.where(m2, 2 ** 62, b2).min(axis=1)
        hi = np.where(m2, -1, b2 + 3).max(axis=1)
        span = np.where((hi - lo) < 0, 0, hi - lo)    # all-miss -> 0
        qs = np.percentile(span, [50, 90, 99, 100])
        line = (f'  TV={tv}: span p50={qs[0]:.0f} p90={qs[1]:.0f} '
                f'p99={qs[2]:.0f} max={qs[3]:.0f} |')
        for s in (tv + 64, 2 * tv, 3 * tv, 4 * tv):
            cov = (span <= s).mean()
            line += f'  S={s}: {cov:.2%}'
        print(line)


def subm_stats(lv, name):
    rows, found = sparse._rules_subm(lv, (3, 3, 3))
    v = lv.ids.shape[0]
    rules = jnp.where(found, rows, v)
    base, sel = sparse._xwin_selectors(rules, v)
    span_stats(base, sel, int(np.asarray(lv.mask).sum()), name)


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
    subm_stats(lv0, 'conv1-res (subm)')
    l2 = sparse.sparse_conv3d(
        lv0, jnp.zeros((27, lv0.features.shape[-1], 8)), 3, 2, 1,
        out_cap=int(caps[0]))
    subm_stats(l2, 'conv2-res (subm)')
    l3 = sparse.sparse_conv3d(l2, jnp.zeros((27, 8, 8)), 3, 2, 1,
                              out_cap=int(caps[1]))
    subm_stats(l3, 'conv3-res (subm)')
    l4 = sparse.sparse_conv3d(l3, jnp.zeros((27, 8, 8)), 3, 2, 1,
                              out_cap=int(caps[2]))
    subm_stats(l4, 'conv4-res (subm)')

    # strided books: wider spans (outputs on the coarser grid)
    for name, src, cap_i in (('conv2 (strided)', lv0, caps[0]),
                             ('conv3 (strided)', l2, caps[1]),
                             ('conv4 (strided)', l3, caps[2])):
        (out_ids, out_coords, out_mask, out_shape, dropped, rows,
         found) = sparse._strided_out_set(src, (3, 3, 3), (2, 2, 2),
                                          (1, 1, 1), int(cap_i))
        v = src.ids.shape[0]
        rules = jnp.where(found, rows, v)
        base, sel = sparse._xwin_selectors(rules, v)
        span_stats(base, sel, int(np.asarray(out_mask).sum()), name)


if __name__ == '__main__':
    main()
