"""Measure per-level active-voxel occupancy of the sparse backbones on
realistic-density scans, to justify static `level_caps`
(BACKBONE.ARGS.level_caps) — rulebook+gather cost is proportional to the
static cap, and deeper strided levels carry FEWER active voxels than the
input cap, so tight caps are free speed (PERF_NOTES round-1 item 2).

Runs on CPU: JAX_PLATFORMS=cpu python scripts/measure_occupancy.py
"""
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.config import cfg_from_yaml_file
    from pcdet_tpu.datasets.synthetic import make_scene
    from pcdet_tpu.ops import sparse
    from pcdet_tpu.ops.voxelizer import VoxelGenerator

    cfg = cfg_from_yaml_file(str(ROOT / 'tools/cfgs/second.yaml'))
    dc = cfg.DATA_CONFIG
    vg = VoxelGenerator(dc.VOXEL_GENERATOR.VOXEL_SIZE, dc.POINT_CLOUD_RANGE,
                        dc.VOXEL_GENERATOR.MAX_POINTS_PER_VOXEL,
                        dc.TEST.MAX_NUMBER_OF_VOXELS)
    grid = vg.grid_size
    shape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))
    cap = int(dc.TEST.MAX_NUMBER_OF_VOXELS)

    # strided output sets per level, uncapped (out_cap = input count bound)
    def level_counts(ids, coords, mask):
        lv = sparse.SparseLevel(jnp.zeros((cap, 1)), ids, coords, mask, shape)
        counts = [int(mask.sum())]
        specs = [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
                 ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
                 ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
                 ((3, 1, 1), (2, 1, 1), (0, 0, 0))]
        for kernel, stride, padding in specs:
            out = sparse._strided_out_set(lv, kernel, stride, padding, cap)
            ids2, coords2, mask2, shape2 = out[:4]
            counts.append(int(mask2.sum()))
            lv = sparse.SparseLevel(jnp.zeros((cap, 1)), ids2, coords2,
                                    mask2, shape2)
        return counts

    print('scan  pts    in_vox  conv2  conv3  conv4  out')
    all_counts = []
    densities = [
        # (label, ground mode, objects, ground pts, pts/obj, ring_keep)
        # real-KITTI FOV density: ~17-20k points (rings thinned — real
        # scans lose returns to occlusion/absorption; synthetic.make_scene)
        ('kitti-real', 'rings', 24, 0, 400, 0.35),
        ('rings', 'rings', 24, 0, 300, 1.0),      # full raster (denser)
        ('rings-dense', 'rings', 40, 0, 500, 1.0),
        ('uniform', 'uniform', 20, 16000, 300, 1.0),  # worst-case scatter
        ('uniform-max', 'uniform', 40, 45000, 500, 1.0),
    ]
    for label, mode, n_obj, n_ground, ppo, keep in densities:
        for seed in range(4):
            pts, _, _ = make_scene(np.random.RandomState(seed),
                                   ['Car', 'Pedestrian', 'Cyclist'],
                                   num_objects=n_obj, num_ground=n_ground,
                                   pts_per_obj=ppo, x_range=(3, 68),
                                   y_range=(-38, 38), ground_mode=mode,
                                   ring_keep=keep)
            if os.environ.get('OCC_TRAIN_SHAPES'):
                # train mode: points shuffled, voxels truncated to 16000 —
                # a spatially-uniform subsample dilates MORE per voxel
                rs = np.random.RandomState(seed)
                pts = pts[rs.permutation(len(pts))]
                vg.max_voxels = 16000
            vox = vg.generate(pts)
            n = len(vox['coordinates'])
            ids = np.full((cap,), sparse.INT_MAX, np.int64)
            coords = np.full((cap, 3), -1, np.int32)
            mask = np.zeros((cap,), bool)
            # voxelizer coords are (z, y, x) already
            c = vox['coordinates'][:cap]
            lin = (c[:, 0].astype(np.int64) * shape[1] + c[:, 1]) * shape[2] \
                + c[:, 2]
            order = np.argsort(lin)
            ids[:len(c)] = lin[order]
            coords[:len(c)] = c[order]
            mask[:len(c)] = True
            counts = level_counts(jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(coords), jnp.asarray(mask))
            all_counts.append(counts)
            print('%-10s %6d %7d %6d %6d %6d %5d'
                  % (label, len(pts), *counts))
    arr = np.asarray(all_counts)
    print('\nmax over scans:', arr.max(axis=0))
    print('suggested caps (max * 1.3, rounded up to 512):',
          [int(np.ceil(v * 1.3 / 512) * 512) for v in arr.max(axis=0)])


if __name__ == '__main__':
    main()
