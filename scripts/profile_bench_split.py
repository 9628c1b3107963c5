"""Split the flagship bench.py step into voxelize / model / predict pieces.

Round-4 lead (PERF_NOTES): bench.py B2 measures ~70.5 fps while the
model-only eval path (scripts/bench_models.py pointpillar_eval) measures
117.3 fps — the regression vs round-2's 80.67 lives in the non-model half.
This times, on the same scans and under the same enqueue-ITERS-sync-once
discipline as bench.py:

  voxelize : jit(vmap(voxelize_jnp))                      (bench stage 1)
  model    : jit(apply + predict) on PRE-voxelized inputs (bench stage 2+3)
  full     : jit(voxelize -> apply -> predict)            (bench.py itself)
  dispatch : jit(identity-ish trivial fn)                 (per-iter RPC floor)

Run on the chip; prints one JSON line per stage.
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

BATCH = int(os.environ.get('BENCH_BATCH', '2'))
MAX_POINTS = int(os.environ.get('BENCH_MAX_POINTS', '65536'))
WARMUP = 3
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from pcdet_tpu.config import cfg_from_yaml_file
    from pcdet_tpu.datasets.synthetic import make_scene
    from pcdet_tpu.models.pointpillar import PointPillar
    from pcdet_tpu.ops.voxelizer import VoxelGenerator, voxelize_jnp

    root = Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(str(root / 'tools/cfgs/pointpillar.yaml'))
    data_cfg = cfg.DATA_CONFIG
    vg = VoxelGenerator(data_cfg.VOXEL_GENERATOR.VOXEL_SIZE,
                        data_cfg.POINT_CLOUD_RANGE,
                        data_cfg.VOXEL_GENERATOR.MAX_POINTS_PER_VOXEL,
                        data_cfg.TEST.MAX_NUMBER_OF_VOXELS)
    model = PointPillar(cfg, vg.grid_size)
    max_voxels = int(data_cfg.TEST.MAX_NUMBER_OF_VOXELS)
    max_ppv = int(data_cfg.VOXEL_GENERATOR.MAX_POINTS_PER_VOXEL)

    scans, masks = [], []
    for i in range(BATCH):
        pts, _, _ = make_scene(np.random.RandomState(i), list(cfg.CLASS_NAMES),
                               num_objects=24, ground_mode='rings',
                               pts_per_obj=400, x_range=(3, 68),
                               y_range=(-38, 38))
        n = min(len(pts), MAX_POINTS)
        buf = np.zeros((MAX_POINTS, 4), np.float32)
        buf[:n] = pts[:n]
        m = np.zeros(MAX_POINTS, bool)
        m[:n] = True
        scans.append(buf)
        masks.append(m)
    scans = jnp.asarray(np.stack(scans))
    masks = jnp.asarray(np.stack(masks))

    def vox_fn(points, point_mask):
        return jax.vmap(lambda p, m: voxelize_jnp(
            p, m, tuple(data_cfg.VOXEL_GENERATOR.VOXEL_SIZE),
            tuple(data_cfg.POINT_CLOUD_RANGE), max_ppv, max_voxels)
        )(points, point_mask)

    def model_fn(variables, vox):
        ret = model.module.apply(variables, vox['voxels'],
                                 vox['num_points_per_voxel'],
                                 vox['coordinates'], vox['voxel_mask'], False)
        return model.predict(ret)

    def full_fn(variables, points, point_mask):
        return model_fn(variables, vox_fn(points, point_mask))

    def triv_fn(x):
        return x + 1.0

    batch0 = {
        'voxels': jnp.zeros((BATCH, max_voxels, max_ppv, 4)),
        'num_points': jnp.zeros((BATCH, max_voxels), jnp.int32),
        'coordinates': jnp.zeros((BATCH, max_voxels, 3), jnp.int32),
        'voxel_mask': jnp.zeros((BATCH, max_voxels), bool),
    }
    variables = model.init_variables(jax.random.PRNGKey(0), batch0)

    vox_jit = jax.jit(vox_fn)
    model_jit = jax.jit(model_fn)
    full_jit = jax.jit(full_fn)
    triv_jit = jax.jit(triv_fn)

    vox_out = vox_jit(scans, masks)
    # keep only what the model consumes, as device arrays
    vox_out = {k: vox_out[k] for k in
               ('voxels', 'num_points_per_voxel', 'coordinates', 'voxel_mask')}
    tiny = jnp.zeros((8,), jnp.float32)

    def run(name, fn, args, sync):
        for _ in range(WARMUP):
            sync(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(*args)
        sync(out)
        dt = time.perf_counter() - t0
        ms = dt / ITERS * 1e3
        print(json.dumps({'stage': name, 'ms_per_batch': round(ms, 2),
                          'batch': BATCH,
                          'fps': round(BATCH * ITERS / dt, 2)}))
        return ms

    sync_pred = lambda p: float(np.asarray(p['num']).sum())
    sync_vox = lambda v: float(np.asarray(v['num_points_per_voxel'][0, 0]))
    sync_triv = lambda x: float(np.asarray(x[0]))

    t_triv = run('dispatch_floor', triv_jit, (tiny,), sync_triv)
    t_vox = run('voxelize', vox_jit, (scans, masks), sync_vox)
    t_model = run('model_predict', model_jit, (variables, vox_out), sync_pred)
    t_full = run('full', full_jit, (variables, scans, masks), sync_pred)
    print(json.dumps({'stage': 'sum_vs_full',
                      'vox_plus_model_ms': round(t_vox + t_model, 2),
                      'full_ms': round(t_full, 2),
                      'dispatch_floor_ms': round(t_triv, 2)}))


if __name__ == '__main__':
    main()
