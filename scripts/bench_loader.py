"""Host data-pipeline throughput: measured samples/s of the FULL
prepare_data path (augmentation + voxelize + anchor assignment) under the
thread-pool loader at several worker counts (round-1 verdict weak #4: the
'>100 samples/s' claim was an extrapolation, never measured concurrently).

Usage: python scripts/bench_loader.py [--cfg tools/cfgs/pointpillar.yaml]
"""
import argparse
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='tools/cfgs/pointpillar.yaml')
    ap.add_argument('--batch_size', type=int, default=8)
    ap.add_argument('--samples', type=int, default=64)
    args = ap.parse_args()

    from pcdet_tpu.config import cfg_from_yaml_file, cfg_preprocess
    from pcdet_tpu.datasets.loader import DataLoader
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    from pcdet_tpu.models.build import build_network

    cfg = cfg_from_yaml_file(str(ROOT / args.cfg))
    cfg.DATA_CONFIG.DATASET = 'SyntheticDataset'
    cfg.DATA_CONFIG.SYNTHETIC = {
        'NUM_SAMPLES': args.samples, 'NUM_OBJECTS': 24,
        'GROUND_MODE': 'rings', 'PTS_PER_OBJ': 400,
    }
    cfg_preprocess(cfg)
    ds = SyntheticDataset(cfg, training=True)
    model = build_network(cfg, ds.grid_size)
    if hasattr(model, 'anchor_targets'):
        ds.set_anchor_targets(model.anchor_targets)

    n_pts = len(ds.get_raw(0)['points'])
    print('scan points: %d' % n_pts)
    _ = ds[0]  # warm caches (anchor near-bbox cache, native libs)

    for mode in ['thread', 'process']:
        for workers in [0, 1, 2, 4, 8]:
            if workers == 0 and mode == 'process':
                continue
            loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                                num_workers=workers, seed=0, prefetch=8,
                                worker_mode=mode)
            t0 = time.perf_counter()
            n = 0
            for batch in loader:
                n += len(batch['voxel_mask'])
            dt = time.perf_counter() - t0
            print('%s workers=%d: %.1f samples/s (%d samples in %.2fs)'
                  % (mode, workers, n / dt, n, dt), flush=True)


if __name__ == '__main__':
    main()
