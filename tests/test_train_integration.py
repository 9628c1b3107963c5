"""Integration: train loop + checkpoint/resume + dataloader on synthetic data."""
import glob
import os

import numpy as np
import pytest

from tiny_config import tiny_pointpillar_cfg

# XLA-compile-heavy on a 1-core host; run with -m slow (CI) or full suite
pytestmark = pytest.mark.slow


def test_train_two_epochs_ckpt_resume(tmp_path):
    import jax
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    from pcdet_tpu.datasets.loader import DataLoader
    from pcdet_tpu.models.pointpillar import PointPillar
    from pcdet_tpu.datasets.dataset import collate_batch
    from pcdet_tpu.train.optimization import build_optimizer_and_schedule
    from pcdet_tpu.train.train_state import create_train_state
    from pcdet_tpu.train.train_loop import train_model
    from pcdet_tpu.train.checkpoint import (latest_checkpoint,
                                            restore_train_state,
                                            load_params_partial)

    cfg = tiny_pointpillar_cfg(num_class=1)
    ds = SyntheticDataset(cfg, training=True)
    model = PointPillar(cfg, ds.grid_size)
    ds.set_anchor_targets(model.anchor_targets)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)

    example = collate_batch([ds[0], ds[1]])
    dev = {k: jax.numpy.asarray(v) for k, v in example.items()
           if isinstance(v, np.ndarray) and v.dtype != object}
    variables = model.init_variables(jax.random.PRNGKey(0), dev)
    tx, lr_sched = build_optimizer_and_schedule(
        cfg.MODEL.TRAIN.OPTIMIZATION, len(loader), 2)
    state = create_train_state(variables, tx)

    ckpt_dir = str(tmp_path / 'ckpt')
    state = train_model(model, state, tx, loader, total_epochs=2,
                        ckpt_save_dir=ckpt_dir, ckpt_save_interval=1,
                        max_ckpt_save_num=2, lr_schedule=lr_sched)
    assert int(jax.device_get(state.step)) == 2 * len(loader)

    ckpts = glob.glob(os.path.join(ckpt_dir, 'checkpoint_epoch_*'))
    assert len(ckpts) == 2
    latest = latest_checkpoint(ckpt_dir)
    assert latest.endswith('checkpoint_epoch_2')

    # full resume restores step + params identically
    fresh = create_train_state(variables, tx)
    restored, epoch = restore_train_state(latest, fresh)
    assert epoch == 2
    assert int(jax.device_get(restored.step)) == int(jax.device_get(state.step))
    a = jax.tree_util.tree_leaves(jax.device_get(state.params))
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)

    # shape-tolerant partial load works too
    new_vars, ep, it = load_params_partial(latest, variables)
    leaves_new = jax.tree_util.tree_leaves(new_vars['params'])
    leaves_trained = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert any(np.abs(np.asarray(x) - np.asarray(y)).max() < 1e-6
               for x, y in zip(leaves_new, leaves_trained))


def test_loader_sharding_and_epochs():
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    from pcdet_tpu.datasets.loader import DataLoader
    cfg = tiny_pointpillar_cfg(num_class=1)
    cfg.DATA_CONFIG.SYNTHETIC.NUM_SAMPLES = 8
    ds = SyntheticDataset(cfg, training=True)

    l0 = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0,
                    host_id=0, num_hosts=2)
    l1 = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0,
                    host_id=1, num_hosts=2)
    l0.set_epoch(3)
    l1.set_epoch(3)
    ids0 = [i for b in l0 for i in b['sample_idx'].tolist()]
    ids1 = [i for b in l1 for i in b['sample_idx'].tolist()]
    assert len(ids0) == len(ids1) == 4
    assert set(ids0).isdisjoint(ids1)
    assert set(ids0) | set(ids1) == set(range(8))

    # reshuffles across epochs
    l0.set_epoch(4)
    ids0b = [i for b in l0 for i in b['sample_idx'].tolist()]
    assert sorted(ids0b) != sorted(ids0) or ids0b != ids0


def test_incomplete_ckpt_not_resumed(tmp_path):
    """A killed run leaves `*.orbax-checkpoint-tmp`; resume must skip it."""
    import os
    from pcdet_tpu.train.checkpoint import latest_checkpoint, list_checkpoints
    os.makedirs(tmp_path / 'checkpoint_epoch_2')
    os.makedirs(tmp_path / 'checkpoint_epoch_4.orbax-checkpoint-tmp')
    assert list_checkpoints(str(tmp_path)) == [str(tmp_path / 'checkpoint_epoch_2')]
    assert latest_checkpoint(str(tmp_path)).endswith('checkpoint_epoch_2')
