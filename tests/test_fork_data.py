"""Fork capability layer — data half (VERDICT r2 missing #2/#3/#4, #6):

  * TAG_PTS_WITH_RGB -> colored-lidar loading
    (reference kitti_dataset.py:94-142, consumed at :707-708)
  * BEV-seg ground-truth loading (reference get_bev:164-203, :759-761)
  * param freezing as optax routing (reference experiments.py:11-30)
  * pseudolidar_points_from_depth vs Calibration round-trips
"""
import os
import pickle

import numpy as np
import pytest

from tests.test_kitti_dataset import _kitti_cfg, _make_kitti_tree


@pytest.fixture(scope='module')
def kitti_root_bev(tmp_path_factory):
    """Mini-KITTI tree + BEV GT maps + infos."""
    from PIL import Image
    root = str(tmp_path_factory.mktemp('kitti_bev'))
    ids = _make_kitti_tree(root)

    rng = np.random.RandomState(7)
    for cls in ['DRIVABLE', 'VEHICLE']:
        d = os.path.join(root, 'training', 'bev_%s' % cls)
        os.makedirs(d, exist_ok=True)
        for sid in ids:
            # 400x400 source map (crop geometry needs >= (400, 200))
            m = (rng.rand(400, 400) > 0.6).astype(np.uint8) * 255
            Image.fromarray(m, mode='L').save(os.path.join(d, sid + '.png'))

    from pcdet_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    cfg = _kitti_cfg(root)
    create_kitti_infos(cfg, data_path=root, save_path=root, workers=1)
    return root, ids


def test_colored_lidar_loader(kitti_root_bev):
    root, ids = kitti_root_bev
    from pcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
    cfg = _kitti_cfg(root)
    ds = KittiDataset(cfg, training=True)
    pts6 = ds.get_colored_lidar(ids[0])
    pts4 = ds.get_lidar(ids[0])
    assert pts6.shape[1] == 6
    # FOV-filtered subset of the raw cloud
    assert 0 < pts6.shape[0] <= pts4.shape[0]
    # color channels are zeroed, faithful to the reference's `colors *= 0`
    assert (pts6[:, 3:] == 0).all()
    # xyz rows all come from the raw cloud
    raw = {tuple(np.round(p, 4)) for p in pts4[:, :3]}
    assert all(tuple(np.round(p, 4)) in raw for p in pts6[:200, :3])


def test_bev_gt_loader(kitti_root_bev):
    root, ids = kitti_root_bev
    from pcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
    cfg = _kitti_cfg(root)
    ds = KittiDataset(cfg, training=True)
    bev = ds.get_bev(ids[0])
    # (-50, 0) x (-25, 25) m at 0.25 m/px = (200, 200), 2 classes
    assert bev.shape == (2, 200, 200)
    assert bev.max() > 0


def test_getitem_with_rgb_and_bev(kitti_root_bev):
    """Both capability flags on: the example carries 6-channel voxels and a
    (200, 200, 2) binary BEV mask, through the real prepare path."""
    root, ids = kitti_root_bev
    from pcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from pcdet_tpu.models.anchors import AnchorHeadTargets
    cfg = _kitti_cfg(root)
    cfg.TAG_PTS_WITH_RGB = True
    # an RGB config declares 6 point channels (xyz + rgb), like the
    # reference's NUM_POINT_FEATURES contract
    cfg.DATA_CONFIG.NUM_POINT_FEATURES = {'total': 6, 'use': 6}
    cfg.MODE = '3dobjdet_bev'
    cfg.DATA_CONFIG.AUGMENTATION.DB_SAMPLER.ENABLED = False  # db has 4-ch pts
    ds = KittiDataset(cfg, training=True)
    at = AnchorHeadTargets(cfg.MODEL.RPN.RPN_HEAD.TARGET_CONFIG,
                           ds.grid_size, cfg.CLASS_NAMES)
    ds.set_anchor_targets(at)
    ex = ds[0]
    assert ex['voxels'].shape[-1] == 6
    assert ex['bev'].shape == (200, 200, 2)
    assert set(np.unique(ex['bev'])) <= {0.0, 1.0}
    assert ex['bev'].sum() > 0


@pytest.mark.slow
def test_bev_mode_trains_through_loader(kitti_root_bev):
    """MODE='…bev' trains on the mini-KITTI fixture: real BEV GT flows
    loader -> collate -> jitted loss_with_bev, and the BEV head learns."""
    import jax
    from pcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from pcdet_tpu.datasets.dataset import collate_batch
    from pcdet_tpu.models.anchors import AnchorHeadTargets
    from pcdet_tpu.models.build import build_network
    from pcdet_tpu.train.optimization import build_optimizer_and_schedule
    from pcdet_tpu.train.train_state import (create_train_state,
                                             make_train_step)

    root, ids = kitti_root_bev
    cfg = _kitti_cfg(root)
    cfg.MODE = '3dobjdet_bev'
    cfg.DATA_CONFIG.AUGMENTATION.DB_SAMPLER.ENABLED = False
    ds = KittiDataset(cfg, training=True)
    model = build_network(cfg, ds.grid_size)
    ds.set_anchor_targets(model.anchor_targets)

    batch = collate_batch([ds[0]])
    dev_batch = {k: jax.numpy.asarray(v) for k, v in batch.items()
                 if isinstance(v, np.ndarray) and v.dtype.kind in 'biufc'}
    variables = model.init_variables(jax.random.PRNGKey(0), dev_batch)
    tx, _ = build_optimizer_and_schedule(cfg.MODEL.TRAIN.OPTIMIZATION, 1, 1)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, donate=False)
    new_state, tb = step(state, dev_batch)
    assert 'bev_loss' in tb
    assert np.isfinite(float(jax.device_get(tb['bev_loss'])))
    before = jax.tree_util.tree_leaves(
        jax.device_get(state.params['bev_seg_head']))
    after = jax.tree_util.tree_leaves(
        jax.device_get(new_state.params['bev_seg_head']))
    assert any(np.abs(a - b).max() > 0 for a, b in zip(before, after))


# ---------------------------------------------------------------------------
# Param freezing (reference experiments.py:11-30)
# ---------------------------------------------------------------------------

def test_training_before_epoch_semantics():
    from pcdet_tpu.experiments import training_before_epoch
    from pcdet_tpu.utils.edict import EDict
    cfg = EDict({'INJECT_SEMANTICS': True, 'TRAIN_SEMANTIC_NETWORK': False,
                 'MODEL': {'TRAIN': {}}})
    assert training_before_epoch(cfg) == ('seg_model',)
    cfg.TRAIN_SEMANTIC_NETWORK = True
    assert training_before_epoch(cfg) == ()
    cfg.MODEL.TRAIN.FREEZE_PARAM_PREFIXES = ['rpn_head', 'vfe']
    assert training_before_epoch(cfg) == ('rpn_head', 'vfe')


def test_frozen_prefix_params_do_not_move():
    """One optimizer step with frozen_prefixes: frozen subtree bit-identical,
    everything else moves."""
    import jax
    from tests.tiny_config import tiny_pointpillar_cfg
    from tests.test_fork_hooks_wired import _collated_batch
    from pcdet_tpu.train.optimization import build_optimizer_and_schedule
    from pcdet_tpu.train.train_state import (create_train_state,
                                             make_train_step)

    cfg = tiny_pointpillar_cfg()
    model, batch = _collated_batch(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    tx, _ = build_optimizer_and_schedule(
        cfg.MODEL.TRAIN.OPTIMIZATION, 1, 1, frozen_prefixes=('rpn_head',))
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, donate=False)
    new_state, _ = step(state, batch)

    frozen_b = jax.tree_util.tree_leaves(
        jax.device_get(state.params['rpn_head']))
    frozen_a = jax.tree_util.tree_leaves(
        jax.device_get(new_state.params['rpn_head']))
    assert all((a == b).all() for a, b in zip(frozen_a, frozen_b)), \
        'frozen params moved'
    live_b = jax.tree_util.tree_leaves(jax.device_get(
        {k: v for k, v in state.params.items() if k != 'rpn_head'}))
    live_a = jax.tree_util.tree_leaves(jax.device_get(
        {k: v for k, v in new_state.params.items() if k != 'rpn_head'}))
    assert any(np.abs(a - b).max() > 0 for a, b in zip(live_a, live_b)), \
        'live params did not move'


# ---------------------------------------------------------------------------
# pseudolidar depth lift (reference experiments.py:47-123)
# ---------------------------------------------------------------------------

def test_pseudolidar_points_from_depth_roundtrip(tmp_path):
    """Synthesize lidar points, render their exact depth map, lift it back:
    the lifted cloud must land on the original points (Calibration
    round-trip through img_to_rect/rect_to_lidar)."""
    import jax.numpy as jnp
    from tests.test_kitti_dataset import _write_calib
    from pcdet_tpu.utils.calibration import Calibration, CalibrationJnp
    from pcdet_tpu.experiments import pseudolidar_points_from_depth

    calib_file = str(tmp_path / 'calib.txt')
    _write_calib(calib_file)
    calib = Calibration(calib_file)
    cj = CalibrationJnp(calib)

    h, w = 100, 240
    top, bottom = 35, 85          # margins 0.35 / 0.15
    rng = np.random.RandomState(0)
    us = rng.randint(0, w, 50)
    vs = rng.randint(top, bottom, 50)
    depth = rng.uniform(5.0, 40.0, 50).astype(np.float32)

    depth_map = np.zeros((h, w), np.float32)
    depth_map[vs, us] = depth

    pts = np.asarray(pseudolidar_points_from_depth(
        jnp.asarray(depth_map), cj, top_margin_pct=0.35,
        bottom_margin_pct=0.15))
    assert pts.shape == ((bottom - top) * w, 3)

    # ground truth for the sampled pixels via the numpy Calibration
    want_rect = calib.img_to_rect(us.astype(np.float32),
                                  vs.astype(np.float32), depth)
    want_lidar = calib.rect_to_lidar(want_rect)
    got = pts.reshape(bottom - top, w, 3)[vs - top, us]
    np.testing.assert_allclose(got, want_lidar, atol=1e-3)


def test_frozen_prefix_component_boundary():
    """Freezing 'conv1' must not also freeze 'conv1_extra', nor 'backbone'
    freeze 'backbone_3d' (ADVICE r3: prefix match must respect path-component
    boundaries)."""
    import jax
    import jax.numpy as jnp
    import optax
    from pcdet_tpu.train.optimization import _freeze_wrap

    params = {'conv1': {'w': jnp.ones(3)},
              'conv1_extra': {'w': jnp.ones(3)},
              'backbone': {'w': jnp.ones(3)},
              'backbone_3d': {'w': jnp.ones(3)}}
    tx = _freeze_wrap(optax.sgd(1.0), ('conv1', 'backbone'))
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(grads, st, params)
    moved = {k: float(jnp.abs(v['w']).max()) for k, v in upd.items()}
    assert moved['conv1'] == 0 and moved['backbone'] == 0
    assert moved['conv1_extra'] > 0 and moved['backbone_3d'] > 0
