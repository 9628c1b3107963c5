"""Fork extension hooks: differentiable voxelization, BEV seg head, metrics."""
import numpy as np
import pytest

from tiny_config import tiny_pointpillar_cfg


def test_differentiable_revoxelization_hook():
    """Gradients must flow from voxel features back to raw point features
    through the on-device voxelizer (the fork's core capability,
    experiments.py:32-282)."""
    import jax
    import jax.numpy as jnp
    from pcdet_tpu import experiments

    cfg = tiny_pointpillar_cfg(num_class=1)
    cfg.USE_PSEUDOLIDAR = True
    cfg.TORCH_VOXEL_GENERATOR = True

    rng = np.random.RandomState(0)
    pts = np.concatenate([
        rng.uniform(1, 30, (1, 512, 1)), rng.uniform(-15, 15, (1, 512, 1)),
        rng.uniform(-2, 0, (1, 512, 1)), rng.rand(1, 512, 1)],
        axis=2).astype(np.float32)
    mask = np.ones((1, 512), bool)

    def voxel_sum(points):
        batch = {'points': points, 'point_mask': jnp.asarray(mask),
                 'is_training': True}
        out = experiments.between_dataloading_and_feedforward(batch, cfg)
        assert out['voxels'].shape[1] == cfg.DATA_CONFIG.TRAIN.MAX_NUMBER_OF_VOXELS
        return (out['voxels'][..., 3] ** 2).sum()

    g = jax.grad(voxel_sum)(jnp.asarray(pts))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # reflectance channel of in-range points must receive gradient
    assert np.abs(g[..., 3]).sum() > 0
    # xyz used only for binning (floor) -> zero gradient there is fine


@pytest.mark.slow
def test_bev_seg_head_in_pointpillar():
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    from pcdet_tpu.datasets.dataset import collate_batch
    from pcdet_tpu.models.pointpillar import PointPillar

    cfg = tiny_pointpillar_cfg(num_class=1)
    cfg.MODE = '3dobjdet+bev'
    ds = SyntheticDataset(cfg, training=True)
    model = PointPillar(cfg, ds.grid_size)
    ds.set_anchor_targets(model.anchor_targets)
    batch_np = collate_batch([ds[0]])
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray) and k != 'sample_idx'}
    # fake BEV GT masks
    batch['bev'] = jnp.asarray(
        (np.random.RandomState(0).rand(1, 200, 200, 2) > 0.9)
        .astype(np.float32))
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    ret, _ = model.forward(variables, batch, train=True)
    assert ret['bev_seg_logits'].shape == (1, 200, 200, 2)
    loss, tb = model.loss_with_bev(ret, batch)
    assert np.isfinite(float(loss))
    assert 'bev_loss' in tb and 'miou' in tb


def test_seg_metrics_evaluator():
    from pcdet_tpu.utils.metrics import Evaluator
    ev = Evaluator(3)
    gt = np.array([[0, 1, 2, 1], [2, 2, 0, 1]])
    pred = np.array([[0, 1, 1, 1], [2, 0, 0, 1]])
    ev.add_batch(gt, pred)
    assert 0 < ev.Pixel_Accuracy() < 1
    ciou = ev.class_iou()
    assert ciou.shape == (3,)
    assert np.isclose(ciou[1], 3 / 4)   # cls1: tp=3, gt=3, pred=4
