"""Stage-2 unit tests: proposal layer, RoI sampling, RoI-aware pooling."""
import numpy as np
import pytest

from pcdet_tpu.utils.edict import EDict

SAMPLER_CFG = EDict({
    'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 32, 'FG_RATIO': 0.5,
    'HARD_BG_RATIO': 0.8, 'CLS_SCORE_TYPE': 'roi_iou',
    'CLS_FG_THRESH': 0.75, 'CLS_BG_THRESH': 0.25, 'CLS_BG_THRESH_LO': 0.1,
    'REG_FG_THRESH': 0.55,
})


def test_proposal_layer_shapes_and_ordering():
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.roi_heads import proposal_layer
    rng = np.random.RandomState(0)
    a = 500
    cls = jnp.asarray(rng.randn(2, a, 3).astype(np.float32))
    boxes = jnp.asarray(np.concatenate([
        rng.uniform(0, 70, (2, a, 1)), rng.uniform(-40, 40, (2, a, 1)),
        rng.uniform(-2, 0, (2, a, 1)), rng.uniform(1, 2, (2, a, 1)),
        rng.uniform(3, 4, (2, a, 1)), rng.uniform(1, 2, (2, a, 1)),
        rng.uniform(-3, 3, (2, a, 1))], 2).astype(np.float32))
    out = proposal_layer(cls, boxes, nms_pre=256, nms_post=64, nms_thresh=0.8)
    assert out['rois'].shape == (2, 64, 7)
    assert out['roi_labels'].shape == (2, 64)
    # raw scores of valid rois are sorted descending
    raw = np.asarray(out['roi_raw_scores'])
    valid = np.asarray(out['roi_valid'])
    for b in range(2):
        r = raw[b][valid[b]]
        assert np.all(np.diff(r) <= 1e-6)


def test_roi_sampling_fg_bg_split():
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.roi_heads import proposal_target_layer
    rng = np.random.RandomState(1)
    m, g = 64, 4
    gt = np.zeros((1, 8, 8), np.float32)
    gt_boxes = np.concatenate([
        rng.uniform(10, 60, (g, 1)), rng.uniform(-30, 30, (g, 1)),
        np.full((g, 1), -1.0), np.full((g, 1), 1.8), np.full((g, 1), 4.2),
        np.full((g, 1), 1.6), rng.uniform(-1, 1, (g, 1)),
        np.ones((g, 1))], 1)
    gt[0, :g] = gt_boxes

    # rois: half are near-copies of gts (fg), half far away (easy bg)
    rois = np.zeros((1, m, 7), np.float32)
    for i in range(m // 2):
        rois[0, i] = gt_boxes[i % g, :7] + rng.uniform(-0.05, 0.05, 7)
    rois[0, m // 2:, 0] = rng.uniform(10, 60, m // 2)
    rois[0, m // 2:, 1] = rng.uniform(-30, 30, m // 2)
    rois[0, m // 2:, 2] = 5.0          # floating far above -> IoU 0
    rois[0, m // 2:, 3:6] = 1.0

    roi_dict = {
        'rois': jnp.asarray(rois),
        'roi_raw_scores': jnp.zeros((1, m)),
        'roi_labels': jnp.ones((1, m), jnp.int32),
        'roi_valid': jnp.ones((1, m), bool),
    }
    out = proposal_target_layer(jax.random.PRNGKey(0), roi_dict,
                                jnp.asarray(gt), SAMPLER_CFG, num_class=1)
    assert out['rois'].shape == (1, 32, 7)
    iou = np.asarray(out['gt_iou'][0])
    reg_valid = np.asarray(out['reg_valid_mask'][0])
    # 16 fg slots sampled (fg_ratio 0.5 with plenty of fg available)
    assert (iou[:16] > 0.55).all(), iou[:16]
    assert reg_valid[:16].all()
    # bg slots have low iou
    assert (iou[16:] < 0.55).all()
    # roi_iou-type labels: fg -> 1, easy bg -> 0
    labels = np.asarray(out['rcnn_cls_labels'][0])
    assert (labels[:16] >= 0).all()
    assert (labels[16:] <= 0.5).all()
    # canonical gt: fg rois' gt centers are near origin in local frame
    gt_ct = np.asarray(out['gt_of_rois'][0])
    assert np.abs(gt_ct[:16, :3]).max() < 1.0
    assert np.abs(gt_ct[:16, 6]).max() <= np.pi / 2 + 1e-5


def test_roiaware_pool_avg_and_max():
    import jax.numpy as jnp
    from pcdet_tpu.ops.roiaware_pool import roiaware_pool3d
    rng = np.random.RandomState(2)
    # one axis-aligned roi at origin
    rois = jnp.asarray([[0., 0., 0., 2., 2., 2., 0.]])
    # points at known cells
    pts = np.array([
        [-0.9, -0.9, 0.1],     # cell (0, 0, 0)
        [0.9, 0.9, 1.9],       # cell (13, 13, 13) for out=14
        [0.95, 0.95, 1.95],    # same corner cell
        [5.0, 5.0, 5.0],       # outside
    ], np.float32)
    feats = np.array([[1.0], [2.0], [4.0], [100.0]], np.float32)
    mask = np.ones(4, bool)
    avg = np.asarray(roiaware_pool3d(rois, jnp.asarray(pts), jnp.asarray(feats),
                                     jnp.asarray(mask), out_size=14,
                                     pool_method='avg'))
    mx = np.asarray(roiaware_pool3d(rois, jnp.asarray(pts), jnp.asarray(feats),
                                    jnp.asarray(mask), out_size=14,
                                    pool_method='max'))
    assert avg.shape == (1, 14, 14, 14, 1)
    np.testing.assert_allclose(avg[0, 0, 0, 0, 0], 1.0)
    np.testing.assert_allclose(avg[0, 13, 13, 13, 0], 3.0)   # mean(2, 4)
    np.testing.assert_allclose(mx[0, 13, 13, 13, 0], 4.0)
    # outside point never contributes
    assert avg.max() <= 4.0
    # empty cells are zero
    assert avg[0, 5, 5, 5, 0] == 0.0
