"""Research-extension hooks (the BEVSEG fork's capability layer).

Parity target: reference pcdet/experiments.py — exposed extension points,
rebuilt TPU-native without the fork's research debris (SURVEY.md §8):

  * `between_dataloading_and_feedforward` — the differentiable
    re-voxelization hook: when cfg.TORCH_VOXEL_GENERATOR (set by
    USE_PSEUDOLIDAR or INJECT_SEMANTICS), points are (re)voxelized ON DEVICE
    inside the jitted step via ops.voxelizer.voxelize_jnp, so gradients flow
    from detection loss back through point features into upstream image
    networks (reference experiments.py:32-282).  Semantic painting /
    pseudolidar lifting plug in as `point_feature_fn`.
  * `pseudolidar_points_from_depth` — lift a predicted depth map into a
    point cloud through the differentiable CalibrationJnp (reference
    experiments.py:47-123).
  * `BEVSegHead` + `bev_seg_loss` — the optional BEV segmentation head
    bolted onto a detector's BEV features (reference experiments.py:292-394),
    without the fork's 1e-7 detection-loss contamination.
  * `training_before_epoch` / `testing_after_all_iter` — epoch-level hooks
    (reference experiments.py:11-30, 397-411).

The external HRNet segmentation/depth networks stay out of scope (external
dependency); any flax image network returning per-pixel features can be
injected through the interfaces here.
"""
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .ops.voxelizer import voxelize_jnp
from .utils.metrics import Evaluator


def between_dataloading_and_feedforward(batch, cfg, point_feature_fn=None,
                                        train=None):
    """Differentiable on-device (re-)voxelization hook.

    Called inside the jitted train/eval steps (train/train_state.py) exactly
    where the reference calls it on the host (reference
    tools/train_utils/train_utils.py:23,46, tools/eval_utils/eval_utils.py:51).

    :param batch: device batch with 'points' (B, P, C) + 'point_mask' (B, P)
    :param point_feature_fn: optional fn(points (B, P, C)) -> (B, P, C') that
        paints/augments point features differentiably (semantic injection)
    :param train: TRAIN vs TEST voxel caps; None falls back to the batch's
        'is_training' entry (legacy call sites), then True.
    :return: batch updated with fixed-shape voxel arrays (same keys the host
        voxelizer produces), fully differentiable w.r.t. point features.
    """
    if not cfg.get('TORCH_VOXEL_GENERATOR', False):
        return batch
    points = batch['points']
    point_mask = batch['point_mask']
    if point_feature_fn is not None:
        points = point_feature_fn(points)

    data_cfg = cfg.DATA_CONFIG
    if train is None:
        train = batch.get('is_training', True)
    mode = 'TRAIN' if train else 'TEST'
    vox = jax.vmap(lambda p, m: voxelize_jnp(
        p, m,
        tuple(data_cfg.VOXEL_GENERATOR.VOXEL_SIZE),
        tuple(data_cfg.POINT_CLOUD_RANGE),
        int(data_cfg.VOXEL_GENERATOR.MAX_POINTS_PER_VOXEL),
        int(data_cfg[mode].MAX_NUMBER_OF_VOXELS)))(points, point_mask)
    out = dict(batch)
    out.update({
        'voxels': vox['voxels'],
        'num_points': vox['num_points_per_voxel'],
        'coordinates': vox['coordinates'],
        'voxel_mask': vox['voxel_mask'],
        'voxel_pt_indices_into_original_pt_cloud':
            vox['voxel_pt_indices_into_original_pt_cloud'],
    })
    return out


def pseudolidar_points_from_depth(depth_map, calib_jnp, top_margin_pct=0.35,
                                  bottom_margin_pct=0.15, stride=1):
    """Lift a depth map (H, W) to lidar-frame points (N, 3), differentiably.

    (reference experiments.py:47-123 — crop sky/road margins, img_to_rect,
    rect_to_lidar.)
    """
    h, w = depth_map.shape
    top = int(h * top_margin_pct)
    bottom = int(h - h * bottom_margin_pct)
    vs = jnp.arange(top, bottom, stride)
    us = jnp.arange(0, w, stride)
    uu, vv = jnp.meshgrid(us, vs)
    depth = depth_map[vv, uu]
    pts_rect = calib_jnp.img_to_rect(uu.reshape(-1).astype(jnp.float32),
                                     vv.reshape(-1).astype(jnp.float32),
                                     depth.reshape(-1))
    return calib_jnp.rect_to_lidar(pts_rect)


class BEVSegHead(nn.Module):
    """Small conv head over detector BEV features -> per-class BEV masks.

    Stand-in for the fork's smp-Unet `bev_conv` (pointpillar.py:64-66);
    output (B, out_size, out_size, num_classes) logits.
    """
    num_classes: int = 2
    hidden: int = 64
    out_size: int = 200

    @nn.compact
    def __call__(self, bev_features, train: bool):
        x = nn.Conv(self.hidden, (3, 3), padding='SAME')(bev_features)
        x = nn.relu(x)
        x = nn.Conv(self.hidden, (3, 3), padding='SAME')(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1, 1))(x)
        x = jax.image.resize(x, (x.shape[0], self.out_size, self.out_size,
                                 self.num_classes), method='bilinear')
        return x


def bev_seg_loss(logits, gt_masks):
    """BCE-with-logits BEV segmentation loss + per-class IoU telemetry.

    :param logits: (B, H, W, C), :param gt_masks: (B, H, W, C) in {0, 1}
    (reference exp.after_stage1_rpn_net:292-394 minus wandb side effects)
    """
    gt = gt_masks.astype(logits.dtype)
    ce = (jnp.clip(logits, min=0) - logits * gt
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    loss = ce.mean()
    preds = logits > 0
    inter = jnp.sum(preds & (gt > 0.5), axis=(0, 1, 2))
    union = jnp.sum(preds | (gt > 0.5), axis=(0, 1, 2))
    iou = inter / jnp.clip(union, min=1)
    tb = {'bev_loss': loss}
    for c in range(logits.shape[-1]):
        tb['iou_cls%d' % (c + 1)] = iou[c]
    tb['miou'] = iou.mean()
    return loss, tb


class BEVSegEvalAccumulator:
    """Test-time accumulation across iterations
    (reference testing_evaluator + testing_after_all_iter:397-411)."""

    def __init__(self, num_classes=2):
        self.num_classes = num_classes
        self.evaluator = Evaluator(1 + num_classes)

    def add_batch(self, logits, gt_masks):
        preds = (np.asarray(logits) > 0).astype(np.int32)
        gt = np.asarray(gt_masks).astype(np.int32)
        for c in range(self.num_classes):
            gt_c = gt[..., c] * (c + 1)
            pr_c = preds[..., c] * (c + 1)
            self.evaluator.add_batch(gt_c, pr_c)

    def results(self):
        ciou = self.evaluator.class_iou()
        tb = {'test_iou_cls%d' % (c + 1): ciou[c + 1]
              for c in range(self.num_classes)}
        tb['test_miou'] = np.nanmean(ciou[1:])
        return tb


def training_before_epoch(cfg, extra_prefixes=()):
    """Param-freezing hook (reference experiments.py:11-30: before each
    epoch, `seg_model.eval()` + `requires_grad = False` when an injected
    semantic network is not being trained).

    In the functional JAX runtime, freezing == routing those params through
    `optax.set_to_zero` (see optimization.build_optimizer_and_schedule's
    `frozen_prefixes`): returns the top-level param-path prefixes to freeze.
    `MODEL.TRAIN.FREEZE_PARAM_PREFIXES` generalises the mechanism to any
    submodule.
    """
    prefixes = list(extra_prefixes)
    if cfg.get('INJECT_SEMANTICS', False) and not cfg.get(
            'TRAIN_SEMANTIC_NETWORK', False):
        prefixes.append('seg_model')
    train_cfg = cfg.get('MODEL', {}).get('TRAIN', {})
    prefixes += [str(p) for p in train_cfg.get('FREEZE_PARAM_PREFIXES', [])]
    return tuple(dict.fromkeys(prefixes))
