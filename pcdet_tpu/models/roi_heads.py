"""Part-A² stage-2: proposals, RoI sampling, RoI-aware pooling, RCNN heads.

Parity targets:
  - proposal_layer (pcdet/models/model_utils/proposal_layer.py) — per sample
    topk + rotated NMS; here one jitted fixed-shape pass via ops.nms.
  - proposal_target_layer / sample_rois_for_rcnn
    (model_utils/proposal_target_layer.py) — class-aware IoU3D matching and
    fg/easy-bg/hard-bg sampling, re-expressed with fixed-shape masked top-k
    and jax.random (exactly the sampled distribution, no host round trip).
  - SpConvRCNN / FCRCNN (pcdet/models/rcnn/partA2_rcnn_net.py) — the 14³ RoI
    grids are tiny, so the sparse convs become DENSE 3D convs with occupancy
    masking + masked BN, which is bit-equivalent to spconv's semantics
    (bias-free convs, zero inactive inputs) and maps straight onto the MXU.
"""
import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nms as nms_ops
from ..ops import rotated_iou
from ..ops.roiaware_pool import roiaware_pool3d
from ..utils import jnp_common, loss as loss_ops
from ..utils.box_coder import ResidualCoder

BIG_NEG = -100000.0


# ---------------------------------------------------------------------------
# Proposal layer
# ---------------------------------------------------------------------------

def proposal_layer(batch_cls_preds, batch_box_preds, nms_pre, nms_post,
                   nms_thresh, rotated=True):
    """(B, A, C), (B, A, 7) -> rois (B, nms_post, 7), raw scores, labels.

    `rotated=False` selects the axis-aligned path (RPN_NMS_TYPE:
    nms_normal_gpu in the reference).  Batch-parallel: one batched-NMS call
    for the whole batch (round-2's lax.map serialized the per-sample
    pre=9000 proposal NMS — the dominant term of the Part-A² stage-2
    batch-scaling cliff)."""
    raw_top_scores = jnp.max(batch_cls_preds, axis=-1)         # (B, A)
    top_labels = jnp.argmax(batch_cls_preds, axis=-1) + 1
    boxes5 = jnp_common.boxes3d_to_bev_corner_format(batch_box_preds)
    selected, num = nms_ops.nms_bev_batched(
        boxes5, raw_top_scores, nms_thresh, pre_max=nms_pre,
        post_max=nms_post, rotated=rotated)
    ok = selected >= 0
    sel = jnp.where(ok, selected, 0)
    rois = (jnp.take_along_axis(batch_box_preds, sel[..., None], axis=1)
            * ok[..., None].astype(batch_box_preds.dtype))
    raw = jnp.where(ok, jnp.take_along_axis(raw_top_scores, sel, axis=1),
                    BIG_NEG)
    labels = jnp.where(ok, jnp.take_along_axis(top_labels, sel, axis=1),
                       1).astype(jnp.int32)
    return {'rois': rois, 'roi_raw_scores': raw, 'roi_labels': labels,
            'roi_valid': ok}


def proposal_layer_from_head(cls_preds, box_raw, anchors, dir_raw, box_coder,
                             head_args, nms_pre, nms_post, nms_thresh,
                             rotated=True):
    """Selection-before-decode proposal layer (bit-identical to decoding all
    anchors then calling `proposal_layer`, tests/test_lazy_decode.py).

    The proposal rank score is `max` over raw class logits, so the top
    `nms_pre` candidates are known before any box is decoded; decoding only
    those cuts the anchor decode + BEV-corner work by A/nms_pre (~23x for
    Part-A² training at pre=9000, ~200x at the TEST pre=1024).

    :param cls_preds: (B, A, C) raw logits, :param box_raw: (B, A, code)
    :param anchors: (A, 7), :param dir_raw: (B, A, bins) or None
    """
    num_anchors = anchors.shape[0]
    pre = min(int(nms_pre), num_anchors)
    rank = jnp.max(cls_preds, axis=-1)                        # (B, A)
    _, idx = jax.lax.top_k(rank, pre)                         # (B, pre)
    cls_sub = jnp.take_along_axis(cls_preds, idx[..., None], axis=1)
    box_sub = jnp.take_along_axis(box_raw, idx[..., None], axis=1)
    anc_sub = jnp.take(anchors, idx, axis=0)                  # (B, pre, 7)
    dir_sub = (None if dir_raw is None
               else jnp.take_along_axis(dir_raw, idx[..., None], axis=1))
    box_preds = box_coder.decode_with_head_direction(
        box_preds=box_sub, anchors=anc_sub, dir_cls_preds=dir_sub,
        num_dir_bins=head_args.get('num_direction_bins', 2),
        dir_offset=head_args.get('dir_offset', 0.78539),
        dir_limit_offset=head_args.get('dir_limit_offset', 0.0),
        use_binary_dir_classifier=head_args.get(
            'use_binary_dir_classifier', False))
    return proposal_layer(cls_sub, box_preds, nms_pre=pre,
                          nms_post=nms_post, nms_thresh=nms_thresh,
                          rotated=rotated)


# ---------------------------------------------------------------------------
# Stage-2 target sampling
# ---------------------------------------------------------------------------

def _masked_choice(rng, mask, num, replace=True):
    """Sample `num` indices uniformly from the True entries of `mask`.

    With replace=True matches torch.randint over the masked set; with
    replace=False matches a random permutation prefix.  If mask is empty,
    returns zeros (caller must handle).
    """
    n = mask.shape[0]
    if replace:
        logits = jnp.where(mask, 0.0, -jnp.inf)
        return jax.random.categorical(rng, logits, shape=(num,))
    # permutation of valid indices first: sort by (not mask, random)
    u = jax.random.uniform(rng, (n,))
    key = jnp.where(mask, u, u + 2.0)
    order = jnp.argsort(key)
    return order[:num]


def sample_rois_for_rcnn_single(rng, rois, roi_raw_scores, roi_labels,
                                roi_valid, gt_boxes, sampler_cfg, num_class):
    """One sample's RoI sampling (reference sample_rois_for_rcnn:45-162).

    :param rois: (M, 7), :param gt_boxes: (G, 8) zero padded
    :return: dict of fixed (R,) shapes with R = ROI_PER_IMAGE
    """
    r = int(sampler_cfg.ROI_PER_IMAGE)
    fg_per_image = int(np.round(sampler_cfg.FG_RATIO * r))
    reg_fg = float(sampler_cfg.REG_FG_THRESH)
    cls_fg = float(sampler_cfg.CLS_FG_THRESH)
    cls_bg = float(sampler_cfg.CLS_BG_THRESH)
    cls_bg_lo = float(sampler_cfg.CLS_BG_THRESH_LO)
    hard_ratio = float(sampler_cfg.HARD_BG_RATIO)

    gt_valid = jnp.abs(gt_boxes[:, :7]).sum(axis=1) > 0
    iou = rotated_iou.boxes_iou3d(rois, gt_boxes[:, :7])       # (M, G)
    if num_class > 1:
        same = roi_labels[:, None] == gt_boxes[None, :, 7].astype(jnp.int32)
        iou = jnp.where(same, iou, 0.0)
    iou = jnp.where(gt_valid[None, :] & roi_valid[:, None], iou, 0.0)
    max_overlaps = jnp.max(iou, axis=1)
    gt_assignment = jnp.argmax(iou, axis=1)

    fg_thresh = min(reg_fg, cls_fg)
    fg_mask = (max_overlaps >= fg_thresh) & roi_valid
    easy_bg_mask = (max_overlaps < cls_bg_lo) & roi_valid
    hard_bg_mask = ((max_overlaps < reg_fg) & (max_overlaps >= cls_bg_lo)
                    & roi_valid)
    n_fg = fg_mask.sum()
    n_easy = easy_bg_mask.sum()
    n_hard = hard_bg_mask.sum()
    n_bg = n_easy + n_hard

    k_fg, k_bg, k_hard, k_easy, k_fgr = jax.random.split(rng, 5)

    # fg slots: first fg_count entries of the slot array
    fg_count = jnp.where(n_bg > 0, jnp.minimum(fg_per_image, n_fg), r)
    fg_count = jnp.where(n_fg > 0, fg_count, 0)
    # without replacement when enough bg exist; with replacement if bg == 0
    fg_perm = _masked_choice(k_fg, fg_mask, r, replace=False)
    fg_rand = _masked_choice(k_fgr, fg_mask, r, replace=True)
    fg_pick = jnp.where(n_bg > 0, fg_perm, fg_rand)

    # bg slots: hard/easy split (reference sample_bg_inds:191-218)
    slots = jnp.arange(r)
    bg_rank = slots - fg_count                    # rank within bg slots
    bg_count = r - fg_count
    hard_num = jnp.where((n_hard > 0) & (n_easy > 0),
                         (bg_count.astype(jnp.float32) * hard_ratio)
                         .astype(jnp.int32),
                         jnp.where(n_hard > 0, bg_count, 0))
    hard_pick = _masked_choice(k_hard, hard_bg_mask, r, replace=True)
    easy_pick = _masked_choice(k_easy, easy_bg_mask, r, replace=True)
    bg_pick = jnp.where(bg_rank < hard_num, hard_pick, easy_pick)

    pick = jnp.where(slots < fg_count, fg_pick, bg_pick)

    sampled = {
        'rois': rois[pick],
        'gt_of_rois': gt_boxes[gt_assignment[pick]],
        'roi_iou': max_overlaps[pick],
        'roi_raw_scores': roi_raw_scores[pick],
        'roi_labels': roi_labels[pick],
        'valid': jnp.broadcast_to(n_fg + n_bg > 0, (r,)),
    }
    return sampled


def proposal_target_layer(rng, roi_dict, gt_boxes, sampler_cfg, num_class):
    """Batch sampling + classification targets + canonical transform
    (reference proposal_target_layer:7-42, RCNNHead.assign_targets:25-54)."""
    batch = roi_dict['rois'].shape[0]
    rngs = jax.random.split(rng, batch)
    sampled = jax.vmap(lambda k, r, s, l, v, g: sample_rois_for_rcnn_single(
        k, r, s, l, v, g, sampler_cfg, num_class))(
        rngs, roi_dict['rois'], roi_dict['roi_raw_scores'],
        roi_dict['roi_labels'], roi_dict['roi_valid'], gt_boxes)

    roi_iou = sampled['roi_iou']
    reg_valid_mask = (roi_iou > float(sampler_cfg.REG_FG_THRESH)).astype(
        jnp.int32) * sampled['valid'].astype(jnp.int32)

    if sampler_cfg.CLS_SCORE_TYPE == 'cls':
        cls_label = (roi_iou > float(sampler_cfg.CLS_FG_THRESH)).astype(
            jnp.float32)
        invalid = ((roi_iou > float(sampler_cfg.CLS_BG_THRESH))
                   & (roi_iou < float(sampler_cfg.CLS_FG_THRESH)))
        cls_label = jnp.where(invalid, -1.0, cls_label)
    elif sampler_cfg.CLS_SCORE_TYPE == 'roi_iou':
        fg = roi_iou > float(sampler_cfg.CLS_FG_THRESH)
        bg = roi_iou < float(sampler_cfg.CLS_BG_THRESH)
        interval = (~fg) & (~bg)
        cls_label = fg.astype(jnp.float32)
        cls_label = jnp.where(interval, roi_iou * 2 - 0.5, cls_label)
    else:
        raise NotImplementedError(sampler_cfg.CLS_SCORE_TYPE)
    cls_label = jnp.where(sampled['valid'], cls_label, -1.0)

    # canonical transform of gt_of_rois into each roi's local frame
    rois = sampled['rois']
    gt_of_rois_src = sampled['gt_of_rois']
    roi_center = rois[..., 0:3]
    roi_ry = rois[..., 6] % (2 * np.pi)
    gt = gt_of_rois_src.at[..., 0:3].add(-roi_center)
    gt = gt.at[..., 6].add(-roi_ry)
    xy = gt[..., 0:2]
    ang = -(roi_ry + np.pi / 2)
    cosa, sina = jnp.cos(ang)[..., None], jnp.sin(ang)[..., None]
    xr = xy[..., 0:1] * cosa + xy[..., 1:2] * sina
    yr = -xy[..., 0:1] * sina + xy[..., 1:2] * cosa
    gt = jnp.concatenate([xr, yr, gt[..., 2:]], axis=-1)

    ry_label = gt[..., 6] % (2 * np.pi)
    opposite = (ry_label > np.pi * 0.5) & (ry_label < np.pi * 1.5)
    ry_label = jnp.where(opposite, (ry_label + np.pi) % (2 * np.pi), ry_label)
    ry_label = jnp.where(ry_label > np.pi, ry_label - np.pi * 2, ry_label)
    ry_label = jnp.clip(ry_label, -np.pi / 2, np.pi / 2)
    gt = gt.at[..., 6].set(ry_label)

    return {
        'rois': rois,
        'gt_of_rois': gt,
        'gt_of_rois_src': gt_of_rois_src,
        'gt_iou': roi_iou,
        'rcnn_cls_labels': cls_label,
        'reg_valid_mask': reg_valid_mask,
        'roi_raw_scores': sampled['roi_raw_scores'],
        'roi_labels': sampled['roi_labels'],
        'roi_valid': sampled['valid'],
    }


# ---------------------------------------------------------------------------
# Dense-equivalent RCNN network
# ---------------------------------------------------------------------------

def xavier_normal_init():
    def init(key, shape, dtype=jnp.float32):
        # conv kernel (kd, kh, kw, cin, cout) or (cin, cout)
        if len(shape) == 2:
            fan_in, fan_out = shape
        else:
            rf = int(np.prod(shape[:-2]))
            fan_in, fan_out = shape[-2] * rf, shape[-1] * rf
        std = math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)
    return init


class MaskedConv3dBNReLU(nn.Module):
    """Dense 3D conv emulating a subm sparse conv on a small grid: zero
    inactive inputs (guaranteed upstream), mask outputs to the active set,
    masked BN over active cells.  Bit-equivalent to spconv on these grids.
    ``compute_dtype`` casts activations/kernel for the MXU multiply (f32
    accumulation) — eval-only, threaded via the RCNN compute_dtype_test."""
    features: int
    compute_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, occ, train: bool):
        # x: (N, D, H, W, C); occ: (N, D, H, W) bool
        k = self.param('kernel', xavier_normal_init(),
                       (3, 3, 3, x.shape[-1], self.features))
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            k = k.astype(self.compute_dtype)
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1, 1),
            padding=[(1, 1)] * 3,
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
            preferred_element_type=jnp.float32)
        from .layers import TorchBatchNorm
        y = TorchBatchNorm(self.features)(y, train, mask=occ)
        y = jax.nn.relu(y) * occ[..., None].astype(y.dtype)
        return y


class FCBlock(nn.Module):
    """pt_utils.Conv1d(bn=True) equivalent: FC + BN + ReLU over (N, C)."""
    features: int
    bn: bool = True
    act: bool = True
    weight_std: float = 0.0     # >0: normal init (reg head last layer)
    compute_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.weight_std > 0:
            kinit = nn.initializers.normal(self.weight_std)
        else:
            kinit = xavier_normal_init()
        w = self.param('kernel', kinit, (x.shape[-1], self.features))
        b = self.param('bias', nn.initializers.zeros, (self.features,))
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            w = w.astype(self.compute_dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        if self.bn:
            from .layers import TorchBatchNorm
            y = TorchBatchNorm(self.features)(y, train)
        if self.act:
            y = jax.nn.relu(y)
        return y


class SpConvRCNNModule(nn.Module):
    """SpConvRCNN (reference partA2_rcnn_net.py:145-375) on dense RoI grids."""
    num_point_features: int = 16
    pool_size: int = 14
    shared_fc: Sequence[int] = (256, 512, 512, 512)
    cls_fc: Sequence[int] = (256, 256)
    reg_fc: Sequence[int] = (256, 256)
    dp_ratio: float = 0.3
    code_size: int = 7
    # eval-only bf16 conv/FC stack (f32 accumulation, f32 output
    # heads), mirroring RPNV2/backbone compute_dtype_test
    compute_dtype_test: str = ''

    @nn.compact
    def __call__(self, pooled_part, pooled_rpn, train: bool):
        """:param pooled_part: (N, o, o, o, 4), :param pooled_rpn: (N, o, o, o, C)
        :return: rcnn_cls (N, 1), rcnn_reg (N, code)"""
        occ = jnp.abs(pooled_part).sum(-1) > 0            # active cells
        cd = (jnp.bfloat16 if (not train and self.compute_dtype_test == 'bfloat16')
              else None)
        x_part = MaskedConv3dBNReLU(64, cd, name='conv_part_0')(pooled_part, occ,
                                                            train)
        x_part = MaskedConv3dBNReLU(64, cd, name='conv_part_1')(x_part, occ, train)
        x_rpn = MaskedConv3dBNReLU(64, cd, name='conv_rpn_0')(pooled_rpn, occ,
                                                          train)
        x_rpn = MaskedConv3dBNReLU(64, cd, name='conv_rpn_1')(x_rpn, occ, train)

        merged = jnp.concatenate([x_rpn, x_part], axis=-1)
        x = MaskedConv3dBNReLU(128, cd, name='conv_down_0')(merged, occ, train)
        x = MaskedConv3dBNReLU(128, cd, name='conv_down_1')(x, occ, train)

        # sparse max-pool k2 s2: -inf inactive, pool, recompute occupancy
        neg = jnp.where(occ[..., None], x, -jnp.inf)
        pooled = nn.max_pool(neg, (2, 2, 2), strides=(2, 2, 2))
        occ2 = nn.max_pool(occ[..., None].astype(jnp.float32), (2, 2, 2),
                           strides=(2, 2, 2))[..., 0] > 0
        x = jnp.where(jnp.isfinite(pooled), pooled, 0.0)

        x = MaskedConv3dBNReLU(128, cd, name='conv_down_2')(x, occ2, train)
        x = MaskedConv3dBNReLU(self.shared_fc[0], cd, name='conv_down_3')(
            x, occ2, train)

        n = x.shape[0]
        flat = x.reshape(n, -1)
        h = flat
        for i, ch in enumerate(self.shared_fc[1:]):
            h = FCBlock(ch, compute_dtype=cd, name='shared_fc_%d' % i)(h, train)
            if i != len(self.shared_fc) - 2 and self.dp_ratio > 0:
                h = nn.Dropout(self.dp_ratio, deterministic=not train)(h)

        c = h
        for i, ch in enumerate(self.cls_fc):
            c = FCBlock(ch, compute_dtype=cd, name='cls_fc_%d' % i)(c, train)
            if i == 0 and self.dp_ratio >= 0:
                c = nn.Dropout(self.dp_ratio, deterministic=not train)(c)
        rcnn_cls = FCBlock(1, bn=False, act=False, name='cls_out')(c, train)

        g = h
        for i, ch in enumerate(self.reg_fc):
            g = FCBlock(ch, compute_dtype=cd, name='reg_fc_%d' % i)(g, train)
            if i == 0 and self.dp_ratio >= 0:
                g = nn.Dropout(self.dp_ratio, deterministic=not train)(g)
        rcnn_reg = FCBlock(self.code_size, bn=False, act=False,
                           weight_std=0.001, name='reg_out')(g, train)
        return rcnn_cls, rcnn_reg


class FCRCNNModule(nn.Module):
    """FCRCNN (reference partA2_rcnn_net.py:377-597): conv_part/conv_rpn on
    the 12³ grid, then straight to the FC stack (no conv_down)."""
    num_point_features: int = 16
    pool_size: int = 12
    shared_fc: Sequence[int] = (128, 256, 256, 256)
    cls_fc: Sequence[int] = (256, 256)
    reg_fc: Sequence[int] = (256, 256)
    dp_ratio: float = 0.3
    code_size: int = 7
    # eval-only bf16 conv/FC stack (f32 accumulation, f32 output
    # heads), mirroring RPNV2/backbone compute_dtype_test
    compute_dtype_test: str = ''

    @nn.compact
    def __call__(self, pooled_part, pooled_rpn, train: bool):
        occ = jnp.abs(pooled_part).sum(-1) > 0
        cd = (jnp.bfloat16 if (not train and self.compute_dtype_test == 'bfloat16')
              else None)
        c0 = self.shared_fc[0] // 2
        x_part = MaskedConv3dBNReLU(64, cd, name='conv_part_0')(pooled_part, occ,
                                                            train)
        x_part = MaskedConv3dBNReLU(c0, cd, name='conv_part_1')(x_part, occ, train)
        x_rpn = MaskedConv3dBNReLU(64, cd, name='conv_rpn_0')(pooled_rpn, occ,
                                                          train)
        x_rpn = MaskedConv3dBNReLU(c0, cd, name='conv_rpn_1')(x_rpn, occ, train)
        merged = jnp.concatenate([x_rpn, x_part], axis=-1)

        n = merged.shape[0]
        h = merged.reshape(n, -1)
        for i, ch in enumerate(self.shared_fc[1:]):
            h = FCBlock(ch, compute_dtype=cd, name='shared_fc_%d' % i)(h, train)
            if i != len(self.shared_fc) - 2 and self.dp_ratio > 0:
                h = nn.Dropout(self.dp_ratio, deterministic=not train)(h)
        c = h
        for i, ch in enumerate(self.cls_fc):
            c = FCBlock(ch, compute_dtype=cd, name='cls_fc_%d' % i)(c, train)
            if i == 0 and self.dp_ratio >= 0:
                c = nn.Dropout(self.dp_ratio, deterministic=not train)(c)
        rcnn_cls = FCBlock(1, bn=False, act=False, name='cls_out')(c, train)
        g = h
        for i, ch in enumerate(self.reg_fc):
            g = FCBlock(ch, compute_dtype=cd, name='reg_fc_%d' % i)(g, train)
            if i == 0 and self.dp_ratio >= 0:
                g = nn.Dropout(self.dp_ratio, deterministic=not train)(g)
        rcnn_reg = FCBlock(self.code_size, bn=False, act=False,
                           weight_std=0.001, name='reg_out')(g, train)
        return rcnn_cls, rcnn_reg


# ---------------------------------------------------------------------------
# RCNN losses (reference RCNNHead.get_loss:56-143)
# ---------------------------------------------------------------------------

def rcnn_loss(forward_ret, loss_weights, corner_loss_regularization=True,
              code_size=7):
    coder = ResidualCoder()
    rcnn_cls = forward_ret['rcnn_cls'].reshape(-1)
    cls_labels = forward_ret['rcnn_cls_labels'].reshape(-1)
    reg_valid = forward_ret['reg_valid_mask'].reshape(-1)
    gt_ct = forward_ret['gt_of_rois'][..., :code_size].reshape(-1, code_size)
    gt_src = forward_ret['gt_of_rois_src'][..., :code_size].reshape(
        -1, code_size)
    rcnn_reg = forward_ret['rcnn_reg'].reshape(-1, code_size)
    rois = forward_ret['rois'].reshape(-1, code_size)

    # BCE cls
    p = jax.nn.sigmoid(rcnn_cls)
    eps = 1e-7
    bce = -(cls_labels * jnp.log(jnp.clip(p, eps, 1.0))
            + (1 - cls_labels) * jnp.log(jnp.clip(1 - p, eps, 1.0)))
    cls_valid = (cls_labels >= 0).astype(jnp.float32)
    loss_cls = (bce * cls_valid).sum() / jnp.clip(cls_valid.sum(), min=1.0)
    loss_cls = loss_cls * loss_weights['rcnn_cls_weight']

    # smooth-L1 reg over fg rois, canonical frame.  Padded/bg rois can have
    # zero sizes -> the residual encoder would emit NaN (log 0, /0) which
    # poisons the masked sum (0 * NaN = NaN), so substitute unit boxes on
    # non-fg rows before encoding.
    fg = (reg_valid > 0).astype(jnp.float32)
    fg_sum = fg.sum()
    dummy = jnp.asarray([0, 0, 0, 1, 1, 1, 0], rois.dtype)
    safe = fg[:, None] > 0
    rois_safe = jnp.where(safe, rois, dummy)
    gt_ct_safe = jnp.where(safe, gt_ct, dummy)
    gt_src_safe = jnp.where(safe, gt_src, dummy)
    rois_anchor = rois_safe.at[:, 0:3].set(0).at[:, 6].set(0)
    reg_targets = coder.encode_jnp(gt_ct_safe, rois_anchor)
    reg_l = loss_ops.weighted_smooth_l1(
        rcnn_reg[None], reg_targets[None], sigma=3.0,
        code_weights=loss_weights['code_weights'])[0]
    loss_reg = (reg_l * fg[:, None]).sum() / jnp.clip(fg_sum, min=1.0)
    loss_reg = loss_reg * loss_weights['rcnn_reg_weight']

    tb = {'rcnn_loss_cls': loss_cls, 'rcnn_loss_reg': loss_reg}

    if corner_loss_regularization:
        anchors_local = rois_safe.at[:, 0:3].set(0)
        boxes_local = coder.decode_jnp(rcnn_reg, anchors_local)
        roi_ry = rois_safe[:, 6]
        ang = roi_ry + np.pi / 2
        cosa, sina = jnp.cos(ang), jnp.sin(ang)
        x = boxes_local[:, 0] * cosa + boxes_local[:, 1] * sina
        y = -boxes_local[:, 0] * sina + boxes_local[:, 1] * cosa
        boxes_global = jnp.concatenate(
            [x[:, None] + rois[:, 0:1], y[:, None] + rois[:, 1:2],
             boxes_local[:, 2:3] + rois[:, 2:3], boxes_local[:, 3:]], axis=1)
        corner = loss_ops.corner_loss_lidar(boxes_global[:, :7], gt_src_safe[:, :7])
        loss_corner = (corner * fg).sum() / jnp.clip(fg_sum, min=1.0)
        loss_corner = loss_corner * loss_weights['rcnn_corner_weight']
        loss_reg = loss_reg + loss_corner
        tb['rcnn_loss_corner'] = loss_corner

    total = loss_cls + loss_reg
    tb['rcnn_loss'] = total
    return total, tb


def decode_rcnn_boxes(rcnn_reg, rois, code_size=7):
    """Local-frame reg -> global boxes (reference detector3d.py:130-151)."""
    coder = ResidualCoder()
    b, n = rois.shape[0], rois.shape[1]
    rois_flat = rois.reshape(-1, code_size)
    local_rois = rois_flat.at[:, 0:3].set(0)
    boxes = coder.decode_jnp(rcnn_reg.reshape(-1, code_size), local_rois)
    ang = rois_flat[:, 6] + np.pi / 2
    cosa, sina = jnp.cos(ang), jnp.sin(ang)
    x = boxes[:, 0] * cosa + boxes[:, 1] * sina
    y = -boxes[:, 0] * sina + boxes[:, 1] * cosa
    out = jnp.concatenate([
        x[:, None] + rois_flat[:, 0:1],
        y[:, None] + rois_flat[:, 1:2],
        boxes[:, 2:3] + rois_flat[:, 2:3],
        boxes[:, 3:],
    ], axis=1)
    return out.reshape(b, n, code_size)
