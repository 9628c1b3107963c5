"""Functional (jnp) loss primitives.

Numerical parity targets: reference pcdet/utils/loss_utils.py.  All functions
are pure and shape-polymorphic; weights carry the masking so everything stays
fixed-shape under jit.
"""
import jax
import jax.numpy as jnp

from . import jnp_common


def sigmoid_cross_entropy_with_logits(logits, labels):
    """Numerically-stable per-element sigmoid CE (loss_utils.py:117-125)."""
    return (jnp.clip(logits, min=0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def sigmoid_focal_loss(logits, targets, weights, gamma=2.0, alpha=0.25):
    """Sigmoid focal CE.

    :param logits:  (..., A, C)
    :param targets: (..., A, C) one-hot
    :param weights: (..., A) or (..., A, C)
    :return: (..., A, C) per-entry loss (reference loss_utils.py:56-114)
    """
    if weights.ndim == targets.ndim - 1:
        weights = weights[..., None]
    ce = sigmoid_cross_entropy_with_logits(logits, targets)
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    modulating = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha) if alpha is not None else 1.0
    return modulating * alpha_w * ce * weights


def weighted_smooth_l1(preds, targets, weights=None, sigma=3.0, code_weights=None):
    """Smooth-L1 with the reference's sigma parametrisation
    (loss_utils.py:128-175): .5*(sigma*x)^2 if |x| < 1/sigma^2 else |x|-.5/sigma^2.

    :param preds/targets: (..., A, code)
    :param weights: (..., A) or None
    :return: (..., A, code) codewise loss
    """
    diff = preds - targets
    if code_weights is not None:
        diff = jnp.asarray(code_weights, dtype=diff.dtype) * diff
    abs_diff = jnp.abs(diff)
    lt = (abs_diff <= 1.0 / (sigma ** 2)).astype(abs_diff.dtype)
    loss = lt * 0.5 * jnp.square(abs_diff * sigma) \
        + (abs_diff - 0.5 / (sigma ** 2)) * (1.0 - lt)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_softmax_ce(logits, one_hot_targets, weights, logit_scale=1.0):
    """Per-row softmax CE vs argmax of one-hot targets (loss_utils.py:178-220)."""
    logits = logits / logit_scale
    labels = jnp.argmax(one_hot_targets, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return ce * weights


def huber_loss(error, delta):
    abs_error = jnp.abs(error)
    quadratic = jnp.clip(abs_error, max=delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic ** 2 + delta * linear


def corner_loss_lidar(pred_bbox3d, gt_bbox3d):
    """Huber loss on corner distance, min over GT heading flip.

    :param pred_bbox3d: (N, 7), :param gt_bbox3d: (N, 7)
    :return: (N,) (reference loss_utils.py:231-249)
    """
    pred_corners = jnp_common.boxes3d_to_corners3d_lidar(pred_bbox3d)
    gt_corners = jnp_common.boxes3d_to_corners3d_lidar(gt_bbox3d)
    gt_flip = gt_bbox3d.at[:, 6].add(jnp.pi)
    gt_corners_flip = jnp_common.boxes3d_to_corners3d_lidar(gt_flip)
    dist = jnp.minimum(jnp.linalg.norm(pred_corners - gt_corners, axis=2),
                       jnp.linalg.norm(pred_corners - gt_corners_flip, axis=2))
    return huber_loss(dist, delta=1.0).mean(axis=1)


def add_sin_difference(boxes1, boxes2, dim=6):
    """Replace heading residuals with sin(a-b) encoding (rpn_head.py:104-111)."""
    rad_pred = jnp.sin(boxes1[..., dim:dim + 1]) * jnp.cos(boxes2[..., dim:dim + 1])
    rad_tg = jnp.cos(boxes1[..., dim:dim + 1]) * jnp.sin(boxes2[..., dim:dim + 1])
    b1 = jnp.concatenate([boxes1[..., :dim], rad_pred, boxes1[..., dim + 1:]], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :dim], rad_tg, boxes2[..., dim + 1:]], axis=-1)
    return b1, b2


def get_direction_target(anchors, reg_targets, dir_offset=0.0, num_bins=2,
                         one_hot=True):
    """Direction-bin targets from heading residuals (rpn_head.py:113-127).

    :param anchors: (B, A, 7), :param reg_targets: (B, A, 7)
    """
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = jnp_common.limit_period(rot_gt - dir_offset, 0, 2 * jnp.pi)
    dir_cls = jnp.floor(offset_rot / (2 * jnp.pi / num_bins)).astype(jnp.int32)
    dir_cls = jnp.clip(dir_cls, 0, num_bins - 1)
    if one_hot:
        return jax.nn.one_hot(dir_cls, num_bins, dtype=anchors.dtype)
    return dir_cls
