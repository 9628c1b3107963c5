"""RPNV2 dense BEV head (flax) + anchor-head losses (functional jnp).

Parity target: reference pcdet/models/bbox_heads/rpn_head.py.
The conv-deconv FPN runs NHWC; heads emit (B, H, W, A*code) which flattens to
the (H, W, A) anchor ordering used by `models.anchors`.
Target assignment lives in the host data pipeline (models/anchors.py), so the
forward pass takes precomputed `box_cls_labels` / `box_reg_targets`.
"""
import math
from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import loss as loss_ops
from .layers import ConvBNReLU, DeconvBNReLU, TorchConv, torch_uniform_init


def focal_bias_init(prior=0.01):
    value = -math.log((1 - prior) / prior)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)
    return init


class RPNV2(nn.Module):
    """Conv-deconv FPN over the BEV canvas + 1x1 heads.

    args mirror the yaml ARGS dict (rpn_head.py:213-285).
    """
    num_class: int
    num_anchors_per_location: int
    box_code_size: int = 7
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (64, 128, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    num_upsample_filters: Sequence[int] = (128, 128, 128)
    use_norm: bool = True
    concat_input: bool = False
    encode_background_as_zeros: bool = True
    use_direction_classifier: bool = True
    num_direction_bins: int = 2
    # eval-only mixed precision for the dense conv stack (mirrors the
    # sparse backbone's compute_dtype_test): bf16 MXU multiplies with f32
    # accumulation; training and torch-parity stay exact f32.
    compute_dtype_test: str = ''

    @nn.compact
    def __call__(self, x_in, train: bool) -> Dict[str, Any]:
        cd = (jnp.bfloat16 if (not train
                               and self.compute_dtype_test == 'bfloat16')
              else None)
        ups = []
        x = x_in
        ret = {}
        for i, layer_num in enumerate(self.layer_nums):
            # ZeroPad2d(1) + stride conv == padding=1 conv here
            x = ConvBNReLU(self.num_filters[i], 3, self.layer_strides[i],
                           padding=1, use_norm=self.use_norm,
                           compute_dtype=cd)(x, train)
            for _ in range(layer_num):
                x = ConvBNReLU(self.num_filters[i], 3, 1, padding=1,
                               use_norm=self.use_norm,
                               compute_dtype=cd)(x, train)
            stride = x_in.shape[1] // x.shape[1]
            ret['spatial_features_%dx' % stride] = x
            up = self.upsample_strides[i]
            if up > 1:
                u = DeconvBNReLU(self.num_upsample_filters[i], up,
                                 use_norm=self.use_norm,
                                 compute_dtype=cd)(x, train)
            else:
                # stride-1 "deconv" == 1x1 conv path in the reference
                u = DeconvBNReLU(self.num_upsample_filters[i], 1,
                                 use_norm=self.use_norm,
                                 compute_dtype=cd)(x, train)
            ups.append(u)

        if self.concat_input:
            ups.append(x_in)
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        ret['spatial_features_last'] = x

        if self.encode_background_as_zeros:
            num_cls = self.num_anchors_per_location * self.num_class
        else:
            num_cls = self.num_anchors_per_location * (self.num_class + 1)

        box_preds = TorchConv(self.num_anchors_per_location * self.box_code_size,
                              1, name='conv_box')(x)
        cls_preds = TorchConv(num_cls, 1, name='conv_cls',
                              bias_init=focal_bias_init(0.01))(x)
        ret['box_preds'] = box_preds          # (B, H, W, A*code)
        ret['cls_preds'] = cls_preds          # (B, H, W, A*ncls)
        if self.use_direction_classifier:
            ret['dir_cls_preds'] = TorchConv(
                self.num_anchors_per_location * self.num_direction_bins, 1,
                name='conv_dir_cls')(x)
        return ret


def anchor_head_loss(ret_dict, anchors, box_cls_labels, box_reg_targets,
                     num_class, loss_weights, num_anchors_per_location,
                     box_code_size=7, encode_background_as_zeros=True,
                     use_direction_classifier=True, dir_offset=0.78539,
                     num_direction_bins=2):
    """RPN losses: focal cls + smooth-L1(sin) loc + direction CE.

    :param ret_dict: head outputs (NHWC preds)
    :param anchors: (A, 7) jnp
    :param box_cls_labels: (B, A) int32 (-1 dontcare / 0 bg / 1..C fg)
    :param box_reg_targets: (B, A, code)
    Parity: reference rpn_head.AnchorHead.get_loss:129-210.
    """
    box_preds = ret_dict['box_preds']
    cls_preds = ret_dict['cls_preds']
    dir_preds = ret_dict.get('dir_cls_preds', None)
    batch_size = box_preds.shape[0]

    cared = box_cls_labels >= 0
    positives = box_cls_labels > 0
    negatives = box_cls_labels == 0
    cls_weights = (negatives.astype(jnp.float32)
                   + positives.astype(jnp.float32))
    reg_weights = positives.astype(jnp.float32)
    pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True).astype(jnp.float32),
                        min=1.0)
    reg_weights = reg_weights / pos_norm
    cls_weights = cls_weights / pos_norm

    cls_targets = box_cls_labels * cared.astype(box_cls_labels.dtype)
    one_hot = jax.nn.one_hot(cls_targets, num_class + 1, dtype=box_preds.dtype)
    if encode_background_as_zeros:
        cls_preds = cls_preds.reshape(batch_size, -1, num_class)
        one_hot = one_hot[..., 1:]
    else:
        cls_preds = cls_preds.reshape(batch_size, -1, num_class + 1)

    cls_loss = loss_ops.sigmoid_focal_loss(cls_preds, one_hot, cls_weights,
                                           gamma=2.0, alpha=0.25)
    cls_loss_reduced = cls_loss.sum() / batch_size * loss_weights['rpn_cls_weight']

    box_preds = box_preds.reshape(batch_size, -1, box_code_size)
    box_preds_sin, reg_targets_sin = loss_ops.add_sin_difference(
        box_preds, box_reg_targets)
    loc_loss = loss_ops.weighted_smooth_l1(
        box_preds_sin, reg_targets_sin, weights=reg_weights, sigma=3.0,
        code_weights=loss_weights['code_weights'])
    loc_loss_reduced = loc_loss.sum() / batch_size * loss_weights['rpn_loc_weight']

    rpn_loss = loc_loss_reduced + cls_loss_reduced
    tb = {'rpn_loss_loc': loc_loss_reduced, 'rpn_loss_cls': cls_loss_reduced}

    if use_direction_classifier and dir_preds is not None:
        batch_anchors = jnp.broadcast_to(anchors[None], (batch_size,) + anchors.shape)
        dir_targets = loss_ops.get_direction_target(
            batch_anchors, box_reg_targets, dir_offset=dir_offset,
            num_bins=num_direction_bins)
        dir_logits = dir_preds.reshape(batch_size, -1, num_direction_bins)
        weights = positives.astype(dir_logits.dtype)
        weights = weights / jnp.clip(weights.sum(-1, keepdims=True), min=1.0)
        dir_loss = loss_ops.weighted_softmax_ce(dir_logits, dir_targets, weights)
        dir_loss = dir_loss.sum() / batch_size * loss_weights['rpn_dir_weight']
        rpn_loss = rpn_loss + dir_loss
        tb['rpn_loss_dir'] = dir_loss

    tb['rpn_loss'] = rpn_loss
    return rpn_loss, tb
