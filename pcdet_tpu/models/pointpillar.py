"""PointPillar detector (1-stage): PillarVFE -> BEV scatter -> RPNV2.

Parity target: reference pcdet/models/detectors/pointpillar.py (the *stock*
forward path, pointpillar.py:116-141 — not the fork's BEV-seg contaminated one
which scales detection loss by 1e-7; see SURVEY.md §8).
"""
from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .anchors import AnchorHeadTargets
from .detector3d import merge_overflow_tb, post_process_from_head
from .pillar_scatter import pillar_scatter
from .rpn_head import RPNV2, anchor_head_loss
from .vfe import PillarFeatureNet
from ..utils.box_coder import ResidualCoder


class PointPillarNet(nn.Module):
    """Flax module: the full differentiable forward pass."""
    num_class: int
    num_anchors_per_location: int
    grid_ny: int
    grid_nx: int
    vfe_num_filters: Sequence[int]
    vfe_with_distance: bool
    voxel_size: Sequence[float]
    pc_range: Sequence[float]
    rpn_args: Dict[str, Any]
    use_norm: bool = True
    with_bev_seg: bool = False        # fork capability: BEV segmentation head
    bev_num_classes: int = 2
    bev_out_size: int = 200

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_mask, train: bool):
        features = PillarFeatureNet(
            num_filters=tuple(self.vfe_num_filters),
            use_norm=self.use_norm,
            with_distance=self.vfe_with_distance,
            voxel_size=tuple(self.voxel_size),
            pc_range=tuple(self.pc_range),
            name='vfe')(voxels, num_points, coords, voxel_mask, train)
        a = self.rpn_args
        # eval-only bf16 BEV canvas: RPNV2 casts its input to bf16 anyway
        # when compute_dtype_test is set, and a scatter doesn't change
        # values, so casting BEFORE the scatter is bit-identical to the
        # current eval path while halving the canvas write+read — the
        # dominant byte stream of the HBM-bound (86%) PointPillar eval step
        # (ROOFLINE.json).  Caveat (ADVICE r4): with concat_input=True RPNV2
        # appends the RAW canvas to the FPN concat (previously f32 even under
        # compute_dtype_test), so the cast would change spatial_features_last
        # there — skip it in that config (no shipped config sets it).
        if ((not train) and str(a.get('compute_dtype_test', '')) == 'bfloat16'
                and not a.get('concat_input', False)):
            features = features.astype(jnp.bfloat16)
        canvas = pillar_scatter(features, coords, voxel_mask,
                                self.grid_ny, self.grid_nx)
        ret = RPNV2(
            num_class=self.num_class,
            num_anchors_per_location=self.num_anchors_per_location,
            layer_nums=tuple(a['layer_nums']),
            layer_strides=tuple(a['layer_strides']),
            num_filters=tuple(a['num_filters']),
            upsample_strides=tuple(a['upsample_strides']),
            num_upsample_filters=tuple(a['num_upsample_filters']),
            use_norm=a.get('use_norm', True),
            concat_input=a.get('concat_input', False),
            encode_background_as_zeros=a.get('encode_background_as_zeros', True),
            use_direction_classifier=a.get('use_direction_classifier', True),
            num_direction_bins=a.get('num_direction_bins', 2),
            compute_dtype_test=str(a.get('compute_dtype_test', '')),
            name='rpn_head')(canvas, train)
        ret['spatial_features'] = canvas
        if self.with_bev_seg:
            # fork extension: BEV segmentation head over the FPN features
            # (reference pointpillar.py:64-66 + experiments.py:292-394,
            # without the 1e-7 detection-loss contamination)
            from ..experiments import BEVSegHead
            ret['bev_seg_logits'] = BEVSegHead(
                num_classes=self.bev_num_classes,
                out_size=self.bev_out_size,
                name='bev_seg_head')(ret['spatial_features_last'], train)
        return ret


class PointPillar:
    """Detector wrapper: flax module + anchors + loss/predict functions."""

    def __init__(self, cfg, grid_size):
        self.cfg = cfg
        self.class_names = list(cfg.CLASS_NAMES)
        self.num_class = len(self.class_names)
        self.grid_size = np.asarray(grid_size)
        model_cfg = cfg.MODEL
        head_cfg = model_cfg.RPN.RPN_HEAD
        self.head_args = dict(head_cfg.ARGS)
        self.box_coder = ResidualCoder()
        self.anchor_targets = AnchorHeadTargets(
            head_cfg.TARGET_CONFIG, self.grid_size, self.class_names,
            box_coder=self.box_coder)
        self.anchors = jnp.asarray(self.anchor_targets.anchors)

        vfe_args = model_cfg.VFE.ARGS
        data_cfg = cfg.DATA_CONFIG
        self.with_bev_seg = 'bev' in str(cfg.get('MODE', ''))
        self.module = PointPillarNet(
            num_class=self.num_class,
            num_anchors_per_location=self.anchor_targets.num_anchors_per_location,
            grid_ny=int(self.grid_size[1]),
            grid_nx=int(self.grid_size[0]),
            vfe_num_filters=tuple(vfe_args['num_filters']),
            vfe_with_distance=bool(vfe_args.get('with_distance', False)),
            voxel_size=tuple(data_cfg.VOXEL_GENERATOR.VOXEL_SIZE),
            pc_range=tuple(data_cfg.POINT_CLOUD_RANGE),
            rpn_args=self.head_args,
            use_norm=bool(vfe_args.get('use_norm', True)),
            with_bev_seg=self.with_bev_seg,
        )

    # ------------------------------------------------------------------
    def init_variables(self, rng, batch):
        return self.module.init(rng, batch['voxels'], batch['num_points'],
                                batch['coordinates'], batch['voxel_mask'],
                                train=False)

    def forward(self, variables, batch, train):
        """Returns (ret_dict, new_batch_stats or None)."""
        if train:
            ret, updated = self.module.apply(
                variables, batch['voxels'], batch['num_points'],
                batch['coordinates'], batch['voxel_mask'], True,
                mutable=['batch_stats'])
            return ret, updated['batch_stats']
        ret = self.module.apply(
            variables, batch['voxels'], batch['num_points'],
            batch['coordinates'], batch['voxel_mask'], False)
        return ret, None

    def loss(self, ret_dict, batch):
        """Detection loss (reference pointpillar.get_training_loss:164-175 via
        AnchorHead.get_loss)."""
        lw = self.cfg.MODEL.LOSSES.LOSS_WEIGHTS
        loss, tb = self._head_loss(ret_dict, batch, lw)
        merge_overflow_tb(tb, ret_dict, batch)
        return loss, tb

    def _head_loss(self, ret_dict, batch, lw):
        return anchor_head_loss(
            ret_dict, self.anchors,
            batch['box_cls_labels'], batch['box_reg_targets'],
            num_class=self.num_class,
            loss_weights={
                'rpn_cls_weight': float(lw['rpn_cls_weight']),
                'rpn_loc_weight': float(lw['rpn_loc_weight']),
                'rpn_dir_weight': float(lw.get('rpn_dir_weight', 0.2)),
                'code_weights': list(lw['code_weights']),
            },
            num_anchors_per_location=self.anchor_targets.num_anchors_per_location,
            box_code_size=self.box_coder.code_size,
            encode_background_as_zeros=self.head_args.get(
                'encode_background_as_zeros', True),
            use_direction_classifier=self.head_args.get(
                'use_direction_classifier', True),
            dir_offset=self.head_args.get('dir_offset', 0.78539),
            num_direction_bins=self.head_args.get('num_direction_bins', 2),
        )

    def loss_with_bev(self, ret_dict, batch):
        """Detection loss + BEV seg loss when MODE requests it and the batch
        carries BEV GT masks (fork capability, kept additive — the fork's
        1e-7 detection-loss scaling is a bug we do not reproduce)."""
        det_loss, tb = self.loss(ret_dict, batch)
        if self.with_bev_seg and 'bev' in batch:
            from ..experiments import bev_seg_loss
            bev_loss, tb_bev = bev_seg_loss(ret_dict['bev_seg_logits'],
                                            batch['bev'])
            tb.update(tb_bev)
            det_loss = det_loss + bev_loss
            tb['loss'] = det_loss
        return det_loss, tb

    def predict(self, ret_dict):
        """Decoded + NMS'd fixed-shape predictions (B, post_max, ...).

        Uses the selection-before-decode path: only the top
        NMS_PRE_MAXSIZE_LAST anchors are decoded (bit-identical to
        decode-everything, tests/test_lazy_decode.py; ~78x less decode
        work at PointPillar's 321k anchors)."""
        return post_process_from_head(
            ret_dict, self.anchors, self.box_coder, self.num_class,
            self.head_args, self.cfg.MODEL.TEST)
