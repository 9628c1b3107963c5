"""Part-A² detector (2-stage): sparse UNet + RPN + RoI-aware RCNN refinement.

Parity target: reference pcdet/models/detectors/PartA2_net.py + rpn_unet.py +
partA2_rcnn_net.py.  The whole train step (UNet + RPN + proposal NMS + RoI
sampling + RoI-aware pooling + RCNN) runs inside one jit; the only host work
is the data pipeline.
"""
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse
from ..ops.roiaware_pool import roiaware_pool3d_multi_batched
from .anchors import AnchorHeadTargets
from .backbones3d import UNetV0, UNetV2
from ..ops import host_books
from .detector3d import merge_overflow_tb, post_process_batch
from .rpn_head import RPNV2, anchor_head_loss
from .roi_heads import (FCRCNNModule, SpConvRCNNModule, decode_rcnn_boxes,
                        proposal_layer_from_head, proposal_target_layer,
                        rcnn_loss)
from .vfe import MeanVFE
from ..utils import loss as loss_ops
from ..utils.box_coder import ResidualCoder


class PartA2Module(nn.Module):
    """Stage-1 flax module: MeanVFE -> UNet (V2/V0) -> RPNV2."""
    backbone_name: str
    num_class: int
    num_anchors_per_location: int
    sparse_shape: Tuple[int, int, int]
    last_pad: Tuple[int, int, int]
    rpn_args: Dict[str, Any]
    level_caps: Tuple[int, ...] = (0, 0, 0)
    level_caps_test: Tuple[int, ...] = ()
    level_caps_frac: Tuple[float, ...] = (0., 0., 0., 0.)
    compute_dtype: str = ''
    compute_dtype_test: str = ''

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_mask, train: bool,
                 books=None):
        feats = MeanVFE(name='vfe')(voxels, num_points, coords, voxel_mask,
                                    train)
        level = sparse.from_voxelizer(feats, coords, voxel_mask,
                                      self.sparse_shape)
        unet_cls = {'UNetV2': UNetV2, 'UNetV0': UNetV0}[self.backbone_name]
        bev, unet_ret = unet_cls(sparse_shape=self.sparse_shape,
                                 last_pad=self.last_pad,
                                 level_caps=self.level_caps,
                                 level_caps_test=self.level_caps_test,
                                 level_caps_frac=self.level_caps_frac,
                                 compute_dtype=self.compute_dtype,
                                 compute_dtype_test=self.compute_dtype_test,
                                 name='unet')(level, train, books=books)
        a = self.rpn_args
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
            name='rpn_head')(bev, train)
        ret.update(unet_ret)
        ret['spatial_features'] = bev
        return ret


def unet_loss(u_seg_preds, u_reg_preds, seg_labels, part_labels):
    """Focal seg loss + BCE part loss (reference rpn_unet.get_loss:109-143).

    :param u_seg_preds: (B, V, 1), :param u_reg_preds: (B, V, 3)
    :param seg_labels: (B, V) int32 (-1 ignore / 0 bg / class fg)
    :param part_labels: (B, V, 3)
    """
    seg = u_seg_preds[..., 0]
    cls_target = (seg_labels > 0).astype(jnp.float32)
    pos = (seg_labels > 0).astype(jnp.float32)
    neg = (seg_labels == 0).astype(jnp.float32)
    weights = pos + neg
    pos_norm = pos.sum()
    weights = weights / jnp.clip(pos_norm, min=1.0)
    cls_loss = loss_ops.sigmoid_focal_loss(
        seg[..., None], cls_target[..., None], weights, gamma=2.0,
        alpha=0.25).sum()

    p = jax.nn.sigmoid(u_reg_preds)
    eps = 1e-7
    bce = -(part_labels * jnp.log(jnp.clip(p, eps, 1.0))
            + (1 - part_labels) * jnp.log(jnp.clip(1 - p, eps, 1.0)))
    # torch F.binary_cross_entropy(mean) over (P, 3) fg elements == sum/(P*3)
    reg_loss = (bce * pos[..., None]).sum() / jnp.clip(pos_norm * 3.0, min=1.0)
    loss = cls_loss + jnp.where(pos_norm > 0, reg_loss, 0.0)
    tb = {'rpn_loss_u_cls': cls_loss, 'rpn_u_loss_reg': reg_loss,
          'rpn_loss_unet': loss, 'rpn_pos_num': pos_norm}
    return loss, tb


class PartA2Net:
    """Detector wrapper (same interface as PointPillar/SECONDNet)."""

    def __init__(self, cfg, grid_size):
        self.cfg = cfg
        self.class_names = list(cfg.CLASS_NAMES)
        self.num_class = len(self.class_names)
        self.grid_size = np.asarray(grid_size)
        self.sparse_shape = (int(grid_size[2]) + 1, int(grid_size[1]),
                             int(grid_size[0]))
        head_cfg = cfg.MODEL.RPN.RPN_HEAD
        self.head_args = dict(head_cfg.ARGS)
        self.box_coder = ResidualCoder()
        target_cfg = head_cfg.TARGET_CONFIG
        if 'DOWNSAMPLED_FACTOR' not in target_cfg:
            target_cfg.DOWNSAMPLED_FACTOR = 8
        self.anchor_targets = AnchorHeadTargets(
            target_cfg, self.grid_size, self.class_names,
            box_coder=self.box_coder)
        self.anchors = jnp.asarray(self.anchor_targets.anchors)

        data_cfg = cfg.DATA_CONFIG
        vz = data_cfg.VOXEL_GENERATOR.VOXEL_SIZE[-1]
        last_pad = (0, 0, 0) if vz in [0.1, 0.2] else (1, 0, 0)
        self.voxel_size = np.asarray(data_cfg.VOXEL_GENERATOR.VOXEL_SIZE,
                                     np.float32)
        self.pc_range = np.asarray(data_cfg.POINT_CLOUD_RANGE, np.float32)
        self.seg_mask_score_thresh = float(
            cfg.MODEL.RPN.BACKBONE.get('SEG_MASK_SCORE_THRESH', 0.3))

        self.module = PartA2Module(
            backbone_name=str(cfg.MODEL.RPN.BACKBONE.get('NAME', 'UNetV2')),
            num_class=self.num_class,
            num_anchors_per_location=self.anchor_targets.num_anchors_per_location,
            sparse_shape=self.sparse_shape,
            last_pad=last_pad,
            rpn_args=self.head_args,
            level_caps=tuple(cfg.MODEL.RPN.BACKBONE.get('ARGS', {})
                             .get('level_caps', (0, 0, 0))),
            level_caps_test=tuple(cfg.MODEL.RPN.BACKBONE.get('ARGS', {})
                                  .get('level_caps_test', ())),
            level_caps_frac=tuple(cfg.MODEL.RPN.BACKBONE.get('ARGS', {})
                                  .get('level_caps_frac', (0., 0., 0., 0.))),
            compute_dtype=str(cfg.MODEL.RPN.BACKBONE.get('ARGS', {})
                              .get('compute_dtype', '')),
            compute_dtype_test=str(cfg.MODEL.RPN.BACKBONE.get('ARGS', {})
                                   .get('compute_dtype_test', '')),
        )
        rcnn_cfg = cfg.MODEL.RCNN
        self.rcnn_cfg = rcnn_cfg
        rcnn_cls = (SpConvRCNNModule if rcnn_cfg.NAME == 'SpConvRCNN'
                    else FCRCNNModule)
        self.rcnn_module = rcnn_cls(
            num_point_features=int(rcnn_cfg.NUM_POINT_FEATURES),
            pool_size=int(rcnn_cfg.ROI_AWARE_POOL_SIZE),
            shared_fc=tuple(rcnn_cfg.SHARED_FC),
            cls_fc=tuple(rcnn_cfg.CLS_FC),
            reg_fc=tuple(rcnn_cfg.REG_FC),
            dp_ratio=float(rcnn_cfg.DP_RATIO),
            compute_dtype_test=str(rcnn_cfg.get('compute_dtype_test', '')),
        )

    # ------------------------------------------------------------------
    def _voxel_centers(self, coords):
        vs = jnp.asarray(self.voxel_size)
        origin = jnp.asarray(self.pc_range[:3])
        return (coords[..., ::-1].astype(jnp.float32) + 0.5) * vs + origin

    def init_variables(self, rng, batch):
        r1, r2, r3 = jax.random.split(rng, 3)
        variables = self.module.init(r1, batch['voxels'], batch['num_points'],
                                     batch['coordinates'],
                                     batch['voxel_mask'], train=False)
        # rcnn init with dummy pooled grids
        o = int(self.rcnn_cfg.ROI_AWARE_POOL_SIZE)
        n_dummy = 2
        dummy_part = jnp.ones((n_dummy, o, o, o, 4))
        dummy_rpn = jnp.ones((n_dummy, o, o, o,
                              int(self.rcnn_cfg.NUM_POINT_FEATURES)))
        rcnn_vars = self.rcnn_module.init(r2, dummy_part, dummy_rpn,
                                          train=False)
        params = {'stage1': variables['params'], 'rcnn': rcnn_vars['params']}
        stats = {'stage1': variables.get('batch_stats', {}),
                 'rcnn': rcnn_vars.get('batch_stats', {})}
        return {'params': params, 'batch_stats': stats}

    def _stage2(self, variables, stage1_ret, batch, train, rng):
        """Proposals -> (train: sampling) -> pooling -> RCNN."""
        mode = 'TRAIN' if train else 'TEST'
        mode_cfg = self.cfg.MODEL[mode]
        batch_size = stage1_ret['box_preds'].shape[0]
        num_anchors = self.anchors.shape[0]
        cls_preds = stage1_ret['cls_preds'].reshape(batch_size, num_anchors,
                                                    -1)
        dir_preds = stage1_ret.get('dir_cls_preds', None)
        if dir_preds is not None:
            dir_preds = dir_preds.reshape(batch_size, num_anchors, -1)
        box_raw = stage1_ret['box_preds'].reshape(batch_size, num_anchors, -1)
        cls_preds = jax.lax.stop_gradient(cls_preds)

        # selection-before-decode: only the top NMS_PRE anchors get decoded
        # (bit-identical to decoding all — tests/test_lazy_decode.py)
        roi_dict = proposal_layer_from_head(
            cls_preds, jax.lax.stop_gradient(box_raw), self.anchors,
            None if dir_preds is None else jax.lax.stop_gradient(dir_preds),
            self.box_coder, self.head_args,
            nms_pre=int(mode_cfg.NMS_PRE_MAXSIZE),
            nms_post=int(mode_cfg.NMS_POST_MAXSIZE),
            nms_thresh=float(mode_cfg.RPN_NMS_THRESH),
            rotated=str(mode_cfg.get('RPN_NMS_TYPE',
                                     'nms_gpu')) != 'nms_normal_gpu')

        targets = None
        if train:
            targets = proposal_target_layer(
                rng, roi_dict, batch['gt_boxes'],
                self.cfg.MODEL.RCNN.TARGET_CONFIG, self.num_class)
            rois = targets['rois']
            roi_raw_scores = targets['roi_raw_scores']
            roi_labels = targets['roi_labels']
        else:
            rois = roi_dict['rois']
            roi_raw_scores = roi_dict['roi_raw_scores']
            roi_labels = roi_dict['roi_labels']

        # part features: sigmoid part offsets masked by seg score + seg score
        seg_scores = jax.lax.stop_gradient(
            jax.nn.sigmoid(stage1_ret['u_seg_preds'][..., 0]))   # (B, V)
        part_offsets = jax.lax.stop_gradient(
            jax.nn.sigmoid(stage1_ret['u_reg_preds']))           # (B, V, 3)
        seg_mask = seg_scores > self.seg_mask_score_thresh
        part_offsets = part_offsets * seg_mask[..., None].astype(
            part_offsets.dtype)
        part_features = jnp.concatenate(
            [part_offsets, seg_scores[..., None]], axis=-1)      # (B, V, 4)
        seg_features = stage1_ret['seg_features']                # (B, V, 16)

        voxel_centers = self._voxel_centers(batch['coordinates'])
        voxel_mask = batch['voxel_mask']

        o = int(self.rcnn_cfg.ROI_AWARE_POOL_SIZE)

        # top-k compaction: LiDAR surfaces put O(100) active voxels in a
        # car-sized roi; 512 is ~5x headroom, and the two pools share one
        # in-box selection + sort (roiaware_pool3d_multi): 2.2 s -> ~0.15 s
        # per sample on chip (PERF_NOTES round 2)
        roi_pts_cap = int(self.rcnn_cfg.get('ROI_MAX_PTS_PER_ROI', 512))

        # batch-parallel: one pooling pass for the whole batch (round-2's
        # lax.map ran ~0.17 s/sample SERIALLY — the second term of the
        # Part-A² batch-scaling cliff after the proposal NMS)
        (pooled_part, pooled_rpn), pool_overflow = \
            roiaware_pool3d_multi_batched(
                rois[..., :7], voxel_centers,
                [(part_features, 'avg'), (seg_features, 'max')], voxel_mask,
                out_size=o, max_pts_per_roi=roi_pts_cap,
                return_overflow=True)
        n_roi = rois.shape[1]
        pooled_part = pooled_part.reshape(batch_size * n_roi, o, o, o, -1)
        pooled_rpn = pooled_rpn.reshape(batch_size * n_roi, o, o, o, -1)

        rcnn_variables = {'params': variables['params']['rcnn'],
                          'batch_stats': variables['batch_stats']['rcnn']}
        if train:
            (rcnn_cls, rcnn_reg), updated = self.rcnn_module.apply(
                rcnn_variables, pooled_part, pooled_rpn, True,
                mutable=['batch_stats'],
                rngs={'dropout': jax.random.fold_in(rng, 1)})
            new_stats = updated['batch_stats']
        else:
            rcnn_cls, rcnn_reg = self.rcnn_module.apply(
                rcnn_variables, pooled_part, pooled_rpn, False)
            new_stats = None

        ret = {
            'rcnn_cls': rcnn_cls.reshape(batch_size, n_roi),
            'rcnn_reg': rcnn_reg.reshape(batch_size, n_roi, -1),
            'rois': rois,
            'roi_raw_scores': roi_raw_scores,
            'roi_labels': roi_labels,
            'roi_valid': (targets['roi_valid'] if train
                          else roi_dict['roi_valid']),
            'pool_overflow': pool_overflow,
        }
        if targets is not None:
            ret.update({k: v for k, v in targets.items()
                        if k not in ('rois', 'roi_raw_scores', 'roi_labels')})
        return ret, new_stats

    def host_book_spec(self, input_cap, train):
        """Spec for host-built encoder rulebooks (ops/host_books.py) —
        the UNet encoder shares BackBone8x's geometry, so the same spec
        applies; the decoder derives its books from the stashed forward
        books on device (transpose scatters, no sorts)."""
        from ..ops import host_books as hb
        from .backbones3d import _resolve_caps
        m = self.module
        absolute = (m.level_caps if train or not m.level_caps_test
                    else m.level_caps_test)
        caps = _resolve_caps(int(input_cap), absolute, m.level_caps_frac,
                             train)
        return hb.encoder_spec(self.sparse_shape, caps, m.last_pad)

    def forward(self, variables, batch, train, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        stage1_vars = {'params': variables['params']['stage1'],
                       'batch_stats': variables['batch_stats']['stage1']}
        books = host_books.unpack_books(batch)
        if train:
            ret, updated = self.module.apply(
                stage1_vars, batch['voxels'], batch['num_points'],
                batch['coordinates'], batch['voxel_mask'], True,
                books=books, mutable=['batch_stats'])
            stage1_stats = updated['batch_stats']
            if bool(self.cfg.MODEL.RPN.get('PARAMS_FIXED', False)):
                # freeze stage-1 (reference PartA2_net.forward_rpn:17
                # torch.set_grad_enabled(False)): losses still computed, but
                # no gradient reaches UNet/RPN parameters
                ret = jax.tree_util.tree_map(jax.lax.stop_gradient, ret)
        else:
            ret = self.module.apply(
                stage1_vars, batch['voxels'], batch['num_points'],
                batch['coordinates'], batch['voxel_mask'], False,
                books=books)
            stage1_stats = None

        rcnn_ret, rcnn_stats = self._stage2(variables, ret, batch, train,
                                            jax.random.fold_in(rng, 7))
        ret['rcnn'] = rcnn_ret
        # cap-overflow telemetry: UNet level caps + RoI compaction cap
        ovf = dict(ret.get('overflow', {}))
        ovf['roi_pts'] = rcnn_ret.pop('pool_overflow')
        ret['overflow'] = ovf
        if train:
            new_stats = {'stage1': stage1_stats, 'rcnn': rcnn_stats}
            return ret, new_stats
        return ret, None

    def loss(self, ret_dict, batch):
        """UNet + RPN anchor + RCNN losses (reference PartA2_net
        get_training_loss:128-161)."""
        lw = self.cfg.MODEL.LOSSES.LOSS_WEIGHTS
        u_loss, tb = unet_loss(ret_dict['u_seg_preds'],
                               ret_dict['u_reg_preds'],
                               batch['seg_labels'], batch['part_labels'])
        rpn_loss, tb_rpn = anchor_head_loss(
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
            num_direction_bins=self.head_args.get('num_direction_bins', 2))
        tb.update(tb_rpn)

        r_loss, tb_rcnn = rcnn_loss(
            ret_dict['rcnn'],
            loss_weights={
                'rcnn_cls_weight': float(lw['rcnn_cls_weight']),
                'rcnn_reg_weight': float(lw['rcnn_reg_weight']),
                'rcnn_corner_weight': float(lw.get('rcnn_corner_weight', 1.0)),
                'code_weights': list(lw['code_weights']),
            },
            corner_loss_regularization=bool(
                self.cfg.MODEL.LOSSES.get('CORNER_LOSS_REGULARIZATION', True)),
            code_size=self.box_coder.code_size)
        tb.update(tb_rcnn)
        total = u_loss + rpn_loss + r_loss
        tb['loss'] = total
        merge_overflow_tb(tb, ret_dict, batch)
        return total, tb

    def predict(self, ret_dict):
        """RCNN-refined boxes -> class-agnostic NMS (reference
        detector3d.predict_boxes rcnn branch)."""
        rcnn = ret_dict['rcnn']
        boxes = decode_rcnn_boxes(rcnn['rcnn_reg'], rcnn['rois'],
                                  self.box_coder.code_size)
        # padded proposal slots must never surface as detections
        cls_preds = jnp.where(rcnn['roi_valid'], rcnn['rcnn_cls'],
                              -1e9)[..., None]              # (B, N, 1)
        return post_process_batch(cls_preds, boxes, self.cfg.MODEL.TEST,
                                  class_labels_override=rcnn['roi_labels'])
