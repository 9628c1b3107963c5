"""SECOND detector (1-stage, sparse 3D backbone).

Parity target: reference pcdet/models/detectors/second_net.py — MeanVFE ->
SparseConvTensor (sparse_shape = grid[::-1] + [1, 0, 0]) -> BackBone8x ->
RPNV2, trained with the same anchor losses as PointPillar.
"""
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse
from .anchors import AnchorHeadTargets
from .backbones3d import BackBone8x
from .detector3d import merge_overflow_tb, post_process_from_head
from .rpn_head import RPNV2, anchor_head_loss
from .vfe import MeanVFE
from ..utils.box_coder import ResidualCoder


class SECONDNetModule(nn.Module):
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
        bev, encoder_levels = BackBone8x(
            sparse_shape=self.sparse_shape, last_pad=self.last_pad,
            level_caps=self.level_caps,
            level_caps_test=self.level_caps_test,
            level_caps_frac=self.level_caps_frac,
            compute_dtype=self.compute_dtype,
            compute_dtype_test=self.compute_dtype_test,
            name='backbone_3d')(level, train, books=books)
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
        ret['spatial_features'] = bev
        ret['overflow'] = encoder_levels['overflow']   # per-cap drop counters
        return ret


class SECONDNet:
    """Detector wrapper: module + anchors + loss/predict (see PointPillar)."""

    def __init__(self, cfg, grid_size):
        self.cfg = cfg
        self.class_names = list(cfg.CLASS_NAMES)
        self.num_class = len(self.class_names)
        self.grid_size = np.asarray(grid_size)
        # spconv convention: sparse z gets one extra slot
        # (reference second_net.py:10)
        self.sparse_shape = (int(grid_size[2]) + 1, int(grid_size[1]),
                             int(grid_size[0]))
        head_cfg = cfg.MODEL.RPN.RPN_HEAD
        self.head_args = dict(head_cfg.ARGS)
        self.box_coder = ResidualCoder()
        self.anchor_targets = AnchorHeadTargets(
            head_cfg.TARGET_CONFIG, self.grid_size, self.class_names,
            box_coder=self.box_coder)
        self.anchors = jnp.asarray(self.anchor_targets.anchors)

        vz = cfg.DATA_CONFIG.VOXEL_GENERATOR.VOXEL_SIZE[-1]
        last_pad = (0, 0, 0) if vz in [0.1, 0.2] else (1, 0, 0)
        backbone_args = dict(cfg.MODEL.RPN.BACKBONE.get('ARGS', {}))
        self.module = SECONDNetModule(
            num_class=self.num_class,
            num_anchors_per_location=self.anchor_targets.num_anchors_per_location,
            sparse_shape=self.sparse_shape,
            last_pad=last_pad,
            rpn_args=self.head_args,
            level_caps=tuple(backbone_args.get('level_caps', (0, 0, 0))),
            level_caps_test=tuple(backbone_args.get('level_caps_test', ())),
            level_caps_frac=tuple(backbone_args.get('level_caps_frac',
                                                    (0., 0., 0., 0.))),
            compute_dtype=str(backbone_args.get('compute_dtype', '')),
            compute_dtype_test=str(backbone_args.get('compute_dtype_test',
                                                     '')),
        )

    def init_variables(self, rng, batch):
        return self.module.init(rng, batch['voxels'], batch['num_points'],
                                batch['coordinates'], batch['voxel_mask'],
                                train=False)

    def forward(self, variables, batch, train):
        from ..ops import host_books
        books = host_books.unpack_books(batch)
        if train:
            ret, updated = self.module.apply(
                variables, batch['voxels'], batch['num_points'],
                batch['coordinates'], batch['voxel_mask'], True,
                books=books, mutable=['batch_stats'])
            return ret, updated['batch_stats']
        ret = self.module.apply(
            variables, batch['voxels'], batch['num_points'],
            batch['coordinates'], batch['voxel_mask'], False, books=books)
        return ret, None

    def host_book_spec(self, input_cap, train):
        """Spec for host-built encoder rulebooks (ops/host_books.py) at this
        model's resolved per-level caps."""
        from ..ops import host_books
        from .backbones3d import _resolve_caps
        m = self.module
        absolute = (m.level_caps if train or not m.level_caps_test
                    else m.level_caps_test)
        caps = _resolve_caps(int(input_cap), absolute, m.level_caps_frac,
                             train)
        return host_books.encoder_spec(self.sparse_shape, caps, m.last_pad)

    def loss(self, ret_dict, batch):
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

    def predict(self, ret_dict):
        # selection-before-decode (bit-identical, tests/test_lazy_decode.py)
        return post_process_from_head(
            ret_dict, self.anchors, self.box_coder, self.num_class,
            self.head_args, self.cfg.MODEL.TEST)
