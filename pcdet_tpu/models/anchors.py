"""Anchor grid generation + target assignment (host-side numpy).

Semantics mirror reference pcdet/models/bbox_heads/anchor_target_assigner.py
(itself derived from second.pytorch / detectron).  In the TPU rebuild the
assignment runs in the *host data pipeline* (one call per sample, prefetched
ahead of step time) instead of inside the forward pass — removing the
reference's per-iteration device->host round trip (rpn_head.py:70-102) while
keeping identical outputs.  Outputs are fixed-shape over the full anchor grid,
so they batch and feed straight into the jitted train step.
"""
import numpy as np

from ..utils import box_np_ops
from ..utils.box_coder import ResidualCoder


def create_anchors_3d_range(feature_size, anchor_range, sizes=((1.6, 3.9, 1.56),),
                            rotations=(0, np.pi / 2), dtype=np.float32):
    """Dense anchor grid over a range.

    :param feature_size: [D, H, W] (zyx)
    :param anchor_range: [x0, y0, z0, x1, y1, z1]
    :return: (H, W, D, num_sizes, num_rots, 7) anchors
    (reference anchor_target_assigner.py:26-79, incl. the final transpose)
    """
    anchor_range = np.asarray(anchor_range, dtype)
    z_centers = np.linspace(anchor_range[2], anchor_range[5], feature_size[0],
                            dtype=dtype)
    y_centers = np.linspace(anchor_range[1], anchor_range[4], feature_size[1],
                            dtype=dtype)
    x_centers = np.linspace(anchor_range[0], anchor_range[3], feature_size[2],
                            dtype=dtype)
    sizes = np.reshape(np.asarray(sizes, dtype=dtype), [-1, 3])
    rotations = np.asarray(rotations, dtype=dtype)

    rets = list(np.meshgrid(x_centers, y_centers, z_centers, rotations,
                            indexing='ij'))
    tile_shape = [1] * 5
    tile_shape[-2] = int(sizes.shape[0])
    for i in range(len(rets)):
        rets[i] = np.tile(rets[i][..., np.newaxis, :], tile_shape)
        rets[i] = rets[i][..., np.newaxis]
    sizes_full = np.reshape(sizes, [1, 1, 1, -1, 1, 3])
    tile_size_shape = list(rets[0].shape)
    tile_size_shape[3] = 1
    sizes_full = np.tile(sizes_full, tile_size_shape)
    rets.insert(3, sizes_full)
    ret = np.concatenate(rets, axis=-1)
    return np.transpose(ret, [2, 1, 0, 3, 4, 5])


class AnchorGeneratorRange:
    def __init__(self, anchor_ranges, sizes=((1.6, 3.9, 1.56),),
                 rotations=(0, np.pi / 2), class_name=None,
                 match_threshold=-1, unmatch_threshold=-1,
                 custom_values=None, dtype=np.float32):
        self.sizes = sizes
        self.anchor_ranges = anchor_ranges
        self.rotations = rotations
        self.dtype = dtype
        self.class_name = class_name
        self.match_threshold = match_threshold
        self.unmatch_threshold = unmatch_threshold
        self.custom_values = custom_values

    @property
    def num_anchors_per_localization(self):
        num_rot = len(self.rotations)
        num_size = np.asarray(self.sizes).reshape([-1, 3]).shape[0]
        return num_rot * num_size

    def generate(self, feature_map_size):
        anchors = create_anchors_3d_range(feature_map_size, self.anchor_ranges,
                                          self.sizes, self.rotations, self.dtype)
        if self.custom_values is not None:
            custom = np.zeros((*anchors.shape[:-1], len(self.custom_values)),
                              dtype=self.dtype)
            for k, v in enumerate(self.custom_values):
                custom[..., k] = v
            anchors = np.concatenate((anchors, custom), axis=-1)
        return anchors


def build_anchor_generators(anchor_generator_cfgs, class_names):
    """One AnchorGeneratorRange per class, ordered by `class_names`."""
    gens = []
    for cur_name in class_names:
        cur_cfg = None
        for a_cfg in anchor_generator_cfgs:
            if a_cfg['class_name'] == cur_name:
                cur_cfg = a_cfg
                break
        assert cur_cfg is not None, 'Not found anchor config: %s' % cur_name
        gens.append(AnchorGeneratorRange(
            anchor_ranges=cur_cfg['anchor_range'],
            sizes=cur_cfg['sizes'],
            rotations=cur_cfg['rotations'],
            class_name=cur_cfg['class_name'],
            match_threshold=cur_cfg['matched_threshold'],
            unmatch_threshold=cur_cfg['unmatched_threshold'],
        ))
    return gens


class TargetAssigner:
    """Per-class anchor-GT matching (detectron-style with forced matches)."""

    def __init__(self, anchor_generators, pos_fraction, sample_size,
                 region_similarity_fn_name, box_coder):
        self.anchor_generators = anchor_generators
        self.pos_fraction = pos_fraction if pos_fraction >= 0 else None
        self.sample_size = sample_size
        assert region_similarity_fn_name == 'nearest_iou_similarity', \
            region_similarity_fn_name
        self.box_coder = box_coder

    @property
    def num_anchors_per_location(self):
        return sum(g.num_anchors_per_localization for g in self.anchor_generators)

    @property
    def classes(self):
        return [g.class_name for g in self.anchor_generators]

    def generate_anchors(self, feature_map_size):
        anchors_list, match_list, unmatch_list = [], [], []
        for gen in self.anchor_generators:
            anchors = gen.generate(feature_map_size)
            anchors = anchors.reshape([*anchors.shape[:3], -1, anchors.shape[-1]])
            anchors_list.append(anchors)
            num = int(np.prod(anchors.shape[:-1]))
            match_list.append(np.full([num], gen.match_threshold, anchors.dtype))
            unmatch_list.append(np.full([num], gen.unmatch_threshold, anchors.dtype))
        return {
            'anchors': np.concatenate(anchors_list, axis=-2),
            'matched_thresholds': np.concatenate(match_list, axis=0),
            'unmatched_thresholds': np.concatenate(unmatch_list, axis=0),
        }

    def generate_anchors_dict(self, feature_map_size):
        anchors_dict = {}
        for gen in self.anchor_generators:
            anchors = gen.generate(feature_map_size)
            anchors = anchors.reshape([*anchors.shape[:3], -1, anchors.shape[-1]])
            num = int(np.prod(anchors.shape[:-1]))
            anchors_dict[gen.class_name] = {
                'anchors': anchors,
                'matched_thresholds': np.full([num], gen.match_threshold,
                                              anchors.dtype),
                'unmatched_thresholds': np.full([num], gen.unmatch_threshold,
                                                anchors.dtype),
            }
        return anchors_dict

    # ------------------------------------------------------------------
    @staticmethod
    def _similarity(anchors, gt_boxes, anchors_near_bbox=None):
        """nearest_iou_similarity on the (x, y, w, l, r) BEV projection.

        `anchors_near_bbox` caches the (static) axis-aligned nearest bboxes of
        the anchor grid — recomputing them dominates per-sample assignment
        cost otherwise (~3x speedup measured).
        """
        if anchors_near_bbox is None:
            anchors_near_bbox = box_np_ops.rbbox2d_to_near_bbox(
                anchors[:, [0, 1, 3, 4, 6]])
        gt_near = box_np_ops.rbbox2d_to_near_bbox(gt_boxes[:, [0, 1, 3, 4, 6]])
        return box_np_ops.iou_axis_aligned(anchors_near_bbox, gt_near, eps=0.0)

    def assign_v2(self, anchors_dict, gt_boxes, gt_classes=None, gt_names=None):
        """Assign per class, concat over the per-location anchor axis.

        :param gt_boxes: (M, 7), :param gt_classes: (M,) in [1..C],
        :param gt_names: (M,) str
        :return: dict with flat (A,) labels, (A, 7) bbox_targets, etc.
        (reference anchor_target_assigner.py:352-404)
        """
        targets_list = []
        feature_map_size = None
        for class_name, anchor_dict in anchors_dict.items():
            mask = np.array([c == class_name for c in gt_names], dtype=np.bool_)
            flat_anchors = anchor_dict['anchors'].reshape(
                -1, anchor_dict['anchors'].shape[-1])
            if 'near_bbox' not in anchor_dict:
                anchor_dict['near_bbox'] = box_np_ops.rbbox2d_to_near_bbox(
                    flat_anchors[:, [0, 1, 3, 4, 6]])
            if 'grid' not in anchor_dict:
                # the per-class anchor grid is REGULAR: (1, ny, nx, nloc, 7)
                # with y/x centers on linspaces — stash what the candidate-
                # window fast path needs (see create_target_np)
                a = anchor_dict['anchors']
                anchor_dict['grid'] = {
                    'yc': np.ascontiguousarray(a[0, :, 0, 0, 1]),
                    'xc': np.ascontiguousarray(a[0, 0, :, 0, 0]),
                    'nloc': int(a.shape[3]),
                    'half_extent': float(np.max(a[0, 0, 0, :, 3:5]) / 2.0),
                }
            targets = self.create_target_np(
                flat_anchors,
                gt_boxes[mask],
                gt_classes=gt_classes[mask],
                matched_threshold=anchor_dict['matched_thresholds'],
                unmatched_threshold=anchor_dict['unmatched_thresholds'],
                positive_fraction=self.pos_fraction,
                rpn_batch_size=self.sample_size,
                box_code_size=self.box_coder.code_size,
                anchors_near_bbox=anchor_dict['near_bbox'],
                grid=anchor_dict['grid'],
            )
            targets_list.append(targets)
            feature_map_size = anchor_dict['anchors'].shape[:3]

        code = self.box_coder.code_size
        fm = feature_map_size
        bbox_targets = np.concatenate(
            [t['bbox_targets'].reshape(*fm, -1, code) for t in targets_list],
            axis=-2).reshape(-1, code)
        bbox_src_targets = np.concatenate(
            [t['bbox_src_targets'].reshape(*fm, -1, code) for t in targets_list],
            axis=-2).reshape(-1, code)
        labels = np.concatenate(
            [t['labels'].reshape(*fm, -1) for t in targets_list],
            axis=-1).reshape(-1)
        bbox_outside_weights = np.concatenate(
            [t['bbox_outside_weights'].reshape(*fm, -1) for t in targets_list],
            axis=-1).reshape(-1)
        return {
            'labels': labels,
            'bbox_targets': bbox_targets,
            'bbox_src_targets': bbox_src_targets,
            'bbox_outside_weights': bbox_outside_weights,
        }

    @staticmethod
    def _candidate_idx(grid, gt_boxes):
        """Flat indices of all anchors whose near-bbox can overlap some GT's
        near-bbox: anchors live on a regular (ny, nx, nloc) grid, so each GT
        contributes one index-window rectangle.  All other anchors have
        overlap exactly 0 (background).  Cuts the per-sample (A, M) IoU from
        the full 100k+ anchors to a few thousand (~10x assignment speedup).
        """
        yc, xc, nloc = grid['yc'], grid['xc'], grid['nloc']
        me = grid['half_extent'] + 1e-4
        gt_near = box_np_ops.rbbox2d_to_near_bbox(gt_boxes[:, [0, 1, 3, 4, 6]])
        ix_lo = np.searchsorted(xc, gt_near[:, 0] - me, side='left')
        ix_hi = np.searchsorted(xc, gt_near[:, 2] + me, side='right')
        iy_lo = np.searchsorted(yc, gt_near[:, 1] - me, side='left')
        iy_hi = np.searchsorted(yc, gt_near[:, 3] + me, side='right')
        cells = np.zeros((len(yc), len(xc)), dtype=bool)
        for m in range(len(gt_near)):
            cells[iy_lo[m]:iy_hi[m], ix_lo[m]:ix_hi[m]] = True
        flat_cells = np.flatnonzero(cells.ravel())
        return (flat_cells[:, None] * nloc
                + np.arange(nloc)[None, :]).reshape(-1)

    def create_target_np(self, all_anchors, gt_boxes, gt_classes=None,
                         matched_threshold=0.6, unmatched_threshold=0.45,
                         positive_fraction=None, rpn_batch_size=300,
                         box_code_size=7, rng=None, anchors_near_bbox=None,
                         grid=None):
        """Single-class anchor target creation.

        Matching rules (reference create_target_np:449-643):
          - forced matches: anchors achieving each GT's max overlap (ties incl.)
          - positives: anchor_to_gt_max >= matched_threshold
          - negatives: anchor_to_gt_max < unmatched_threshold
          - remaining anchors are don't-care (-1)

        With `grid` (regular anchor-grid metadata) the (A, M) similarity runs
        only on the candidate window around the GTs — bit-identical outputs
        (tests/test_anchor_fast_path.py fuzzes the equivalence).
        """
        num_inside = all_anchors.shape[0]
        if gt_classes is None:
            gt_classes = np.ones([gt_boxes.shape[0]], dtype=np.int32)
        if rng is None:
            rng = np.random

        labels = np.full((num_inside,), -1, dtype=np.int32)
        gt_ids = np.full((num_inside,), -1, dtype=np.int32)

        anchors_with_max_overlap = gt_inds_force = None
        anchor_to_gt_argmax = anchor_to_gt_max = None
        if (len(gt_boxes) > 0 and num_inside > 0 and grid is not None
                and len(cand := self._candidate_idx(grid, gt_boxes)) == 0):
            # every GT window falls outside the anchor grid: all background
            anchors_with_max_overlap = np.zeros(0, np.int64)
            gt_inds_force = np.zeros(0, np.int64)
            anchor_to_gt_argmax = np.zeros(num_inside, dtype=np.int64)
            bg_inds = np.arange(num_inside)
        elif len(gt_boxes) > 0 and num_inside > 0 and grid is not None:
            nb = (anchors_near_bbox[cand]
                  if anchors_near_bbox is not None else None)
            overlap = self._similarity(all_anchors[cand], gt_boxes, nb)
            a2g_argmax_c = overlap.argmax(axis=1)
            a2g_max_c = overlap[np.arange(len(cand)), a2g_argmax_c]
            gt_to_anchor_max = overlap.max(axis=0)
            gt_to_anchor_max[gt_to_anchor_max == 0] = -1
            forced_rows = np.where(overlap == gt_to_anchor_max)[0]
            anchors_with_max_overlap = cand[forced_rows]
            gt_inds_force = a2g_argmax_c[forced_rows]
            labels[anchors_with_max_overlap] = gt_classes[gt_inds_force]
            gt_ids[anchors_with_max_overlap] = gt_inds_force
            pos_c = a2g_max_c >= matched_threshold[cand]
            labels[cand[pos_c]] = gt_classes[a2g_argmax_c[pos_c]]
            gt_ids[cand[pos_c]] = a2g_argmax_c[pos_c]
            bg_mask = np.ones(num_inside, dtype=bool)
            bg_mask[cand[a2g_max_c >= unmatched_threshold[cand]]] = False
            bg_inds = np.flatnonzero(bg_mask)
            # full-size argmax view for the bbox-target encode below
            anchor_to_gt_argmax = np.zeros(num_inside, dtype=np.int64)
            anchor_to_gt_argmax[cand] = a2g_argmax_c
        elif len(gt_boxes) > 0 and num_inside > 0:
            overlap = self._similarity(all_anchors, gt_boxes,
                                       anchors_near_bbox)           # (A, M)
            anchor_to_gt_argmax = overlap.argmax(axis=1)
            anchor_to_gt_max = overlap[np.arange(num_inside), anchor_to_gt_argmax]
            gt_to_anchor_argmax = overlap.argmax(axis=0)
            gt_to_anchor_max = overlap[gt_to_anchor_argmax,
                                       np.arange(overlap.shape[1])]
            gt_to_anchor_max[gt_to_anchor_max == 0] = -1
            anchors_with_max_overlap = np.where(overlap == gt_to_anchor_max)[0]
            gt_inds_force = anchor_to_gt_argmax[anchors_with_max_overlap]
            labels[anchors_with_max_overlap] = gt_classes[gt_inds_force]
            gt_ids[anchors_with_max_overlap] = gt_inds_force
            pos_inds = anchor_to_gt_max >= matched_threshold
            gt_inds = anchor_to_gt_argmax[pos_inds]
            labels[pos_inds] = gt_classes[gt_inds]
            gt_ids[pos_inds] = gt_inds
            bg_inds = np.where(anchor_to_gt_max < unmatched_threshold)[0]
        else:
            bg_inds = np.arange(num_inside)

        fg_inds = np.where(labels > 0)[0]

        if positive_fraction is not None:
            num_fg = int(positive_fraction * rpn_batch_size)
            if len(fg_inds) > num_fg:
                disable = rng.choice(fg_inds, size=len(fg_inds) - num_fg,
                                     replace=False)
                labels[disable] = -1
                fg_inds = np.where(labels > 0)[0]
            num_bg = rpn_batch_size - np.sum(labels > 0)
            if len(bg_inds) > num_bg:
                enable = bg_inds[rng.randint(len(bg_inds), size=num_bg)]
                labels[enable] = 0
        else:
            if len(gt_boxes) == 0 or num_inside == 0:
                labels[:] = 0
            else:
                labels[bg_inds] = 0
                labels[anchors_with_max_overlap] = gt_classes[gt_inds_force]

        bbox_targets = np.zeros((num_inside, box_code_size),
                                dtype=all_anchors.dtype)
        bbox_src_targets = np.zeros((num_inside, box_code_size),
                                    dtype=all_anchors.dtype)
        fg_inds = np.where(labels > 0)[0]
        if len(gt_boxes) > 0 and num_inside > 0 and len(fg_inds) > 0:
            fg_gt_boxes = gt_boxes[anchor_to_gt_argmax[fg_inds], :]
            fg_anchors = all_anchors[fg_inds, :]
            bbox_targets[fg_inds, :] = self.box_coder.encode_np(fg_gt_boxes,
                                                                fg_anchors)
            src = fg_gt_boxes.copy()
            src[:, 0:3] = fg_gt_boxes[:, 0:3] - fg_anchors[:, 0:3]
            bbox_src_targets[fg_inds, :] = src

        bbox_outside_weights = np.zeros((num_inside,), dtype=all_anchors.dtype)
        bbox_outside_weights[labels > 0] = 1.0

        return {
            'labels': labels,
            'bbox_targets': bbox_targets,
            'bbox_src_targets': bbox_src_targets,
            'bbox_outside_weights': bbox_outside_weights,
        }


class AnchorHeadTargets:
    """Bundles anchor cache + per-sample assignment for one model config.

    Construction mirrors AnchorHead.__init__ (rpn_head.py:11-56): the
    feature-map size is grid_size[:2] // DOWNSAMPLED_FACTOR and the flat
    anchor array concatenates classes along the per-location axis.
    """

    def __init__(self, anchor_target_cfg, grid_size, class_names,
                 box_coder=None):
        self.class_names = list(class_names)
        self.box_coder = box_coder or ResidualCoder()
        gens = build_anchor_generators(anchor_target_cfg.ANCHOR_GENERATOR,
                                       class_names)
        self.assigner = TargetAssigner(
            anchor_generators=gens,
            pos_fraction=anchor_target_cfg.SAMPLE_POS_FRACTION,
            sample_size=anchor_target_cfg.SAMPLE_SIZE,
            region_similarity_fn_name=anchor_target_cfg.REGION_SIMILARITY_FN,
            box_coder=self.box_coder,
        )
        feature_map_size = np.asarray(grid_size[:2]) // anchor_target_cfg.DOWNSAMPLED_FACTOR
        feature_map_size = [*feature_map_size, 1][::-1]     # [1, ny, nx]
        self.feature_map_size = feature_map_size
        ret = self.assigner.generate_anchors(feature_map_size)
        self.anchors = ret['anchors'].reshape([-1, 7]).astype(np.float32)
        self.anchors_dict = self.assigner.generate_anchors_dict(feature_map_size)
        self.num_anchors_per_location = self.assigner.num_anchors_per_location

    @property
    def num_anchors(self):
        return self.anchors.shape[0]

    def assign(self, gt_boxes_with_cls):
        """Targets for one sample.

        :param gt_boxes_with_cls: (M, 8) [x,y,z,w,l,h,r, class(1..C)], possibly
            zero-padded rows at the end (they are stripped like the reference
            rpn_head.assign_targets:80-87).
        :return: labels (A,), bbox_targets (A, 7), bbox_outside_weights (A,)
        """
        gt_boxes_with_cls = np.asarray(gt_boxes_with_cls)
        cnt = gt_boxes_with_cls.shape[0] - 1
        while cnt > 0 and gt_boxes_with_cls[cnt].sum() == 0:
            cnt -= 1
        cur = gt_boxes_with_cls[:cnt + 1]
        if cur.shape[0] == 1 and cur.sum() == 0:
            cur = cur[:0]
        gt_boxes = cur[:, :7]
        gt_classes = cur[:, 7].astype(np.int32)
        gt_names = np.array(self.class_names)[
            np.clip(gt_classes - 1, 0, len(self.class_names) - 1)]
        return self.assigner.assign_v2(self.anchors_dict, gt_boxes,
                                       gt_classes=gt_classes, gt_names=gt_names)
