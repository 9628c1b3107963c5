"""Per-stage device times for the SECOND / Part-A² EVAL paths on the chip.

Round-2 profiling covered ops (profile_sparse.py) and whole steps
(bench_models.py); this fills the middle: where does an eval batch's time
go across VFE -> sparse backbone -> dense RPN -> decode+NMS (-> stage-2 for
Part-A²)?  VERDICT r2 item #7 (MFU / step-time breakdown discipline).

Methodology: each stage is its own jit taking precomputed inputs (fetched
from the previous stage's output); warmup, enqueue ITERS executions, one
scalar fetch (block_until_ready is a no-op through the remote-PJRT tunnel).
TIMED stages must RETURN A SCALAR: program results are eagerly shipped
through the axon tunnel at ~160 MB/s, so a stage returning the (B, 200,
176, 256) BEV would "cost" +700 ms of shipping per iteration regardless of
compute (PERF_NOTES measurement trap).  Stage outputs for feeding the next
stage are produced by a separate un-timed call.

Usage: python scripts/profile_eval_stages.py [--models second,parta2]
                                             [--batch 8]
"""
import argparse
import functools
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', str(ROOT / '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import numpy as np

sys.path.insert(0, str(ROOT / 'scripts'))
from bench_models import build, realistic_cfg  # noqa: E402

WARMUP = 2
ITERS = 10


def _time(fn, *args):
    """Time a jitted fn that returns a SCALAR (see module docstring)."""
    import jax
    out = fn(*args)
    for _ in range(WARMUP - 1):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()
    return (time.perf_counter() - t0) / ITERS * 1e3, out


def _scalarize(fn):
    """Wrap a stage so the timed jit returns one f32 (sum of all leaves)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def wrapped(*args):
        out = fn(*args)
        return sum(jnp.sum(jnp.asarray(l, jnp.float32))
                   for l in jax.tree_util.tree_leaves(out)
                   if hasattr(l, 'dtype') and l.dtype != bool)
    return wrapped


def profile_second(batch_size):
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.backbones3d import BackBone8x
    from pcdet_tpu.models.detector3d import (decode_single_stage,
                                             post_process_batch)
    from pcdet_tpu.models.rpn_head import RPNV2
    from pcdet_tpu.models.vfe import MeanVFE
    from pcdet_tpu.ops import sparse
    from pcdet_tpu.train.train_state import make_eval_forward

    cfg = realistic_cfg('second.yaml')
    model, batch = build(cfg, training=False, batch_size=batch_size)
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    params, stats = variables['params'], variables.get('batch_stats', {})
    mod = model.module
    rows = []

    # full eval forward (reference point; == bench_models eval metric)
    fwd = make_eval_forward(model)
    t_full, _ = _time(fwd, params, stats, batch)
    rows.append(('full eval fwd', t_full))

    # stage 1: VFE + level build
    def vfe_stage(batch):
        feats = MeanVFE().apply({}, batch['voxels'], batch['num_points'],
                                batch['coordinates'], batch['voxel_mask'],
                                False)
        level = sparse.from_voxelizer(feats, batch['coordinates'],
                                      batch['voxel_mask'], mod.sparse_shape)
        return level.features, level.ids, level.coords, level.mask
    t_vfe, _ = _time(_scalarize(vfe_stage), batch)
    rows.append(('VFE + level build', t_vfe))
    lv_arrays = jax.jit(vfe_stage)(batch)   # device-resident stage output

    # stage 2: sparse backbone (host-built books when the batch carries
    # them — bench_models.build attaches 'hb_*' under the production
    # PCDET_HOST_BOOKS default, and the stage must measure the same regime
    # as the full fwd row)
    from pcdet_tpu.ops import host_books
    bb = BackBone8x(sparse_shape=mod.sparse_shape, last_pad=mod.last_pad,
                    level_caps=mod.level_caps,
                    level_caps_test=mod.level_caps_test,
                    level_caps_frac=mod.level_caps_frac,
                    compute_dtype=mod.compute_dtype,
                    compute_dtype_test=mod.compute_dtype_test)
    bb_vars = {'params': params['backbone_3d'],
               'batch_stats': stats.get('backbone_3d', {})}

    def backbone_stage(f, ids, c, m, batch):
        level = sparse.SparseLevel(f, ids, c, m, mod.sparse_shape)
        bev, _ = bb.apply(bb_vars, level, False,
                          books=host_books.unpack_books(batch))
        return bev
    hb_batch = {k: v for k, v in batch.items() if k.startswith('hb_')}
    t_bb, _ = _time(_scalarize(backbone_stage), *lv_arrays, hb_batch)
    rows.append(('sparse backbone', t_bb))
    bev = jax.jit(backbone_stage)(*lv_arrays, hb_batch)

    # stage 3: dense RPN head
    a = mod.rpn_args
    rpn = RPNV2(num_class=mod.num_class,
                num_anchors_per_location=mod.num_anchors_per_location,
                layer_nums=tuple(a['layer_nums']),
                layer_strides=tuple(a['layer_strides']),
                num_filters=tuple(a['num_filters']),
                upsample_strides=tuple(a['upsample_strides']),
                num_upsample_filters=tuple(a['num_upsample_filters']),
                use_norm=a.get('use_norm', True),
                concat_input=a.get('concat_input', False),
                encode_background_as_zeros=a.get('encode_background_as_zeros',
                                                 True),
                use_direction_classifier=a.get('use_direction_classifier',
                                               True),
                num_direction_bins=a.get('num_direction_bins', 2))
    rpn_vars = {'params': params['rpn_head'],
                'batch_stats': stats.get('rpn_head', {})}

    def rpn_stage(bev):
        return rpn.apply(rpn_vars, bev, False)
    t_rpn, _ = _time(_scalarize(rpn_stage), bev)
    rows.append(('dense RPN head', t_rpn))
    ret = jax.jit(rpn_stage)(bev)

    # stage 4: decode + batched NMS
    def decode_eager(ret):
        cls_preds, box_preds = decode_single_stage(
            ret, model.anchors, model.box_coder, model.num_class,
            model.head_args)
        return post_process_batch(cls_preds, box_preds, model.cfg.MODEL.TEST)
    ret_j = {k: v for k, v in ret.items() if hasattr(v, 'dtype')}
    # production path: selection-before-decode (models/*.predict); the eager
    # decode-everything row is kept to quantify the lazy-decode win on chip
    t_dec, _ = _time(_scalarize(model.predict), ret_j)
    rows.append(('decode + NMS (lazy, production)', t_dec))
    t_dec_e, _ = _time(_scalarize(decode_eager), ret_j)
    rows.append(('decode + NMS (eager decode-all)', t_dec_e))

    return rows


def profile_second_backbone(batch_size):
    """Per-level breakdown of BackBone8x at eval shapes: cumulative
    prefixes (conv_input+conv1 | +conv2 block | +conv3 | +conv4 | +out),
    differences = per-level cost."""
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.backbones3d import (SpConvBNReLU, _effective_dtype,
                                              _resolve_caps)
    from pcdet_tpu.models.vfe import MeanVFE
    from pcdet_tpu.ops import sparse

    cfg = realistic_cfg('second.yaml')
    model, batch = build(cfg, training=False, batch_size=batch_size)
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    params, stats = variables['params'], variables.get('batch_stats', {})
    mod = model.module
    bbp = params['backbone_3d']
    bbs = stats.get('backbone_3d', {})
    cd = mod.compute_dtype_test or mod.compute_dtype

    def vfe_stage(batch):
        feats = MeanVFE().apply({}, batch['voxels'], batch['num_points'],
                                batch['coordinates'], batch['voxel_mask'],
                                False)
        level = sparse.from_voxelizer(feats, batch['coordinates'],
                                      batch['voxel_mask'], mod.sparse_shape)
        return level.features, level.ids, level.coords, level.mask
    lv_arrays = jax.jit(vfe_stage)(batch)
    cap = int(lv_arrays[0].shape[1])
    caps = _resolve_caps(cap, mod.level_caps_test or mod.level_caps,
                         mod.level_caps_frac, train=False)

    blocks = [
        ('conv_input', dict(out_channels=16)),
        ('conv1_0', dict(out_channels=16)),
        ('conv2_0', dict(out_channels=32, stride=(2, 2, 2),
                         conv_type='spconv', out_cap=caps[0])),
        ('conv2_1', dict(out_channels=32)),
        ('conv2_2', dict(out_channels=32)),
        ('conv3_0', dict(out_channels=64, stride=(2, 2, 2),
                         conv_type='spconv', out_cap=caps[1])),
        ('conv3_1', dict(out_channels=64)),
        ('conv3_2', dict(out_channels=64)),
        ('conv4_0', dict(out_channels=64, stride=(2, 2, 2), padding=(0, 1, 1),
                         conv_type='spconv', out_cap=caps[2])),
        ('conv4_1', dict(out_channels=64)),
        ('conv4_2', dict(out_channels=64)),
        ('conv_out', dict(out_channels=128, kernel=(3, 1, 1),
                          stride=(2, 1, 1), padding=mod.last_pad,
                          conv_type='spconv', out_cap=caps[3])),
    ]

    def run_prefix(n):
        def fn(f, ids, c, m):
            x = sparse.SparseLevel(f, ids, c, m, mod.sparse_shape)
            for name, kw in blocks[:n]:
                blk = SpConvBNReLU(compute_dtype=cd, **kw)
                v = {'params': bbp[name], 'batch_stats': bbs.get(name, {})}
                x = blk.apply(v, x, False)
            return x.features
        return fn

    marks = [(2, 'conv_input+conv1 (V=%d C=16)' % cap),
             (5, 'conv2 block (V=%d C=32)' % caps[0]),
             (8, 'conv3 block (V=%d C=64)' % caps[1]),
             (11, 'conv4 block (V=%d C=64)' % caps[2]),
             (12, 'conv_out (V=%d C=128)' % caps[3])]
    rows, prev = [], 0.0
    for n, label in marks:
        t, _ = _time(_scalarize(run_prefix(n)), *lv_arrays)
        rows.append((label, t - prev))
        prev = t
    rows.append(('TOTAL (prefix sum)', prev))
    return rows


def profile_parta2(batch_size):
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.train.train_state import make_eval_forward

    cfg = realistic_cfg('PartA2.yaml')
    model, batch = build(cfg, training=False, batch_size=batch_size)
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    params, stats = variables['params'], variables.get('batch_stats', {})
    rows = []

    fwd = make_eval_forward(model)
    t_full, _ = _time(fwd, params, stats, batch)
    rows.append(('full eval fwd', t_full))

    # stage 1 only (VFE + UNet + RPN)
    def stage1(params, stats, batch):
        v = {'params': params['stage1'], 'batch_stats': stats['stage1']}
        return model.module.apply(
            v, batch['voxels'], batch['num_points'], batch['coordinates'],
            batch['voxel_mask'], False)
    t_s1, _ = _time(_scalarize(stage1), params, stats, batch)
    rows.append(('stage1 (VFE+UNet+RPN)', t_s1))
    rows.append(('stage2 (prop+pool+RCNN+NMS)', t_full - t_s1))

    # stage-2 carve-up: proposal NMS | RoI pooling | RCNN
    from pcdet_tpu.models.roi_heads import proposal_layer
    from pcdet_tpu.ops.roiaware_pool import roiaware_pool3d_multi_batched
    ret = jax.jit(stage1)(params, stats, batch)
    mode_cfg = model.cfg.MODEL.TEST
    bsz = ret['box_preds'].shape[0]
    num_anchors = model.anchors.shape[0]

    def prop_stage(ret):
        batch_anchors = jnp.broadcast_to(model.anchors[None],
                                         (bsz, num_anchors, 7))
        cls_preds = ret['cls_preds'].reshape(bsz, num_anchors, -1)
        dir_preds = ret.get('dir_cls_preds')
        if dir_preds is not None:
            dir_preds = dir_preds.reshape(bsz, num_anchors, -1)
        box_preds = model.box_coder.decode_with_head_direction(
            ret['box_preds'].reshape(bsz, num_anchors, -1), batch_anchors,
            dir_preds,
            num_dir_bins=model.head_args.get('num_direction_bins', 2),
            dir_offset=model.head_args.get('dir_offset', 0.78539),
            dir_limit_offset=model.head_args.get('dir_limit_offset', 0.0),
            use_binary_dir_classifier=model.head_args.get(
                'use_binary_dir_classifier', False))
        return proposal_layer(
            cls_preds, box_preds,
            nms_pre=int(mode_cfg.NMS_PRE_MAXSIZE),
            nms_post=int(mode_cfg.NMS_POST_MAXSIZE),
            nms_thresh=float(mode_cfg.RPN_NMS_THRESH),
            rotated=str(mode_cfg.get('RPN_NMS_TYPE',
                                     'nms_gpu')) != 'nms_normal_gpu')
    t_prop, _ = _time(_scalarize(prop_stage), ret)
    rows.append(('  decode + proposal NMS', t_prop))
    roi_dict = jax.jit(prop_stage)(ret)

    o = int(model.rcnn_cfg.ROI_AWARE_POOL_SIZE)
    cap = int(model.rcnn_cfg.get('ROI_MAX_PTS_PER_ROI', 512))

    def pool_stage(ret, roi_dict, batch):
        seg_scores = jax.nn.sigmoid(ret['u_seg_preds'][..., 0])
        part_offsets = jax.nn.sigmoid(ret['u_reg_preds'])
        seg_mask = seg_scores > model.seg_mask_score_thresh
        part_offsets = part_offsets * seg_mask[..., None].astype(
            part_offsets.dtype)
        part_features = jnp.concatenate(
            [part_offsets, seg_scores[..., None]], axis=-1)
        voxel_centers = model._voxel_centers(batch['coordinates'])
        return roiaware_pool3d_multi_batched(
            roi_dict['rois'][..., :7], voxel_centers,
            [(part_features, 'avg'), (ret['seg_features'], 'max')],
            batch['voxel_mask'], out_size=o, max_pts_per_roi=cap,
            return_overflow=True)[0]
    t_pool, _ = _time(_scalarize(pool_stage), ret, roi_dict, batch)
    rows.append(('  RoI-aware pooling', t_pool))
    pooled = jax.jit(pool_stage)(ret, roi_dict, batch)

    n_roi = roi_dict['rois'].shape[1]
    rcnn_vars = {'params': params['rcnn'],
                 'batch_stats': stats['rcnn']}

    def rcnn_stage(pooled):
        pp = pooled[0].reshape(bsz * n_roi, o, o, o, -1)
        pr = pooled[1].reshape(bsz * n_roi, o, o, o, -1)
        return model.rcnn_module.apply(rcnn_vars, pp, pr, False)
    t_rcnn, _ = _time(_scalarize(rcnn_stage), pooled)
    rows.append(('  RCNN head', t_rcnn))
    return rows


def profile_parta2_unet(batch_size):
    """Per-level carve-up of the Part-A² UNet (stage1 is ~3/4 of eval fwd):
    cumulative prefixes through UNetV2's `stop_after` marks, differences =
    per-mark cost.  Encoder marks mirror second_backbone; decoder marks
    time each UR block (lateral residual + fuse + inverse conv)."""
    import jax
    from pcdet_tpu.models.backbones3d import UNetV2
    from pcdet_tpu.models.vfe import MeanVFE
    from pcdet_tpu.ops import sparse

    cfg = realistic_cfg('PartA2.yaml')
    model, batch = build(cfg, training=False, batch_size=batch_size)
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    params, stats = variables['params'], variables.get('batch_stats', {})
    mod = model.module

    def vfe_stage(batch):
        feats = MeanVFE().apply({}, batch['voxels'], batch['num_points'],
                                batch['coordinates'], batch['voxel_mask'],
                                False)
        level = sparse.from_voxelizer(feats, batch['coordinates'],
                                      batch['voxel_mask'], mod.sparse_shape)
        return level.features, level.ids, level.coords, level.mask
    lv_arrays = jax.jit(vfe_stage)(batch)

    unet = UNetV2(sparse_shape=mod.sparse_shape, last_pad=mod.last_pad,
                  level_caps=mod.level_caps,
                  level_caps_test=mod.level_caps_test,
                  level_caps_frac=mod.level_caps_frac,
                  compute_dtype=mod.compute_dtype,
                  compute_dtype_test=mod.compute_dtype_test)
    uv = {'params': params['stage1']['unet'],
          'batch_stats': stats.get('stage1', {}).get('unet', {})}

    def run_prefix(mark):
        def fn(f, ids, c, m):
            level = sparse.SparseLevel(f, ids, c, m, mod.sparse_shape)
            return unet.apply(uv, level, False, stop_after=mark)
        return fn

    marks = ['conv1', 'conv2', 'conv3', 'conv4', 'conv_out',
             'up4', 'up3', 'up2', '']
    labels = ['conv_input+conv1', 'conv2 block', 'conv3 block', 'conv4 block',
              'conv_out + BEV', 'up4 (UR block)', 'up3 (UR block)',
              'up2 (UR block)', 'up1 + seg heads']
    rows, prev = [], 0.0
    for mark, label in zip(marks, labels):
        t, _ = _time(_scalarize(run_prefix(mark)), *lv_arrays)
        rows.append((label, t - prev))
        prev = t
    rows.append(('TOTAL (prefix sum)', prev))
    return rows


def profile_pointpillar(batch_size):
    """PP eval carve-up: VFE (PFN) | pillar scatter | RPN FPN+heads |
    decode + batched NMS — the headline model had no per-stage numbers."""
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.detector3d import (decode_single_stage,
                                             post_process_batch)
    from pcdet_tpu.models.pillar_scatter import pillar_scatter
    from pcdet_tpu.models.rpn_head import RPNV2
    from pcdet_tpu.models.vfe import PillarFeatureNet
    from pcdet_tpu.train.train_state import make_eval_forward

    cfg = realistic_cfg('pointpillar.yaml')
    model, batch = build(cfg, training=False, batch_size=batch_size)
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    params, stats = variables['params'], variables.get('batch_stats', {})
    mod = model.module
    rows = []

    fwd = make_eval_forward(model)
    t_full, _ = _time(fwd, params, stats, batch)
    rows.append(('full eval fwd', t_full))

    vfe = PillarFeatureNet(num_filters=tuple(mod.vfe_num_filters),
                           use_norm=mod.use_norm,
                           with_distance=mod.vfe_with_distance,
                           voxel_size=tuple(mod.voxel_size),
                           pc_range=tuple(mod.pc_range))
    vfe_vars = {'params': params['vfe'],
                'batch_stats': stats.get('vfe', {})}

    def vfe_stage(batch):
        return vfe.apply(vfe_vars, batch['voxels'], batch['num_points'],
                         batch['coordinates'], batch['voxel_mask'], False)
    t_vfe, _ = _time(_scalarize(vfe_stage), batch)
    rows.append(('VFE (PFN)', t_vfe))
    feats = jax.jit(vfe_stage)(batch)

    def scatter_stage(feats, batch):
        return pillar_scatter(feats, batch['coordinates'],
                              batch['voxel_mask'], mod.grid_ny, mod.grid_nx)
    t_sc, _ = _time(_scalarize(scatter_stage), feats, batch)
    rows.append(('pillar scatter', t_sc))
    canvas = jax.jit(scatter_stage)(feats, batch)

    a = mod.rpn_args
    rpn = RPNV2(num_class=mod.num_class,
                num_anchors_per_location=mod.num_anchors_per_location,
                layer_nums=tuple(a['layer_nums']),
                layer_strides=tuple(a['layer_strides']),
                num_filters=tuple(a['num_filters']),
                upsample_strides=tuple(a['upsample_strides']),
                num_upsample_filters=tuple(a['num_upsample_filters']),
                use_norm=a.get('use_norm', True),
                concat_input=a.get('concat_input', False),
                encode_background_as_zeros=a.get('encode_background_as_zeros',
                                                 True),
                use_direction_classifier=a.get('use_direction_classifier',
                                               True),
                num_direction_bins=a.get('num_direction_bins', 2),
                compute_dtype_test=str(a.get('compute_dtype_test', '')))
    rpn_vars = {'params': params['rpn_head'],
                'batch_stats': stats.get('rpn_head', {})}

    def rpn_stage(canvas):
        return rpn.apply(rpn_vars, canvas, False)
    t_rpn, _ = _time(_scalarize(rpn_stage), canvas)
    rows.append(('RPN FPN + heads', t_rpn))
    ret = jax.jit(rpn_stage)(canvas)

    def decode_eager(ret):
        cls_preds, box_preds = decode_single_stage(
            ret, model.anchors, model.box_coder, model.num_class,
            model.head_args)
        return post_process_batch(cls_preds, box_preds, model.cfg.MODEL.TEST)
    ret_j = {k: v for k, v in ret.items() if hasattr(v, 'dtype')}
    # production path: selection-before-decode (models/*.predict); the eager
    # decode-everything row is kept to quantify the lazy-decode win on chip
    t_dec, _ = _time(_scalarize(model.predict), ret_j)
    rows.append(('decode + NMS (lazy, production)', t_dec))
    t_dec_e, _ = _time(_scalarize(decode_eager), ret_j)
    rows.append(('decode + NMS (eager decode-all)', t_dec_e))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--models', default='second,parta2')
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args()
    report = {}
    for m in args.models.split(','):
        t0 = time.time()
        rows = {'second': profile_second,
                'second_backbone': profile_second_backbone,
                'parta2': profile_parta2,
                'parta2_unet': profile_parta2_unet,
                'pointpillar': profile_pointpillar}[m](args.batch)
        report[m] = rows
        print(f'== {m} eval B{args.batch} (setup {time.time() - t0:.0f}s)')
        for name, ms in rows:
            print(f'  {name:32s} {ms:8.1f} ms/batch '
                  f'({ms / args.batch:6.2f} ms/frame)')
    path = ROOT / 'PROFILE_EVAL_STAGES.json'
    merged = {}
    if path.exists():
        merged = json.loads(path.read_text())
    merged.update({m: [[n, round(t, 2)] for n, t in r]
                   for m, r in report.items()})
    path.write_text(json.dumps(merged, indent=1))


if __name__ == '__main__':
    main()
