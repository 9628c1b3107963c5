"""Assembled-stack forward parity against the EXECUTED reference models.

The north star for this framework is AP parity with the reference (BASELINE.md).
With no KITTI data in this environment, the strongest available evidence is
bit-level forward parity of the assembled model stacks: build the reference's
torch models (via tests/ref_torch stubs), randomly initialise them, import
their state_dict through pcdet_tpu/train/torch_import.py, run BOTH frameworks
on identical batches, and require the outputs to agree to float32 tolerance.

Covers:
  - the spconv stand-in itself vs dense torch conv3d (ground-truths the stub)
  - PointPillar: PFN -> scatter -> RPNV2 heads (+ anchor bit-parity)
  - SECOND: MeanVFE -> BackBone8x (sparse) -> RPNV2 heads
  - Part-A²: UNetV2 stage-1 (+ seg heads) and the SpConvRCNN/FCRCNN stage-2
    networks on identical pooled RoI grids

Shrunken POINT_CLOUD_RANGEs keep CPU wall-time sane; the change is applied
identically to both sides, so every code path is still the real one.
"""
import numpy as np
import pytest
import torch

import ref_torch
from ref_torch import (fake_dataset, grid_size_from_cfg, load_pcdet,
                       load_ref_cfg)
from ref_torch import spconv_stub

import jax
import jax.numpy as jnp

from pcdet_tpu.config import cfg_from_yaml_file
from pcdet_tpu.models.build import build_network
from pcdet_tpu.train import torch_import

# XLA-compile-heavy on a 1-core host; run with -m slow (CI) or full suite
pytestmark = pytest.mark.slow

RTOL, ATOL = 2e-4, 2e-4


# ---------------------------------------------------------------------------
# batch fabrication
# ---------------------------------------------------------------------------

def make_voxel_batch(seed, batch_size, v_cap, nv, p, c, grid_zyx):
    """Clustered random voxels in BOTH layouts.

    returns (ours: dict of (B, V, ...) arrays sorted by linear id,
             torch: (voxels (N,P,C), num_points (N,), coords (N,4) bzyx))
    """
    rng = np.random.RandomState(seed)
    d, h, w = grid_zyx
    ours = {
        'voxels': np.zeros((batch_size, v_cap, p, c), np.float32),
        'num_points': np.zeros((batch_size, v_cap), np.int32),
        'coordinates': np.full((batch_size, v_cap, 3), -1, np.int32),
        'voxel_mask': np.zeros((batch_size, v_cap), bool),
    }
    t_vox, t_np, t_coords = [], [], []
    for b in range(batch_size):
        # clusters keep strided-conv output counts low (realistic occupancy)
        coords = []
        while len(coords) < nv:
            cz = rng.randint(0, max(d - 4, 1))
            cy = rng.randint(0, max(h - 8, 1))
            cx = rng.randint(0, max(w - 8, 1))
            k = rng.randint(8, 40)
            off = rng.randint(0, 8, size=(k, 3)) * np.array([1, 1, 1])
            cand = np.array([cz, cy, cx]) + off
            cand = cand[(cand < np.array([d, h, w])).all(1)]
            coords.extend(map(tuple, cand))
        coords = np.array(sorted(set(coords))[:nv], np.int64)    # unique
        nv_b = coords.shape[0]
        lin = (coords[:, 0] * h + coords[:, 1]) * w + coords[:, 2]
        order = np.argsort(lin)
        coords = coords[order]

        npts = rng.randint(1, p + 1, size=nv_b).astype(np.int32)
        pts = rng.randn(nv_b, p, c).astype(np.float32)
        slot = np.arange(p)[None, :] < npts[:, None]
        pts = pts * slot[:, :, None]                             # zero padding

        ours['voxels'][b, :nv_b] = pts
        ours['num_points'][b, :nv_b] = npts
        ours['coordinates'][b, :nv_b] = coords
        ours['voxel_mask'][b, :nv_b] = True
        t_vox.append(pts)
        t_np.append(npts)
        t_coords.append(np.concatenate(
            [np.full((nv_b, 1), b), coords], axis=1))
    torch_batch = (
        torch.from_numpy(np.concatenate(t_vox).astype(np.float32)),
        torch.from_numpy(np.concatenate(t_np)),
        torch.from_numpy(np.concatenate(t_coords).astype(np.int32)),
    )
    return ours, torch_batch


def ragged_to_batched(x_t, coords_t, batch_size, v_cap):
    """Scatter reference ragged per-voxel outputs (N, C) into our padded
    (B, V, C) layout (inputs were generated already id-sorted per sample)."""
    x = x_t.detach().numpy()
    out = np.zeros((batch_size, v_cap, x.shape[-1]), x.dtype)
    bs = coords_t[:, 0].numpy()
    for b in range(batch_size):
        rows = x[bs == b]
        out[b, :rows.shape[0]] = rows
    return out


def shrink_range(ref_cfg, our_cfg, pc_range):
    ref_cfg.DATA_CONFIG.POINT_CLOUD_RANGE = list(pc_range)
    our_cfg.DATA_CONFIG.POINT_CLOUD_RANGE = list(pc_range)


def to_numpy_sd(model_t):
    return {k: v.detach().cpu().numpy()
            for k, v in model_t.state_dict().items()}


# ---------------------------------------------------------------------------
# 0. the spconv stand-in itself is ground-truthed against dense torch conv
# ---------------------------------------------------------------------------

@torch.no_grad()
def test_spconv_stub_matches_dense():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    d = h = w = 6
    n, cin, cout = 40, 5, 7
    coords = np.unique(rng.randint(0, 6, size=(n, 3)), axis=0)
    idx = np.concatenate([np.zeros((len(coords), 1), np.int64), coords], 1)
    feats = torch.randn(len(coords), cin)
    x = spconv_stub.SparseConvTensor(feats, torch.from_numpy(idx).int(),
                                     (d, h, w), 1)

    # SubM == dense conv evaluated at active sites over zero-padded input
    m = spconv_stub.SubMConv3d(cin, cout, 3, padding=1, bias=False)
    y = m(x)
    dense_in = x.dense()                                  # (1, C, D, H, W)
    wt = m.weight.permute(4, 3, 0, 1, 2)                  # -> (out, in, k, k, k)
    ref = torch.nn.functional.conv3d(dense_in, wt, padding=1)
    got = y.dense()
    mask = torch.zeros(1, 1, d, h, w)
    mask[0, 0, idx[:, 1], idx[:, 2], idx[:, 3]] = 1
    np.testing.assert_allclose(got.numpy(), (ref * mask).numpy(),
                               rtol=1e-5, atol=1e-5)

    # strided SparseConv3d features match dense conv at its active sites
    m2 = spconv_stub.SparseConv3d(cin, cout, 3, stride=2, padding=1,
                                  bias=False, indice_key='k')
    y2 = m2(x)
    wt2 = m2.weight.permute(4, 3, 0, 1, 2)
    ref2 = torch.nn.functional.conv3d(dense_in, wt2, stride=2, padding=1)
    got2 = y2.features.numpy()
    oidx = y2.indices.numpy()
    want2 = ref2[0, :, oidx[:, 1], oidx[:, 2], oidx[:, 3]].numpy().T
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# 1. PointPillar
# ---------------------------------------------------------------------------

def test_pointpillar_forward_parity():
    ref_cfg = load_ref_cfg('pointpillar.yaml')
    our_cfg = cfg_from_yaml_file('tools/cfgs/pointpillar.yaml')
    # identical shrunken BEV for CPU wall-time; exercises the same code
    # grid must stay divisible by 8 for the conv/deconv FPN
    shrink_range(ref_cfg, our_cfg, [0, -10.24, -3, 15.36, 10.24, 1])
    # parity is an exact-f32 contract; eval-only bf16 heads have their own
    # tolerance tests (test_rpn_bf16.py)
    our_cfg.MODEL.RPN.RPN_HEAD.ARGS['compute_dtype_test'] = ''

    gs = grid_size_from_cfg(ref_cfg)                       # [96, 128, 1]
    torch.manual_seed(7)
    from pcdet.models.detectors.pointpillar import PointPillar as RefPP
    ref = RefPP(num_class=len(ref_cfg.CLASS_NAMES), dataset=fake_dataset(gs))
    ref.eval()

    ours = build_network(our_cfg, gs)
    variables, unused = torch_import.convert_state_dict(to_numpy_sd(ref), ours)
    assert unused == [], unused

    # anchor bit-parity
    ref_anchors = ref.rpn_head.anchor_cache['anchors'].reshape(-1, 7)
    np.testing.assert_allclose(np.asarray(ours.anchors), ref_anchors,
                               rtol=0, atol=1e-6)

    batch, (vox_t, np_t, coords_t) = make_voxel_batch(
        seed=1, batch_size=2, v_cap=512, nv=400, p=32, c=4,
        grid_zyx=(1, int(gs[1]), int(gs[0])))

    with torch.no_grad():
        vfeat = ref.vfe(features=vox_t, num_voxels=np_t, coords=coords_t)
        spatial = ref.rpn_net(vfeat, coords_t, 2, output_shape=gs[::-1])
        ref_ret = ref.rpn_head(spatial)

    ret, _ = ours.forward(variables, jax.device_put(batch), train=False)

    # VFE features (ragged vs padded layout)
    np.testing.assert_allclose(
        np.asarray(ret['spatial_features']).transpose(0, 3, 1, 2),
        spatial.numpy(), rtol=RTOL, atol=ATOL)
    for key, rkey in (('cls_preds', 'cls_preds'), ('box_preds', 'box_preds'),
                      ('dir_cls_preds', 'dir_cls_preds')):
        np.testing.assert_allclose(
            np.asarray(ret[key]), ref_ret[rkey].numpy(),
            rtol=RTOL, atol=ATOL, err_msg=key)


# ---------------------------------------------------------------------------
# 2. SECOND (sparse 3D backbone)
# ---------------------------------------------------------------------------

def test_second_forward_parity():
    ref_cfg = load_ref_cfg('second.yaml')
    our_cfg = cfg_from_yaml_file('tools/cfgs/second.yaml')
    shrink_range(ref_cfg, our_cfg, [0, -8.8, -3, 17.6, 8.8, 1])
    # parity is an exact-f32 contract; the shipped eval-only bf16 streaming
    # has its own tolerance-appropriate tests (test_sparse_packed.py)
    our_cfg.MODEL.RPN.BACKBONE.ARGS['compute_dtype_test'] = ''
    our_cfg.MODEL.RPN.RPN_HEAD.ARGS['compute_dtype_test'] = ''

    gs = grid_size_from_cfg(ref_cfg)                       # [352, 352, 40]
    torch.manual_seed(11)
    from pcdet.models.detectors.second_net import SECONDNet as RefSECOND
    ref = RefSECOND(num_class=len(ref_cfg.CLASS_NAMES),
                    dataset=fake_dataset(gs))
    ref.eval()

    ours = build_network(our_cfg, gs)
    variables, unused = torch_import.convert_state_dict(to_numpy_sd(ref), ours)
    assert unused == [], unused

    batch, (vox_t, np_t, coords_t) = make_voxel_batch(
        seed=2, batch_size=1, v_cap=2048, nv=400, p=5, c=4,
        grid_zyx=(int(gs[2]) + 1, int(gs[1]), int(gs[0])))

    with torch.no_grad():
        vfeat = ref.vfe(features=vox_t, num_voxels=np_t, coords=coords_t)
        sp = spconv_stub.SparseConvTensor(vfeat, coords_t,
                                          ref.sparse_shape, 1)
        bb_ret = ref.rpn_net(sp)
        ref_ret = ref.rpn_head(bb_ret['spatial_features'])

    ret, _ = ours.forward(variables, jax.device_put(batch), train=False)

    np.testing.assert_allclose(
        np.asarray(ret['spatial_features']).transpose(0, 3, 1, 2),
        bb_ret['spatial_features'].numpy(), rtol=1e-3, atol=1e-3)
    for key in ('cls_preds', 'box_preds', 'dir_cls_preds'):
        np.testing.assert_allclose(
            np.asarray(ret[key]), ref_ret[key].numpy(),
            rtol=1e-3, atol=1e-3, err_msg=key)


# ---------------------------------------------------------------------------
# 3. Part-A² stage-1 (UNet) + stage-2 RCNN networks
# ---------------------------------------------------------------------------

def test_parta2_stage1_forward_parity():
    ref_cfg = load_ref_cfg('PartA2.yaml')
    our_cfg = cfg_from_yaml_file('tools/cfgs/PartA2.yaml')
    shrink_range(ref_cfg, our_cfg, [0, -8.8, -3, 17.6, 8.8, 1])
    our_cfg.MODEL.RPN.BACKBONE.ARGS['compute_dtype_test'] = ''   # see above
    our_cfg.MODEL.RPN.RPN_HEAD.ARGS['compute_dtype_test'] = ''

    gs = grid_size_from_cfg(ref_cfg)
    torch.manual_seed(13)
    from pcdet.models.detectors.PartA2_net import PartA2Net as RefPartA2
    ref = RefPartA2(num_class=len(ref_cfg.CLASS_NAMES),
                    dataset=fake_dataset(gs))
    ref.eval()

    ours = build_network(our_cfg, gs)
    variables, unused = torch_import.convert_state_dict(to_numpy_sd(ref), ours)
    assert unused == [], unused

    v_cap = 1024
    batch, (vox_t, np_t, coords_t) = make_voxel_batch(
        seed=3, batch_size=1, v_cap=v_cap, nv=300, p=5, c=4,
        grid_zyx=(int(gs[2]) + 1, int(gs[1]), int(gs[0])))

    with torch.no_grad():
        vfeat = ref.vfe(features=vox_t, num_voxels=np_t, coords=coords_t)
        sp = spconv_stub.SparseConvTensor(
            vfeat, coords_t, (gs[::-1] + np.array([1, 0, 0])).tolist(), 1)
        unet_ret = ref.rpn_net(sp)
        ref_ret = ref.rpn_head(unet_ret['spatial_features'])

    s1_vars = {'params': variables['params']['stage1'],
               'batch_stats': variables['batch_stats']['stage1']}
    ret = ours.module.apply(
        s1_vars, jnp.asarray(batch['voxels']), jnp.asarray(batch['num_points']),
        jnp.asarray(batch['coordinates']), jnp.asarray(batch['voxel_mask']),
        False)

    # per-voxel seg heads: ragged (ref) vs padded (ours); inputs were
    # id-sorted so row order matches.  Compare valid rows only — on padding
    # rows our fixed-shape head emits the (harmless, loss-masked) bias.
    m = batch['voxel_mask'][..., None]
    got_seg = ragged_to_batched(unet_ret['u_seg_preds'], coords_t, 1, v_cap)
    np.testing.assert_allclose(np.asarray(ret['u_seg_preds']) * m, got_seg,
                               rtol=1e-3, atol=1e-3)
    got_reg = ragged_to_batched(unet_ret['u_reg_preds'], coords_t, 1, v_cap)
    np.testing.assert_allclose(np.asarray(ret['u_reg_preds']) * m, got_reg,
                               rtol=1e-3, atol=1e-3)
    for key in ('cls_preds', 'box_preds', 'dir_cls_preds'):
        np.testing.assert_allclose(
            np.asarray(ret[key]), ref_ret[key].numpy(),
            rtol=1e-3, atol=1e-3, err_msg=key)


@pytest.mark.parametrize('yaml_name', ['PartA2.yaml', 'PartA2_fc.yaml'])
def test_parta2_rcnn_forward_parity(yaml_name):
    """Stage-2 RCNN networks on identical pooled RoI grids (pooling itself is
    covered by tests/test_roi_heads.py; here the learned stacks must agree)."""
    ref_cfg = load_ref_cfg(yaml_name)
    our_cfg = cfg_from_yaml_file('tools/cfgs/%s' % yaml_name)
    shrink_range(ref_cfg, our_cfg, [0, -8.8, -3, 17.6, 8.8, 1])
    our_cfg.MODEL.RCNN['compute_dtype_test'] = ''   # exact-f32 contract
    gs = grid_size_from_cfg(ref_cfg)

    torch.manual_seed(17)
    from pcdet.models.detectors.PartA2_net import PartA2Net as RefPartA2
    ref = RefPartA2(num_class=len(ref_cfg.CLASS_NAMES),
                    dataset=fake_dataset(gs))
    ref.eval()

    ours = build_network(our_cfg, gs)
    variables, unused = torch_import.convert_state_dict(to_numpy_sd(ref), ours)
    assert unused == [], unused

    o = int(ref_cfg.MODEL.RCNN.ROI_AWARE_POOL_SIZE)
    n_roi, c_rpn = 4, int(ref_cfg.MODEL.RCNN.NUM_POINT_FEATURES)
    rng = np.random.RandomState(5)
    occ = rng.rand(n_roi, o, o, o) < 0.15
    # positive part values: the reference's active-set test is sum()>0
    # (partA2_rcnn_net.py:334); zeros elsewhere
    part = np.abs(rng.randn(n_roi, o, o, o, 4)).astype(np.float32)
    part *= occ[..., None]
    rpn_f = rng.randn(n_roi, o, o, o, c_rpn).astype(np.float32)
    rpn_f *= occ[..., None]

    part_t = torch.from_numpy(part)
    rpn_t = torch.from_numpy(rpn_f)
    ref.rcnn_net.roiaware_pool = lambda rois, rcnn_dict: (part_t, rpn_t)
    rcnn_dict = {
        'rois': torch.zeros(1, n_roi, 7),
        'roi_raw_scores': torch.zeros(1, n_roi),
        'roi_labels': torch.ones(1, n_roi, dtype=torch.long),
    }
    with torch.no_grad():
        ref_ret = ref.rcnn_net(rcnn_dict)

    rcnn_vars = {'params': variables['params']['rcnn'],
                 'batch_stats': variables['batch_stats']['rcnn']}
    cls, reg = ours.rcnn_module.apply(rcnn_vars, jnp.asarray(part),
                                      jnp.asarray(rpn_f), False)
    np.testing.assert_allclose(np.asarray(cls)[:, 0],
                               ref_ret['rcnn_cls'].numpy().reshape(-1),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(reg),
                               ref_ret['rcnn_reg'].numpy(),
                               rtol=1e-3, atol=1e-3)
