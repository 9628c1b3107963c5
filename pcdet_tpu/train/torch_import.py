"""Reference torch checkpoint -> pcdet_tpu flax variables.

The reference saves checkpoints as {'model_state': state_dict, ...} with the
module naming contract of pcdet/models/detectors/detector3d.py:325-351 (keys
like ``vfe.pfn_layers.0.linear.weight``, ``rpn_net.conv2.1.0.weight``,
``rpn_head.blocks.0.1.weight``, ``rcnn_net.shared_fc_layer.0.conv.weight``).
This module converts such a state_dict (as numpy arrays — no torch import
needed here) into this framework's flax parameter / batch-stats trees, so
reference-trained weights run unchanged on TPU.

Layout transforms:
  torch Linear (out, in)                     -> flax kernel (in, out)
  torch Conv2d (out, in, kh, kw)             -> NHWC HWIO (kh, kw, in, out)
  torch ConvTranspose2d (in, out, kh, kw)    -> (kh, kw, in, out)
  spconv 1.x conv (k0, k1, k2, in, out)      -> flattened taps (K, in, out)
    (tap order is z-major/x-fastest on both sides: ops/sparse._kernel_offsets)
  torch BatchNorm weight/bias/running_*      -> scale/bias + batch_stats

Verified end-to-end against the executed reference models in
tests/test_torch_ckpt_parity.py.
"""
from typing import Dict, Sequence, Tuple

import numpy as np

IGNORED_PREFIXES = (
    'bev_conv.',        # fork's smp.Unet BEV head (reference pointpillar.py:64)
    'global_step',
    'depth_model.', 'seg_model.',
)


class ImportError3D(RuntimeError):
    pass


class _TreeBuilder:
    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params: Dict[Tuple[str, ...], np.ndarray] = {}
        self.stats: Dict[Tuple[str, ...], np.ndarray] = {}
        self.used = set()

    # -- torch-side fetch ---------------------------------------------------
    def t(self, key):
        if key not in self.sd:
            raise ImportError3D('missing torch key: %s' % key)
        self.used.add(key)
        return self.sd[key]

    def has(self, key):
        return key in self.sd

    # -- emitters -----------------------------------------------------------
    def linear(self, fpath, tprefix, bias=None):
        """torch nn.Linear; bias=None -> take from ckpt if present."""
        self.params[fpath + ('kernel',)] = self.t(tprefix + '.weight').T
        if bias is None:
            bias = self.has(tprefix + '.bias')
        if bias:
            self.params[fpath + ('bias',)] = self.t(tprefix + '.bias')

    def conv2d(self, fpath, tprefix, bias=False):
        w = self.t(tprefix + '.weight')               # (out, in, kh, kw)
        self.params[fpath + ('kernel',)] = w.transpose(2, 3, 1, 0)
        if bias:
            self.params[fpath + ('bias',)] = self.t(tprefix + '.bias')

    def deconv2d(self, fpath, tprefix):
        w = self.t(tprefix + '.weight')               # (in, out, kh, kw)
        self.params[fpath + ('kernel',)] = w.transpose(2, 3, 0, 1)

    def spconv3d(self, fpath, tkey, name='kernel'):
        w = self.t(tkey)                              # (k0, k1, k2, in, out)
        k = int(np.prod(w.shape[:3]))
        self.params[fpath + (name,)] = w.reshape(k, w.shape[3], w.shape[4])

    def conv3d_dense(self, fpath, tkey, name='kernel'):
        """spconv weight -> dense DHWIO (RCNN masked convs keep the grid)."""
        self.params[fpath + (name,)] = self.t(tkey)   # (k,k,k,in,out) direct

    def fc_from_conv1d(self, fpath, tprefix, zero_bias_dim=None):
        w = self.t(tprefix + '.weight')               # (out, in, 1)
        self.params[fpath + ('kernel',)] = w[..., 0].T
        if self.has(tprefix + '.bias'):
            self.params[fpath + ('bias',)] = self.t(tprefix + '.bias')
        else:
            self.params[fpath + ('bias',)] = np.zeros(w.shape[0], w.dtype)

    def bn(self, fpath, tprefix, stats_path=None):
        self.params[fpath + ('scale',)] = self.t(tprefix + '.weight')
        self.params[fpath + ('bias',)] = self.t(tprefix + '.bias')
        sp = stats_path if stats_path is not None else fpath
        self.stats[sp + ('mean',)] = self.t(tprefix + '.running_mean')
        self.stats[sp + ('var',)] = self.t(tprefix + '.running_var')
        self.used.add(tprefix + '.num_batches_tracked')

    # -- composite blocks ----------------------------------------------------
    def spconv_bn_block(self, fpath, tprefix):
        """One SpConvBNReLU <- spconv post_act_block (conv at .0, BN at .1)."""
        self.spconv3d(fpath, tprefix + '.0.weight')
        self.bn(fpath + ('TorchBatchNorm_0',), tprefix + '.1')

    def masked_conv_block(self, fpath, tprefix):
        """One MaskedConv3dBNReLU <- spconv post_act_block on the RoI grid."""
        self.conv3d_dense(fpath, tprefix + '.0.weight')
        self.bn(fpath + ('TorchBatchNorm_0',), tprefix + '.1')

    def fc_block(self, fpath, tprefix, bn=True):
        """FCBlock <- pt_utils.Conv1d (conv at .conv, BN at .bn.bn)."""
        self.fc_from_conv1d(fpath, tprefix + '.conv')
        if bn:
            self.bn(fpath + ('TorchBatchNorm_0',), tprefix + '.bn.bn')

    # -- assembled ------------------------------------------------------------
    def finish(self):
        unused = [k for k in self.sd
                  if k not in self.used
                  and not any(k.startswith(p) for p in IGNORED_PREFIXES)]
        return _unflatten(self.params), _unflatten(self.stats), sorted(unused)


def _unflatten(flat):
    tree = {}
    for path, val in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val
    return tree


# ---------------------------------------------------------------------------
# Module-level mappers
# ---------------------------------------------------------------------------

def map_pfn(b: _TreeBuilder, fprefix, num_layers=1):
    """PillarFeatureNet <- vfe.pfn_layers.* (reference vfe_utils.py:118-215)."""
    for i in range(num_layers):
        t = 'vfe.pfn_layers.%d' % i
        f = fprefix + ('PFNLayer_%d' % i,)
        b.linear(f + ('TorchLinear_0',), t + '.linear')
        b.bn(f + ('TorchBatchNorm_0',), t + '.norm')


def map_rpnv2(b: _TreeBuilder, fprefix, layer_nums: Sequence[int],
              use_dir=True, tprefix='rpn_head'):
    """RPNV2 <- rpn_head.blocks/deblocks/conv_* (reference rpn_head.py:213-281).

    torch block i = Sequential(ZeroPad2d, Conv, BN, ReLU, [Conv, BN, ReLU]*n):
    conv j at index 1+3j, BN at 2+3j.  Flax ConvBNReLU numbering is global
    across blocks (creation order in models/rpn_head.py RPNV2.__call__).
    """
    conv_i = 0
    for i, ln in enumerate(layer_nums):
        for j in range(ln + 1):
            f = fprefix + ('ConvBNReLU_%d' % conv_i,)
            b.conv2d(f + ('TorchConv_0',), '%s.blocks.%d.%d' % (tprefix, i, 1 + 3 * j))
            b.bn(f + ('TorchBatchNorm_0',), '%s.blocks.%d.%d' % (tprefix, i, 2 + 3 * j))
            conv_i += 1
        f = fprefix + ('DeconvBNReLU_%d' % i,)
        b.deconv2d(f + ('TorchConvTranspose_0',), '%s.deblocks.%d.0' % (tprefix, i))
        b.bn(f + ('TorchBatchNorm_0',), '%s.deblocks.%d.1' % (tprefix, i))
    b.conv2d(fprefix + ('conv_box',), tprefix + '.conv_box', bias=True)
    b.conv2d(fprefix + ('conv_cls',), tprefix + '.conv_cls', bias=True)
    if use_dir:
        b.conv2d(fprefix + ('conv_dir_cls',), tprefix + '.conv_dir_cls',
                 bias=True)


def map_backbone8x(b: _TreeBuilder, fprefix, tprefix='rpn_net'):
    """BackBone8x <- rpn_net.conv* (reference rpn_backbone.py:7-52)."""
    b.spconv3d(fprefix + ('conv_input',), tprefix + '.conv_input.0.weight')
    b.bn(fprefix + ('conv_input', 'TorchBatchNorm_0'), tprefix + '.conv_input.1')
    b.spconv_bn_block(fprefix + ('conv1_0',), tprefix + '.conv1.0')
    for lvl in (2, 3, 4):
        for j in range(3):
            b.spconv_bn_block(fprefix + ('conv%d_%d' % (lvl, j),),
                              '%s.conv%d.%d' % (tprefix, lvl, j))
    b.spconv3d(fprefix + ('conv_out',), tprefix + '.conv_out.0.weight')
    b.bn(fprefix + ('conv_out', 'TorchBatchNorm_0'), tprefix + '.conv_out.1')


def map_unetv2(b: _TreeBuilder, fprefix, tprefix='rpn_net'):
    """UNetV2 <- rpn_net.* (reference rpn_unet.py:339-412): the BackBone8x
    encoder plus the UR-block decoder and seg heads."""
    map_backbone8x(b, fprefix, tprefix)
    for lvl in (4, 3, 2, 1):
        ft = fprefix + ('up%d_t' % lvl,)
        tt = '%s.conv_up_t%d' % (tprefix, lvl)
        b.spconv3d(ft, tt + '.conv1.weight', name='kernel1')
        b.bn(ft + ('bn1',), tt + '.bn1')
        b.spconv3d(ft, tt + '.conv2.weight', name='kernel2')
        b.bn(ft + ('bn2',), tt + '.bn2')
        b.spconv_bn_block(fprefix + ('up%d_m' % lvl,),
                          '%s.conv_up_m%d' % (tprefix, lvl))
        if lvl > 1:
            b.spconv_bn_block(fprefix + ('up%d_inv' % lvl,),
                              '%s.inv_conv%d' % (tprefix, lvl))
    # last UR block's "inv" is the subm conv5 block (rpn_unet.py:407-409, 496)
    b.spconv_bn_block(fprefix + ('up1_inv',), tprefix + '.conv5.0')
    b.linear(fprefix + ('seg_cls_layer',), tprefix + '.seg_cls_layer')
    b.linear(fprefix + ('seg_reg_layer',), tprefix + '.seg_reg_layer')


def _conv1d_indices(n_fc, dp_ratio, with_drop_between):
    """Sequential indices of the Conv1d modules in a pt_utils FC stack."""
    idx, out = 0, []
    for k in range(n_fc):
        out.append(idx)
        idx += 1
        if with_drop_between(k):
            idx += 1
    return out


def map_rcnn(b: _TreeBuilder, fprefix, shared_fc, cls_fc, reg_fc,
             dp_ratio, spconv_rcnn: bool, pool_size: int, tprefix='rcnn_net'):
    """SpConvRCNN / FCRCNN <- rcnn_net.* (reference partA2_rcnn_net.py).

    The first FC layer consumes the flattened pooled grid; the reference
    flattens channel-major ((C, X, Y, Z) from SparseConvTensor.dense()),
    this framework grid-major ((X, Y, Z, C)) — the weight is permuted.
    """
    b.masked_conv_block(fprefix + ('conv_part_0',), tprefix + '.conv_part.0')
    b.masked_conv_block(fprefix + ('conv_part_1',), tprefix + '.conv_part.1')
    b.masked_conv_block(fprefix + ('conv_rpn_0',), tprefix + '.conv_rpn.0')
    b.masked_conv_block(fprefix + ('conv_rpn_1',), tprefix + '.conv_rpn.1')
    if spconv_rcnn:
        b.masked_conv_block(fprefix + ('conv_down_0',), tprefix + '.conv_down.0')
        b.masked_conv_block(fprefix + ('conv_down_1',), tprefix + '.conv_down.1')
        # index 2 is the parameterless SparseMaxPool3d
        b.masked_conv_block(fprefix + ('conv_down_2',), tprefix + '.conv_down.3')
        b.masked_conv_block(fprefix + ('conv_down_3',), tprefix + '.conv_down.4')
        grid = pool_size // 2
        c_flat = shared_fc[0]
    else:
        grid = pool_size
        c_flat = shared_fc[0]

    # shared FC stack: Conv1d at k, Dropout after all but the last
    n_sh = len(shared_fc) - 1
    sh_idx = _conv1d_indices(
        n_sh, dp_ratio, lambda k: (k != n_sh - 1) and dp_ratio > 0)
    for i, idx in enumerate(sh_idx):
        f = fprefix + ('shared_fc_%d' % i,)
        t = '%s.shared_fc_layer.%d' % (tprefix, idx)
        if i == 0:
            # permute channel-major -> grid-major flatten
            w = b.t(t + '.conv.weight')[..., 0]            # (out, C*X*Y*Z)
            out_ch = w.shape[0]
            w = w.reshape(out_ch, c_flat, grid, grid, grid)
            w = w.transpose(2, 3, 4, 1, 0).reshape(-1, out_ch)
            b.params[f + ('kernel',)] = w
            b.params[f + ('bias',)] = np.zeros(out_ch, w.dtype)
            b.bn(f + ('TorchBatchNorm_0',), t + '.bn.bn')
        else:
            b.fc_block(f, t)

    # cls/reg towers: Conv1d(bn) per FC + final Conv1d, Dropout inserted at 1
    for tower, fcs, fname, outname in (
            ('cls_layer', cls_fc, 'cls_fc_%d', 'cls_out'),
            ('reg_layer', reg_fc, 'reg_fc_%d', 'reg_out')):
        idx = 0
        for i in range(len(fcs)):
            b.fc_block(fprefix + (fname % i,),
                       '%s.%s.%d' % (tprefix, tower, idx))
            idx += 1
            if i == 0 and dp_ratio >= 0:
                idx += 1                                    # the Dropout
        b.fc_block(fprefix + (outname,), '%s.%s.%d' % (tprefix, tower, idx),
                   bn=False)


# ---------------------------------------------------------------------------
# Detector-level conversion
# ---------------------------------------------------------------------------

def convert_state_dict(sd: Dict[str, np.ndarray], model):
    """Convert a reference state_dict (numpy values) into flax variables for
    one of this framework's detector wrappers (PointPillar / SECONDNet /
    PartA2Net from models/build.py).

    :return: (variables, unused_torch_keys)
    """
    from ..models.pointpillar import PointPillar
    from ..models.second import SECONDNet
    from ..models.parta2 import PartA2Net

    b = _TreeBuilder(sd)
    layer_nums = tuple(model.head_args['layer_nums'])
    use_dir = bool(model.head_args.get('use_direction_classifier', True))

    if isinstance(model, PointPillar):
        map_pfn(b, ('vfe',), num_layers=len(
            model.cfg.MODEL.VFE.ARGS['num_filters']))
        map_rpnv2(b, ('rpn_head',), layer_nums, use_dir)
        params, stats, unused = b.finish()
        return {'params': params, 'batch_stats': stats}, unused

    if isinstance(model, SECONDNet):
        map_backbone8x(b, ('backbone_3d',))
        map_rpnv2(b, ('rpn_head',), layer_nums, use_dir)
        params, stats, unused = b.finish()
        return {'params': params, 'batch_stats': stats}, unused

    if isinstance(model, PartA2Net):
        map_unetv2(b, ('unet',))
        map_rpnv2(b, ('rpn_head',), layer_nums, use_dir)
        rcnn_cfg = model.rcnn_cfg
        map_rcnn(b, (), tuple(rcnn_cfg.SHARED_FC), tuple(rcnn_cfg.CLS_FC),
                 tuple(rcnn_cfg.REG_FC), float(rcnn_cfg.DP_RATIO),
                 spconv_rcnn=(rcnn_cfg.NAME == 'SpConvRCNN'),
                 pool_size=int(rcnn_cfg.ROI_AWARE_POOL_SIZE))
        params, stats, unused = b.finish()
        # split the flat tree into the wrapper's stage1/rcnn layout
        rcnn_keys = {'conv_part_0', 'conv_part_1', 'conv_rpn_0', 'conv_rpn_1',
                     'conv_down_0', 'conv_down_1', 'conv_down_2',
                     'conv_down_3', 'cls_out', 'reg_out'}

        def split(tree):
            s1, rc = {}, {}
            for k, v in tree.items():
                if (k in rcnn_keys or k.startswith('shared_fc_')
                        or k.startswith('cls_fc_') or k.startswith('reg_fc_')):
                    rc[k] = v
                else:
                    s1[k] = v
            return s1, rc
        p1, prc = split(params)
        s1, src = split(stats)
        return {'params': {'stage1': p1, 'rcnn': prc},
                'batch_stats': {'stage1': s1, 'rcnn': src}}, unused

    raise ImportError3D('unsupported model type: %r' % type(model))


def validate_against(variables, template):
    """Check converted trees match the model's init template exactly
    (paths and shapes).  Raises ImportError3D listing all mismatches."""
    import jax

    conv = {p: v for p, v in _flatten(variables)}
    temp = {p: v for p, v in _flatten(template)}
    errs = []
    for p in sorted(set(conv) | set(temp)):
        if p not in conv:
            errs.append('not converted: %s %s' % ('/'.join(p),
                                                  tuple(np.shape(temp[p]))))
        elif p not in temp:
            errs.append('extraneous:    %s' % '/'.join(p))
        elif tuple(np.shape(conv[p])) != tuple(np.shape(temp[p])):
            errs.append('shape mismatch %s: got %s want %s' % (
                '/'.join(p), tuple(np.shape(conv[p])),
                tuple(np.shape(temp[p]))))
    if errs:
        raise ImportError3D('import validation failed:\n  '
                            + '\n  '.join(errs))
    del jax
    return True


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree
