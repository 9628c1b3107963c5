"""3D sparse backbones (flax) over the TPU sparse-conv library.

Parity targets:
  - BackBone8x (SECOND): reference pcdet/models/rpn/rpn_backbone.py — SubM
    input + 4 stages (16/32/64/64) with stride-2 SparseConv3d between, final
    (3,1,1)/(2,1,1) conv, then densify to a BEV map (N, H, W, C*D).
  - UNetV2 (Part-A²): reference pcdet/models/rpn/rpn_unet.py — same encoder
    plus SparseInverseConv3d decoder with lateral SubM fusion and per-voxel
    seg/part heads (built in parta2.py on top of this module's levels).

BatchNorm over voxels uses the masked TorchBatchNorm (stats over active
voxels only — exactly spconv's BatchNorm1d over the ragged voxel list).
"""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse
from .layers import TorchBatchNorm, TorchLinear, torch_uniform_init


class SpConvBNReLU(nn.Module):
    """One sparse conv + masked BN + ReLU block.

    `compute_dtype` ('' | 'bfloat16'): cast the gathered feature table +
    weights inside the conv (accumulation stays f32) — halves the VMEM
    streaming that dominates the TPU gather-GEMM.  Off by default for exact
    float32 parity with the reference.
    """
    out_channels: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    conv_type: str = 'subm'          # 'subm' | 'spconv' | 'inverseconv'
    out_cap: int = 0                 # required for 'spconv'
    use_norm: bool = True
    compute_dtype: str = ''
    # spconv-style indice key: a strided conv stashes its forward book under
    # this key; an inverseconv with the SAME key reuses it (sparse.py
    # inverse_conv3d).  '' => reuse gated on geometry+cap equality only.
    indice_key: str = ''

    @nn.compact
    def __call__(self, level, train: bool, target=None, book=None):
        """`level` arrays are batched: features (B, V, C), ids (B, V), ...
        `book`: optional precomputed batched rulebook (host-built,
        ops/host_books.py) for this conv's geometry."""
        k = int(np.prod(self.kernel))
        cin = level.features.shape[-1]
        fan_in = cin * k
        w = self.param('kernel', torch_uniform_init(fan_in),
                       (k, cin, self.out_channels))
        cd = jnp.bfloat16 if self.compute_dtype == 'bfloat16' else None
        if self.conv_type == 'subm':
            out = sparse.subm_conv3d_batched(level, w, kernel=self.kernel,
                                             compute_dtype=cd, book=book)
        elif self.conv_type == 'spconv':
            out = sparse.sparse_conv3d_batched(
                level, w, kernel=self.kernel, stride=self.stride,
                padding=self.padding,
                out_cap=self.out_cap or level.features.shape[1],
                compute_dtype=cd, indice_key=self.indice_key, book=book)
        elif self.conv_type == 'inverseconv':
            assert target is not None
            out = sparse.inverse_conv3d_batched(
                level, target, w, kernel=self.kernel, stride=self.stride,
                padding=self.padding, compute_dtype=cd,
                indice_key=self.indice_key)
        else:
            raise NotImplementedError(self.conv_type)

        feats = out.features                              # (B, V, Cout)
        if self.use_norm:
            feats = TorchBatchNorm(self.out_channels)(feats, train,
                                                      mask=out.mask)
        feats = jax.nn.relu(feats) * out.mask[..., None].astype(feats.dtype)
        return out._replace(features=feats)

def _effective_dtype(module, train):
    """Train uses `compute_dtype`; eval prefers `compute_dtype_test` when set
    (same train/test split as `level_caps`/`level_caps_test`).  Lets configs
    ship exact-f32 training with bf16 pair-packed inference streaming."""
    if train:
        return module.compute_dtype
    return module.compute_dtype_test or module.compute_dtype


def _with_subm_book(level, books, key):
    """Attach a host-built subm rulebook (ops/host_books.py) to a level so
    the first k3 subm conv on it skips the device-side book build (the
    cached-subm_rules path — spconv indice-key semantics unchanged)."""
    b = None if not books else books.get(key)
    return level if b is None else level._replace(subm_rules=tuple(b))


def _resolve_caps(cap, level_caps, level_caps_frac, train, n=4):
    """Static per-level voxel caps for (conv2, conv3, conv4, conv_out):
    absolute `level_caps` win; otherwise `level_caps_frac` scales the INPUT
    cap, rounded up to a multiple of 256.  0 -> input cap.

    IMPORTANT (measured, scripts/measure_occupancy.py): a strided sparse
    conv DILATES a thin LiDAR surface — on realistic beam-structured scans
    conv2's active set reaches ~1.9x a truncated 16k input and ~1.3x an
    untruncated one, so the historical default (cap at every level) both
    truncated conv2/conv3 at train shapes AND wasted 2-4x at conv4/out.
    Fractions > 1 are legitimate for the early strided levels.
    """
    # The clamp keeps configs written for production caps sane at the small
    # caps used by unit tests.  It must be > 1x the input cap in BOTH modes:
    # a strided conv DILATES the active set (measured 1.9x on truncated
    # train input, 1.33x on eval input), so conv2/conv3 legitimately exceed
    # the input cap.  4x sits beyond both measured worst cases.  (Round 2
    # clamped eval to 1x, which silently undid level_caps_test: second.yaml's
    # 43520 conv2 cap resolved to the 25088 input cap and re-introduced the
    # ~25% conv2 eval truncation the caps were measured to prevent.)
    bound = 4 * cap
    caps = []
    for i in range(n):
        a = level_caps[i] if i < len(level_caps) else 0
        f = level_caps_frac[i] if i < len(level_caps_frac) else 0.0
        if a:
            caps.append(min(int(a), bound))
        elif f:
            caps.append(min(int(-(-f * cap // 256) * 256), bound))
        else:
            caps.append(cap)
    return caps


class BackBone8x(nn.Module):
    """SECOND sparse encoder -> dense BEV features.

    `level_caps` (optional, len 3-4): static voxel caps for the strided
    levels (conv2, conv3, conv4, conv_out) — deeper levels carry fewer
    active voxels than the input cap, so tightening them cuts
    rulebook+gather cost proportionally.  `level_caps_frac` expresses the
    same as fractions of the input cap.  Defaults to the input cap
    everywhere (no truncation risk).
    """
    sparse_shape: Tuple[int, int, int]       # (41, 1600, 1408)
    last_pad: Tuple[int, int, int] = (0, 0, 0)
    use_norm: bool = True
    level_caps: Tuple[int, ...] = (0, 0, 0)          # train-mode absolutes
    level_caps_test: Tuple[int, ...] = ()            # eval-mode absolutes
    level_caps_frac: Tuple[float, ...] = (0., 0., 0., 0.)
    compute_dtype: str = ''
    compute_dtype_test: str = ''     # eval-only override (like level_caps_test)

    @nn.compact
    def __call__(self, level, train: bool, books=None):
        """:param level: batched SparseLevel at full resolution;
        :param books: optional host-built rulebooks (ops/host_books.py,
            encoder_spec keys) — absent keys fall back to device builds;
        :return: (B, H, W, C*D) dense BEV + encoder levels."""
        from functools import partial
        SpConvBNReLU = partial(globals()['SpConvBNReLU'],
                               compute_dtype=_effective_dtype(self, train))
        bk = books or {}
        cap = level.features.shape[1]
        absolute = (self.level_caps if train or not self.level_caps_test
                    else self.level_caps_test)
        caps = _resolve_caps(cap, absolute, self.level_caps_frac, train)
        level = _with_subm_book(level, bk, 'subm1')
        x = SpConvBNReLU(16, name='conv_input')(level, train)
        x1 = SpConvBNReLU(16, name='conv1_0')(x, train)
        x2 = SpConvBNReLU(32, stride=(2, 2, 2), conv_type='spconv',
                          out_cap=caps[0], indice_key='spconv2',
                          name='conv2_0')(x1, train, book=bk.get('spconv2'))
        overflow = {'conv2': x2.overflow}     # capture before subm _replace
        x2 = _with_subm_book(x2, bk, 'subm2')
        x2 = SpConvBNReLU(32, name='conv2_1')(x2, train)
        x2 = SpConvBNReLU(32, name='conv2_2')(x2, train)
        x3 = SpConvBNReLU(64, stride=(2, 2, 2), conv_type='spconv',
                          out_cap=caps[1], indice_key='spconv3',
                          name='conv3_0')(x2, train, book=bk.get('spconv3'))
        overflow['conv3'] = x3.overflow
        x3 = _with_subm_book(x3, bk, 'subm3')
        x3 = SpConvBNReLU(64, name='conv3_1')(x3, train)
        x3 = SpConvBNReLU(64, name='conv3_2')(x3, train)

        x4 = SpConvBNReLU(64, stride=(2, 2, 2), padding=(0, 1, 1),
                          conv_type='spconv', out_cap=caps[2],
                          indice_key='spconv4', name='conv4_0')(
                              x3, train, book=bk.get('spconv4'))
        overflow['conv4'] = x4.overflow
        x4 = _with_subm_book(x4, bk, 'subm4')
        x4 = SpConvBNReLU(64, name='conv4_1')(x4, train)
        x4 = SpConvBNReLU(64, name='conv4_2')(x4, train)

        out = SpConvBNReLU(128, kernel=(3, 1, 1), stride=(2, 1, 1),
                           padding=self.last_pad, conv_type='spconv',
                           out_cap=caps[3], name='conv_out')(
                               x4, train, book=bk.get('convout'))
        overflow['conv_out'] = out.overflow

        dense = sparse.to_dense_batched(out)            # (B, D, H, W, 128)
        b, d, h, w, c = dense.shape
        # (B, H, W, C*D) — z folds into channels like the reference's
        # .dense() + view(N, C*D, H, W)
        bev = jnp.transpose(dense, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)
        return bev, {'x_conv1': x1, 'x_conv2': x2, 'x_conv3': x3,
                     'x_conv4': x4, 'overflow': overflow}


class SparseBasicBlock(nn.Module):
    """Residual block of two subm convs (reference resnet_utils.py:17-48)."""
    planes: int
    compute_dtype: str = ''

    @nn.compact
    def __call__(self, level, train: bool):
        cd = jnp.bfloat16 if self.compute_dtype == 'bfloat16' else None
        identity = level.features
        out = level
        k1 = self.param('kernel1', torch_uniform_init(
            level.features.shape[-1] * 27), (27, level.features.shape[-1],
                                             self.planes))
        out = sparse.subm_conv3d_batched(out, k1, compute_dtype=cd)
        f = TorchBatchNorm(self.planes, name='bn1')(out.features, train,
                                                    mask=out.mask)
        f = jax.nn.relu(f) * out.mask[..., None].astype(f.dtype)
        out = out._replace(features=f)
        k2 = self.param('kernel2', torch_uniform_init(self.planes * 27),
                        (27, self.planes, self.planes))
        out = sparse.subm_conv3d_batched(out, k2, compute_dtype=cd)
        f = TorchBatchNorm(self.planes, name='bn2')(out.features, train,
                                                    mask=out.mask)
        f = jax.nn.relu(f + identity) * out.mask[..., None].astype(f.dtype)
        return out._replace(features=f)


class SparseBottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual bottleneck over subm convs, expansion 4
    (reference resnet_utils.py:51-86; unused by the shipped models but part
    of the block library)."""
    planes: int
    expansion: int = 4
    compute_dtype: str = ''

    @nn.compact
    def __call__(self, level, train: bool):
        cd = jnp.bfloat16 if self.compute_dtype == 'bfloat16' else None
        cin = level.features.shape[-1]
        identity = level.features
        out = level
        for i, (kernel, cout) in enumerate([
                ((1, 1, 1), self.planes),
                ((3, 3, 3), self.planes),
                ((1, 1, 1), self.planes * self.expansion)]):
            k = self.param('kernel%d' % (i + 1),
                           torch_uniform_init(out.features.shape[-1]
                                              * np.prod(kernel)),
                           (int(np.prod(kernel)), out.features.shape[-1],
                            cout))
            out = sparse.subm_conv3d_batched(out, k, kernel=kernel,
                                             compute_dtype=cd)
            f = TorchBatchNorm(cout, name='bn%d' % (i + 1))(
                out.features, train, mask=out.mask)
            if i < 2:
                f = jax.nn.relu(f)
            out = out._replace(features=f * out.mask[..., None].astype(f.dtype))
        if cin != self.planes * self.expansion:
            kd = self.param('kernel_down',
                            torch_uniform_init(cin),
                            (1, cin, self.planes * self.expansion))
            down = sparse.subm_conv3d_batched(level, kd, kernel=(1, 1, 1),
                                              compute_dtype=cd)
            identity = TorchBatchNorm(self.planes * self.expansion,
                                      name='bn_down')(down.features, train,
                                                      mask=down.mask)
        f = jax.nn.relu(out.features + identity)
        return out._replace(features=f * out.mask[..., None].astype(f.dtype))


class UNetV2(nn.Module):
    """Part-A² sparse UNet: BackBone8x-style encoder + inverse-conv decoder
    with lateral residual fusion + per-voxel seg/part heads
    (reference pcdet/models/rpn/rpn_unet.py UNetV2:339-529).
    """
    sparse_shape: Tuple[int, int, int]
    last_pad: Tuple[int, int, int] = (0, 0, 0)
    level_caps: Tuple[int, ...] = (0, 0, 0)          # train-mode absolutes
    level_caps_test: Tuple[int, ...] = ()            # eval-mode absolutes
    level_caps_frac: Tuple[float, ...] = (0., 0., 0., 0.)
    compute_dtype: str = ''
    compute_dtype_test: str = ''     # eval-only override (like level_caps_test)

    def ur_block(self, x_lateral, x_bottom, planes, inv_cfg, name, train):
        """UR block (rpn_unet.py:414-422): lateral residual block, concat with
        bottom, subm conv, channel-reduced residual add, then up/last conv."""
        from functools import partial
        cd = _effective_dtype(self, train)
        SpConvBNReLU = partial(globals()['SpConvBNReLU'], compute_dtype=cd)
        x_trans = SparseBasicBlock(planes, compute_dtype=cd,
                                   name=name + '_t')(x_lateral, train)
        cat = x_trans._replace(features=jnp.concatenate(
            [x_bottom.features, x_trans.features], axis=-1))
        x_m = SpConvBNReLU(planes, name=name + '_m')(cat, train)
        # channel_reduction (rpn_unet.py:424-436): (N, C1) -> (N, C2) by
        # summing groups of C1/C2 channels
        b, v, c1 = cat.features.shape
        red = cat.features.reshape(b, v, planes, -1).sum(axis=3)
        fused = x_m._replace(features=x_m.features + red)
        conv_type, out_ch, kernel, stride, padding, target, key = inv_cfg
        if conv_type == 'inverseconv':
            return SpConvBNReLU(out_ch, kernel=kernel, stride=stride,
                                padding=padding, conv_type='inverseconv',
                                indice_key=key,
                                name=name + '_inv')(fused, train,
                                                    target=target)
        return SpConvBNReLU(out_ch, name=name + '_inv')(fused, train)

    @nn.compact
    def __call__(self, level, train: bool, stop_after: str = '', books=None):
        """`stop_after` (static, profiling only — scripts/
        profile_eval_stages.py): return that mark's features early so
        per-level prefix timings carve the UNet up.  '' = full forward.
        `books`: optional host-built encoder rulebooks (ops/host_books.py)
        — the decoder needs none (inverse convs transpose the stashed
        forward books; decoder subm convs reuse the encoder levels' cached
        books through the laterals)."""
        from functools import partial
        SpConvBNReLU = partial(globals()['SpConvBNReLU'],
                               compute_dtype=_effective_dtype(self, train))
        bk = books or {}
        cap = level.features.shape[1]
        absolute = (self.level_caps if train or not self.level_caps_test
                    else self.level_caps_test)
        caps = _resolve_caps(cap, absolute, self.level_caps_frac, train)
        level = _with_subm_book(level, bk, 'subm1')
        x = SpConvBNReLU(16, name='conv_input')(level, train)
        x1 = SpConvBNReLU(16, name='conv1_0')(x, train)
        if stop_after == 'conv1':
            return x1.features
        x2 = SpConvBNReLU(32, stride=(2, 2, 2), conv_type='spconv',
                          out_cap=caps[0], indice_key='spconv2',
                          name='conv2_0')(x1, train, book=bk.get('spconv2'))
        overflow = {'conv2': x2.overflow}     # capture before subm _replace
        x2 = _with_subm_book(x2, bk, 'subm2')
        x2 = SpConvBNReLU(32, name='conv2_1')(x2, train)
        x2 = SpConvBNReLU(32, name='conv2_2')(x2, train)
        if stop_after == 'conv2':
            return x2.features
        x3 = SpConvBNReLU(64, stride=(2, 2, 2), conv_type='spconv',
                          out_cap=caps[1], indice_key='spconv3',
                          name='conv3_0')(x2, train, book=bk.get('spconv3'))
        overflow['conv3'] = x3.overflow
        x3 = _with_subm_book(x3, bk, 'subm3')
        x3 = SpConvBNReLU(64, name='conv3_1')(x3, train)
        x3 = SpConvBNReLU(64, name='conv3_2')(x3, train)
        if stop_after == 'conv3':
            return x3.features
        x4 = SpConvBNReLU(64, stride=(2, 2, 2), padding=(0, 1, 1),
                          conv_type='spconv', out_cap=caps[2],
                          indice_key='spconv4', name='conv4_0')(
                              x3, train, book=bk.get('spconv4'))
        overflow['conv4'] = x4.overflow
        x4 = _with_subm_book(x4, bk, 'subm4')
        x4 = SpConvBNReLU(64, name='conv4_1')(x4, train)
        x4 = SpConvBNReLU(64, name='conv4_2')(x4, train)
        if stop_after == 'conv4':
            return x4.features

        out = SpConvBNReLU(128, kernel=(3, 1, 1), stride=(2, 1, 1),
                           padding=self.last_pad, conv_type='spconv',
                           out_cap=caps[3], name='conv_out')(
                               x4, train, book=bk.get('convout'))
        overflow['conv_out'] = out.overflow
        dense = sparse.to_dense_batched(out)
        b, d, h, w, c = dense.shape
        bev = jnp.transpose(dense, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)
        if stop_after == 'conv_out':
            return bev

        # decoder: x_up4 stays at level 4 (lateral == bottom), then upsample
        x_up4 = self.ur_block(x4, x4, 64,
                              ('inverseconv', 64, (3, 3, 3), (2, 2, 2),
                               (0, 1, 1), x3, 'spconv4'), 'up4', train)
        if stop_after == 'up4':
            return x_up4.features
        x_up3 = self.ur_block(x3, x_up4, 64,
                              ('inverseconv', 32, (3, 3, 3), (2, 2, 2),
                               (1, 1, 1), x2, 'spconv3'), 'up3', train)
        if stop_after == 'up3':
            return x_up3.features
        x_up2 = self.ur_block(x2, x_up3, 32,
                              ('inverseconv', 16, (3, 3, 3), (2, 2, 2),
                               (1, 1, 1), x1, 'spconv2'), 'up2', train)
        if stop_after == 'up2':
            return x_up2.features
        x_up1 = self.ur_block(x1, x_up2, 16,
                              ('subm', 16, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                               None, ''), 'up1', train)

        seg_features = x_up1.features                      # (B, V, 16)
        seg_cls_preds = TorchLinear(1, name='seg_cls_layer')(seg_features)
        seg_reg_preds = TorchLinear(3, name='seg_reg_layer')(seg_features)
        return bev, {
            'u_seg_preds': seg_cls_preds,
            'u_reg_preds': seg_reg_preds,
            'seg_features': seg_features,
            'seg_level': x_up1,
            'overflow': overflow,
        }


# UNetV0 (reference rpn_unet.py:146-336) is registered for config parity but
# is architecturally UNetV2: layer-for-layer identical encoders/decoders, and
# V0's conv_out declares 128 input channels against conv4's 64 outputs —
# research debris that cannot run.  V0's one live difference (the corrected
# 'dataset'-mode target read, rpn_unet.py:326-333 vs the V2 NameError at
# :519-524) is already the behaviour implemented here (SURVEY.md §8).
UNetV0 = UNetV2
