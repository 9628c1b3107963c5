"""Pure-torch stand-in for the spconv 1.x library the reference depends on.

The reference's SECOND / Part-A² backbones are written against spconv
(reference pcdet/models/rpn/rpn_backbone.py:2, rpn_unet.py:4,
rcnn/partA2_rcnn_net.py:5).  spconv is not installed here, so this module
implements the exact subset of its API those files touch — with REAL compute
(ragged (features, indices) representation + per-tap coordinate-hash lookups)
so the reference models can be instantiated AND executed on CPU for
forward-parity tests against pcdet_tpu.

Semantics implemented (validated against dense torch conv3d in
tests/test_torch_ckpt_parity.py::test_spconv_stub_matches_dense):
  * weight layout (k0, k1, k2, in, out) — spconv 1.x SparseConvolution
  * SubMConv3d: out[i] = sum_t W[t] · x[i + t - k//2], output sites == input
    sites, missing neighbours contribute zero
  * SparseConv3d(stride s, padding p): active outputs = every o whose
    receptive field {o*s - p + t} touches an active input
  * SparseInverseConv3d(indice_key): output sites = the input sites of the
    strided conv that registered `indice_key`; y[i] = sum_t W[t] · z[o] over
    pairs with i = o*s - p + t  (the rulebook transpose)
  * SparseMaxPool3d: max over active inputs per output window
  * SparseSequential applies non-sparse modules (BN/ReLU) to `.features`

This is TEST-ONLY code: clarity over speed (python dict per conv).
"""
import numpy as np
import torch
import torch.nn as nn


def _triple(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v),) * 3


class SparseConvTensor:
    def __init__(self, features, indices, spatial_shape, batch_size,
                 indice_dict=None):
        self.features = features            # (N, C)
        self.indices = indices              # (N, 4) int [b, z, y, x]
        self.spatial_shape = [int(s) for s in spatial_shape]
        self.batch_size = int(batch_size)
        # indice_key -> (input_indices, input_spatial_shape, stride, padding)
        self.indice_dict = {} if indice_dict is None else indice_dict

    def dense(self):
        c = self.features.shape[1]
        d, h, w = self.spatial_shape
        out = torch.zeros(self.batch_size, c, d, h, w,
                          dtype=self.features.dtype)
        idx = self.indices.long()
        out[idx[:, 0], :, idx[:, 1], idx[:, 2], idx[:, 3]] = self.features
        return out


def _coord_table(indices):
    arr = indices.detach().cpu().numpy()
    return {tuple(r): i for i, r in enumerate(arr)}


def _gather_rows(table, coords_np):
    """coords (N, 4) -> (row index or -1) per row."""
    return np.array([table.get(tuple(r), -1) for r in coords_np],
                    dtype=np.int64)


class SparseModule(nn.Module):
    pass


class _SparseConvBase(SparseModule):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, bias=False, indice_key=None):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _triple(kernel_size)
        self.stride = _triple(stride)
        self.padding = _triple(padding)
        self.indice_key = indice_key
        self.weight = nn.Parameter(
            torch.empty(*self.kernel_size, in_channels, out_channels))
        nn.init.uniform_(self.weight, -0.1, 0.1)
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
        else:
            self.register_parameter('bias', None)

    def _taps(self):
        kd, kh, kw = self.kernel_size
        for tz in range(kd):
            for ty in range(kh):
                for tx in range(kw):
                    yield tz, ty, tx


class SubMConv3d(_SparseConvBase):
    def forward(self, x: SparseConvTensor):
        idx_np = x.indices.detach().cpu().numpy().astype(np.int64)
        table = _coord_table(x.indices)
        n = idx_np.shape[0]
        out = torch.zeros(n, self.out_channels, dtype=x.features.dtype)
        kd, kh, kw = self.kernel_size
        center = np.array([0, kd // 2, kh // 2, kw // 2], dtype=np.int64)
        for tz, ty, tx in self._taps():
            off = np.array([0, tz, ty, tx], dtype=np.int64) - center
            rows = _gather_rows(table, idx_np + off)
            sel = rows >= 0
            if not sel.any():
                continue
            w_t = self.weight[tz, ty, tx]                  # (in, out)
            out[sel] += x.features[torch.from_numpy(rows[sel])] @ w_t
        if self.bias is not None:
            out = out + self.bias
        return SparseConvTensor(out, x.indices, x.spatial_shape,
                                x.batch_size, x.indice_dict)


class SparseConv3d(_SparseConvBase):
    def forward(self, x: SparseConvTensor):
        idx_np = x.indices.detach().cpu().numpy().astype(np.int64)
        k, s, p = self.kernel_size, self.stride, self.padding
        out_shape = [(x.spatial_shape[i] + 2 * p[i] - k[i]) // s[i] + 1
                     for i in range(3)]
        # active output set: o = (i + p - t) / s for every valid tap
        cand = set()
        for tz, ty, tx in self._taps():
            t = np.array([tz, ty, tx], dtype=np.int64)
            num = idx_np[:, 1:] + np.array(p) - t
            ok = (num % np.array(s) == 0).all(1) & (num >= 0).all(1)
            o = num // np.array(s)
            ok &= (o < np.array(out_shape)).all(1)
            for b, (oz, oy, ox) in zip(idx_np[ok, 0], o[ok]):
                cand.add((int(b), int(oz), int(oy), int(ox)))
        out_idx_np = np.array(sorted(cand), dtype=np.int64).reshape(-1, 4)
        table = _coord_table(x.indices)
        m = out_idx_np.shape[0]
        out = torch.zeros(m, self.out_channels, dtype=x.features.dtype)
        for tz, ty, tx in self._taps():
            in_c = out_idx_np.copy()
            in_c[:, 1:] = (out_idx_np[:, 1:] * np.array(s) - np.array(p)
                           + np.array([tz, ty, tx]))
            rows = _gather_rows(table, in_c)
            sel = rows >= 0
            if not sel.any():
                continue
            w_t = self.weight[tz, ty, tx]
            out[sel] += x.features[torch.from_numpy(rows[sel])] @ w_t
        if self.bias is not None:
            out = out + self.bias
        out_indices = torch.from_numpy(out_idx_np).int()
        indice_dict = dict(x.indice_dict)
        if self.indice_key is not None:
            indice_dict[self.indice_key] = (
                x.indices, list(x.spatial_shape), self.stride, self.padding,
                self.kernel_size)
        return SparseConvTensor(out, out_indices, out_shape, x.batch_size,
                                indice_dict)


class SparseInverseConv3d(_SparseConvBase):
    """Output sites = input sites of the conv that registered indice_key;
    rulebook transposed (same tap index pairing as the forward conv)."""

    def forward(self, x: SparseConvTensor):
        (fine_indices, fine_shape, s, p, k_fwd) = x.indice_dict[self.indice_key]
        assert self.kernel_size == tuple(k_fwd), \
            'inverse conv kernel must match the conv it inverts'
        fine_np = fine_indices.detach().cpu().numpy().astype(np.int64)
        table = _coord_table(x.indices)
        m = fine_np.shape[0]
        out = torch.zeros(m, self.out_channels, dtype=x.features.dtype)
        for tz, ty, tx in self._taps():
            t = np.array([tz, ty, tx], dtype=np.int64)
            num = fine_np[:, 1:] + np.array(p) - t
            ok = (num % np.array(s) == 0).all(1) & (num >= 0).all(1)
            coarse = fine_np.copy()
            coarse[:, 1:] = np.where(ok[:, None], num // np.array(s), -1)
            rows = _gather_rows(table, coarse)
            sel = (rows >= 0) & ok
            if not sel.any():
                continue
            w_t = self.weight[tz, ty, tx]
            out[sel] += x.features[torch.from_numpy(rows[sel])] @ w_t
        if self.bias is not None:
            out = out + self.bias
        return SparseConvTensor(out, fine_indices, fine_shape, x.batch_size,
                                x.indice_dict)


class SparseMaxPool3d(SparseModule):
    def __init__(self, kernel_size, stride=None, padding=0):
        super().__init__()
        self.kernel_size = _triple(kernel_size)
        self.stride = _triple(stride if stride is not None else kernel_size)
        self.padding = _triple(padding)

    def forward(self, x: SparseConvTensor):
        idx_np = x.indices.detach().cpu().numpy().astype(np.int64)
        k, s, p = self.kernel_size, self.stride, self.padding
        out_shape = [(x.spatial_shape[i] + 2 * p[i] - k[i]) // s[i] + 1
                     for i in range(3)]
        cand = set()
        taps = [(tz, ty, tx) for tz in range(k[0]) for ty in range(k[1])
                for tx in range(k[2])]
        for t in taps:
            num = idx_np[:, 1:] + np.array(p) - np.array(t)
            ok = (num % np.array(s) == 0).all(1) & (num >= 0).all(1)
            o = num // np.array(s)
            ok &= (o < np.array(out_shape)).all(1)
            for b, (oz, oy, ox) in zip(idx_np[ok, 0], o[ok]):
                cand.add((int(b), int(oz), int(oy), int(ox)))
        out_idx_np = np.array(sorted(cand), dtype=np.int64).reshape(-1, 4)
        table = _coord_table(x.indices)
        m = out_idx_np.shape[0]
        out = torch.full((m, x.features.shape[1]), -float('inf'),
                         dtype=x.features.dtype)
        for t in taps:
            in_c = out_idx_np.copy()
            in_c[:, 1:] = (out_idx_np[:, 1:] * np.array(s) - np.array(p)
                           + np.array(t))
            rows = _gather_rows(table, in_c)
            sel = rows >= 0
            if not sel.any():
                continue
            out[sel] = torch.maximum(
                out[sel], x.features[torch.from_numpy(rows[sel])])
        out[~torch.isfinite(out)] = 0.0
        return SparseConvTensor(out, torch.from_numpy(out_idx_np).int(),
                                out_shape, x.batch_size, x.indice_dict)


class SparseSequential(nn.Sequential):
    """Applies sparse modules to the tensor, dense modules to .features
    (mirrors spconv.modules.SparseSequential)."""

    def forward(self, x):
        for module in self:
            if isinstance(x, SparseConvTensor) and not isinstance(
                    module, (SparseModule, SparseSequential)):
                x = SparseConvTensor(module(x.features), x.indices,
                                     x.spatial_shape, x.batch_size,
                                     x.indice_dict)
            else:
                x = module(x)
        return x
