"""Voxel feature extractors (flax).

Parity targets: reference pcdet/models/vfe/vfe_utils.py.
All inputs are fixed-shape batched arrays:
  voxels      (B, V, P, C)  — P = max points per voxel, zero padded
  num_points  (B, V) int32
  coords      (B, V, 3) int32 ZYX (-1 rows = padding voxels)
  voxel_mask  (B, V) bool
"""
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import TorchBatchNorm, TorchLinear


class MeanVFE(nn.Module):
    """Mean of points per voxel (reference MeanVoxelFeatureExtractor:19-34)."""

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_mask, train: bool):
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
        mean = voxels.sum(axis=2) / denom
        return mean * voxel_mask[..., None].astype(voxels.dtype)   # (B, V, C)


class PFNLayer(nn.Module):
    """Linear -> BN -> ReLU -> max over points (reference PFNLayer:60-116)."""
    out_channels: int
    use_norm: bool = True
    last_layer: bool = True

    @nn.compact
    def __call__(self, x, voxel_mask, train: bool):
        # x: (B, V, P, C)
        units = self.out_channels if self.last_layer else self.out_channels // 2
        x = TorchLinear(units, use_bias=not self.use_norm)(x)
        if self.use_norm:
            # stats over all point rows of *real* voxels (the reference has no
            # padding voxels; padded point slots are zeros there too and DO
            # enter its statistics, so we mask voxels, not point slots)
            b, v, p, c = x.shape
            bn = TorchBatchNorm(units)
            if (not train) and self.last_layer:
                # HBM diet (chip r5e hbm-ops dump: the (B,V,P,C) f32 BN/ReLU
                # chain is PointPillar eval's top byte consumer).  Eval BN is
                # a per-channel monotone affine and ReLU is monotone, so the
                # max over points commutes onto the P-reduced tensor:
                #   max_p relu(bn(h_p)) == relu(max(bn(max_p h), bn(min_p h)))
                # (whichever branch wins IS bn of the selected extremum, i.e.
                # the exact same float ops — bit-identical to the stock path).
                # Every elementwise op thus runs on (B,V,C), 32x fewer bytes;
                # only the linear's output and one fused max/min pass touch
                # the whale.  Training keeps the stock path (batch stats).
                hmax = jnp.max(x, axis=2)
                hmin = jnp.min(x, axis=2)
                y = jnp.maximum(bn(hmax, train), bn(hmin, train))
                return jax.nn.relu(y)                         # (B, V, units)
            mask_rows = jnp.broadcast_to(voxel_mask[..., None], (b, v, p))
            x = bn(x, train, mask=mask_rows)
        elif (not train) and self.last_layer:
            # same commute without BN: max_p relu(h) == relu(max_p h)
            return jax.nn.relu(jnp.max(x, axis=2))
        x = jax.nn.relu(x)
        x_max = jnp.max(x, axis=2, keepdims=True)
        if self.last_layer:
            return x_max[..., 0, :]                               # (B, V, units)
        rep = jnp.broadcast_to(x_max, x.shape[:2] + (x.shape[2], units))
        return jnp.concatenate([x, rep], axis=-1)


class PillarFeatureNet(nn.Module):
    """PillarFeatureNetOld2: decorate points with cluster/center offsets, mask
    padding, run PFN layers (reference vfe_utils.py:118-215).
    """
    num_filters: Sequence[int] = (64,)
    use_norm: bool = True
    with_distance: bool = False
    voxel_size: Sequence[float] = (0.16, 0.16, 4.0)
    pc_range: Sequence[float] = (0, -39.68, -3, 69.12, 39.68, 1)

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_mask, train: bool):
        # voxels: (B, V, P, C>=3); coords (B, V, 3) ZYX
        dtype = voxels.dtype
        vx, vy, vz = self.voxel_size
        x_off = vx / 2 + self.pc_range[0]
        y_off = vy / 2 + self.pc_range[1]
        z_off = vz / 2 + self.pc_range[2]

        nv = jnp.maximum(num_points, 1).astype(dtype)[..., None, None]
        points_mean = voxels[..., :3].sum(axis=2, keepdims=True) / nv
        f_cluster = voxels[..., :3] - points_mean

        cz = coords[..., 0:1].astype(dtype) * vz + z_off
        cy = coords[..., 1:2].astype(dtype) * vy + y_off
        cx = coords[..., 2:3].astype(dtype) * vx + x_off
        f_center = jnp.stack([
            voxels[..., 0] - cx,
            voxels[..., 1] - cy,
            voxels[..., 2] - cz,
        ], axis=-1)

        feats = [voxels, f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        features = jnp.concatenate(feats, axis=-1)

        # zero out padded point slots AND padding voxels
        p = voxels.shape[2]
        slot_ids = jnp.arange(p, dtype=jnp.int32)
        pt_mask = slot_ids[None, None, :] < num_points[..., None]
        pt_mask = pt_mask & voxel_mask[..., None]
        features = features * pt_mask[..., None].astype(dtype)

        n = len(self.num_filters)
        for i, nf in enumerate(self.num_filters):
            features = PFNLayer(nf, self.use_norm, last_layer=(i == n - 1))(
                features, voxel_mask, train)
        return features * voxel_mask[..., None].astype(dtype)     # (B, V, C_out)
