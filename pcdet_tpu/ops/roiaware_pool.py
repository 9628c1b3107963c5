"""RoI-aware 3D pooling — TPU-native (jnp scatter-max/mean, fixed shapes).

Replaces the reference's roiaware_pool3d CUDA extension
(pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu): instead of the
3-phase mask/collect/pool kernels with per-voxel point lists, each (roi,
point) pair is classified into its sub-voxel cell and pooled with one XLA
scatter — differentiable out of the box (scatter-add / scatter-max have
built-in VJPs), so no custom backward kernels are needed.
"""
from functools import partial

import jax
import jax.numpy as jnp


def roiaware_pool3d(rois, points, features, point_mask, out_size=14,
                    pool_method='max', roi_chunk=None):
    """Pool per-point features into each RoI's (out, out, out) grid.

    :param rois: (N, 7) [x, y, z, w, l, h, rz] lidar, z bottom center
    :param points: (P, 3) point/voxel-center coordinates
    :param features: (P, C)
    :param point_mask: (P,) bool — valid points
    :param pool_method: 'max' or 'avg'
    :return: (N, out, out, out, C) pooled features
             cell layout [x_idx, y_idx, z_idx] like the CUDA kernel
    """
    n = rois.shape[0]
    p = points.shape[0]
    c = features.shape[-1]
    o = out_size

    def pool_rois(rois_chunk):
        m = rois_chunk.shape[0]
        shift = points[None, :, :] - rois_chunk[:, None, 0:3]      # (M, P, 3)
        cosa = jnp.cos(-rois_chunk[:, 6])[:, None]
        sina = jnp.sin(-rois_chunk[:, 6])[:, None]
        lx = shift[..., 0] * cosa + shift[..., 1] * sina
        ly = -shift[..., 0] * sina + shift[..., 1] * cosa
        lz = shift[..., 2]
        w = rois_chunk[:, 3:4]
        l = rois_chunk[:, 4:5]
        h = rois_chunk[:, 5:6]
        in_box = ((jnp.abs(lx) <= w / 2) & (jnp.abs(ly) <= l / 2)
                  & (lz >= 0) & (lz <= h) & point_mask[None, :])

        eps = 1e-8
        xi = jnp.clip(((lx + w / 2) / jnp.maximum(w, eps) * o), 0,
                      o - 1).astype(jnp.int32)
        yi = jnp.clip(((ly + l / 2) / jnp.maximum(l, eps) * o), 0,
                      o - 1).astype(jnp.int32)
        zi = jnp.clip((lz / jnp.maximum(h, eps) * o), 0, o - 1).astype(jnp.int32)
        cell = (xi * o + yi) * o + zi                              # (M, P)
        roi_idx = jnp.broadcast_to(jnp.arange(m)[:, None], (m, p))
        flat = jnp.where(in_box, roi_idx * (o ** 3) + cell, m * o ** 3)

        vals = jnp.broadcast_to(features[None], (m, p, c)).reshape(-1, c)
        flat = flat.reshape(-1)

        if pool_method == 'max':
            out = jnp.full((m * o ** 3, c), -jnp.inf, features.dtype)
            out = out.at[flat].max(vals, mode='drop')
            out = jnp.where(jnp.isfinite(out), out, 0.0)
        else:
            out = jnp.zeros((m * o ** 3, c), features.dtype)
            out = out.at[flat].add(vals, mode='drop')
            cnt = jnp.zeros((m * o ** 3, 1), features.dtype)
            cnt = cnt.at[flat].add(jnp.ones_like(flat, features.dtype)[:, None],
                                   mode='drop')
            out = out / jnp.maximum(cnt, 1.0)
        return out.reshape(m, o, o, o, c)

    if roi_chunk is None or roi_chunk >= n:
        return pool_rois(rois)
    assert n % roi_chunk == 0, (n, roi_chunk)
    chunks = rois.reshape(n // roi_chunk, roi_chunk, 7)
    out = jax.lax.map(pool_rois, chunks)
    return out.reshape(n, o, o, o, c)


def points_in_boxes_batch(points, boxes, point_mask=None):
    """(P, 3) x (N, 7) -> (N, P) bool — jnp twin of the CUDA points_in_boxes."""
    from ..utils import jnp_common
    m = jnp_common.points_in_boxes(points, boxes)
    if point_mask is not None:
        m = m & point_mask[None, :]
    return m
