"""Scatter pillar features to a dense BEV canvas.

Reference: pcdet/models/rpn/pillar_scatter.py (per-sample index_put on a
(C, ny*nx) canvas).  Here: one XLA scatter per batch with mode='drop' for
padding voxels — fixed shape, fully fused under jit, NHWC output.
"""
import jax.numpy as jnp


def pillar_scatter(features, coords, voxel_mask, ny, nx):
    """
    :param features: (B, V, C)
    :param coords: (B, V, 3) int32 ZYX (-1 for padding)
    :param voxel_mask: (B, V) bool
    :return: (B, ny, nx, C) canvas (NHWC)
    """
    b, v, c = features.shape
    flat_idx = coords[..., 1] * nx + coords[..., 2]               # (B, V)
    flat_idx = jnp.where(voxel_mask, flat_idx, ny * nx)           # drop slot
    canvas = jnp.zeros((b, ny * nx, c), features.dtype)
    canvas = canvas.at[jnp.arange(b)[:, None], flat_idx].set(features,
                                                             mode='drop')
    return canvas.reshape(b, ny, nx, c)
