"""Host-side (numpy) math/geometry helpers + logging + seeding.

Numpy twins of the reference's `pcdet/utils/common_utils.py` (behavioural
parity is asserted in tests/test_common.py).  Device-side (jnp) twins live in
`jnp_common.py` so that importing this module never pulls in JAX (dataloader
worker processes stay JAX-free).
"""
import logging
import os
import random

import numpy as np


def rotate_pc_along_z(pc, rot_angle):
    """Rotate (in-place) the XY coordinates of `pc` (N, 3+C) by `rot_angle` (rad).

    Uses the reference convention `pc[:, :2] @ [[c, -s], [s, c]]`
    (reference: pcdet/utils/common_utils.py:11-21).
    """
    cosval = np.cos(rot_angle)
    sinval = np.sin(rot_angle)
    rotmat = np.array([[cosval, -sinval], [sinval, cosval]])
    pc[:, 0:2] = np.dot(pc[:, 0:2], rotmat)
    return pc


def rotate_points_along_z_batch(points, angles):
    """Rotate batched points (N, P, 3+C) by per-row angles (N,).

    Same convention as `rotate_pc_along_z` (row-vector @ [[c,-s],[s,c]]).
    """
    cosa = np.cos(angles).reshape(-1, 1, 1)
    sina = np.sin(angles).reshape(-1, 1, 1)
    x, y = points[..., 0:1], points[..., 1:2]
    xr = x * cosa + y * sina
    yr = -x * sina + y * cosa
    return np.concatenate([xr, yr, points[..., 2:]], axis=-1)


def mask_points_by_range(points, limit_range):
    """Keep points inside the XY extent of `limit_range` [x0,y0,z0,x1,y1,z1].

    (reference: pcdet/utils/common_utils.py:47-51 — XY only, inclusive.)
    """
    mask = (points[:, 0] >= limit_range[0]) & (points[:, 0] <= limit_range[3]) \
        & (points[:, 1] >= limit_range[1]) & (points[:, 1] <= limit_range[4])
    return points[mask]


def enlarge_box3d(boxes3d, extra_width):
    """Grow boxes (N, 7)[x,y,z,w,l,h,r] by `extra_width` on every side.

    z is the bottom center so it moves down by extra_width
    (reference: pcdet/utils/common_utils.py:54-64).
    """
    large = np.array(boxes3d, copy=True)
    large[:, 3:6] += extra_width * 2
    large[:, 2] -= extra_width
    return large


def drop_info_with_name(info, name):
    keep = [i for i, x in enumerate(info['name']) if x != name]
    return {k: v[keep] for k, v in info.items()}


def drop_arrays_by_name(gt_names, used_classes):
    inds = [i for i, x in enumerate(gt_names) if x not in used_classes]
    return np.array(inds, dtype=np.int64)


def keep_arrays_by_name(gt_names, used_classes):
    inds = [i for i, x in enumerate(gt_names) if x in used_classes]
    return np.array(inds, dtype=np.int64)


def limit_period(val, offset=0.5, period=np.pi):
    """val - floor(val / period + offset) * period  (numpy)."""
    return val - np.floor(val / period + offset) * period


def dict_select(dict_src, inds):
    for key, val in dict_src.items():
        if isinstance(val, dict):
            dict_select(val, inds)
        else:
            dict_src[key] = val[inds]


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(__name__ + ('_rank%d' % rank))
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    formatter = logging.Formatter('%(asctime)s  %(levelname)5s  %(message)s')
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else logging.ERROR)
        console.setFormatter(formatter)
        logger.addHandler(console)
        if log_file is not None:
            fh = logging.FileHandler(filename=log_file)
            fh.setLevel(log_level if rank == 0 else logging.ERROR)
            fh.setFormatter(formatter)
            logger.addHandler(fh)
    return logger


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def get_pad_params(desired_size, cur_size):
    assert desired_size >= cur_size
    return 0, desired_size - cur_size


def pad_or_trim_to(x, target_rows, pad_value=0):
    """Pad (with pad_value) or trim the leading axis of `x` to `target_rows`."""
    n = x.shape[0]
    if n == target_rows:
        return x
    if n > target_rows:
        return x[:target_rows]
    pad_shape = (target_rows - n,) + x.shape[1:]
    pad = np.full(pad_shape, pad_value, dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)
