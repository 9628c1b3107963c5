"""Device-side (jnp) math helpers — twins of `common.py` for use inside jit."""
import jax.numpy as jnp


def limit_period(val, offset=0.5, period=jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def rotate_points_along_z(points, angles):
    """Rotate batched points (..., P, 3+C) by angles (...,).

    Row-vector convention matching common.rotate_pc_along_z:
    [x, y] @ [[c, -s], [s, c]].
    """
    cosa = jnp.cos(angles)[..., None, None]
    sina = jnp.sin(angles)[..., None, None]
    x, y = points[..., 0:1], points[..., 1:2]
    xr = x * cosa + y * sina
    yr = -x * sina + y * cosa
    return jnp.concatenate([xr, yr, points[..., 2:]], axis=-1)


def boxes3d_to_corners3d_lidar(boxes3d, bottom_center=True):
    """Boxes (..., 7) -> corners (..., 8, 3). jnp twin of box_np_ops."""
    w, l, h = boxes3d[..., 3], boxes3d[..., 4], boxes3d[..., 5]
    x_sign = jnp.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=boxes3d.dtype)
    y_sign = jnp.array([-1, -1, 1, 1, -1, -1, 1, 1], dtype=boxes3d.dtype)
    x_c = (w / 2)[..., None] * x_sign
    y_c = (l / 2)[..., None] * y_sign
    if bottom_center:
        z_sign = jnp.array([0, 0, 0, 0, 1, 1, 1, 1], dtype=boxes3d.dtype)
        z_c = h[..., None] * z_sign
    else:
        z_sign = jnp.array([-1, -1, -1, -1, 1, 1, 1, 1], dtype=boxes3d.dtype)
        z_c = (h / 2)[..., None] * z_sign
    ry = boxes3d[..., 6]
    cosa, sina = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    xr = x_c * cosa + y_c * sina
    yr = -x_c * sina + y_c * cosa
    x = boxes3d[..., 0:1] + xr
    y = boxes3d[..., 1:2] + yr
    z = boxes3d[..., 2:3] + z_c
    return jnp.stack([x, y, z], axis=-1)


def boxes3d_to_bev_corner_format(boxes3d):
    """(..., 7) -> (..., 5)[x1,y1,x2,y2,ry] (jnp twin; see box_np_ops)."""
    cu, cv = boxes3d[..., 0], boxes3d[..., 1]
    half_l, half_w = boxes3d[..., 4] / 2.0, boxes3d[..., 3] / 2.0
    return jnp.stack([cu - half_w, cv - half_l, cu + half_w, cv + half_l,
                      boxes3d[..., 6]], axis=-1)


def points_in_boxes(points, boxes3d):
    """(P, 3), (N, 7) -> (N, P) bool mask; jnp twin of box_np_ops.points_in_boxes_mask."""
    shift = points[None, :, :3] - boxes3d[:, None, 0:3]
    cosa = jnp.cos(-boxes3d[:, 6])[:, None]
    sina = jnp.sin(-boxes3d[:, 6])[:, None]
    lx = shift[..., 0] * cosa + shift[..., 1] * sina
    ly = -shift[..., 0] * sina + shift[..., 1] * cosa
    lz = shift[..., 2]
    return ((jnp.abs(lx) <= boxes3d[:, 3:4] / 2)
            & (jnp.abs(ly) <= boxes3d[:, 4:5] / 2)
            & (lz >= 0) & (lz <= boxes3d[:, 5:6]))
