"""Rotated BEV box overlap / IoU — TPU-native (jnp, fixed shapes, jittable).

Replaces the reference's CUDA polygon-clipping kernels
(`pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu` box_overlap/boxes_iou_bev and
the numba-CUDA `rotate_iou.py` used by the KITTI evaluator) with a fully
vectorised formulation:

  for each box pair, the intersection of two rotated rectangles is a convex
  polygon whose vertices are (a) corners of A inside B, (b) corners of B
  inside A, (c) pairwise edge intersections — at most 24 candidates.  We
  compute all candidates with validity masks, sort by angle around the valid
  centroid, and take the shoelace area.  Everything is fixed-shape, so the
  whole thing fuses under jit (and vmaps over pair grids).

Box format here: (N, 5) = [x1, y1, x2, y2, angle] — the axis-aligned extent
before rotating by `angle` about the box center (the reference NMS format,
box_utils.boxes3d_to_bevboxes_lidar_torch).  The rotation convention matches
the reference CUDA `rotate_around_center`:
    new = [(p-c).x*cos + (p-c).y*sin, -(p-c).x*sin + (p-c).y*cos] + c
"""
import jax
import jax.numpy as jnp


def boxes5_to_corners(boxes):
    """(..., 5)[x1,y1,x2,y2,angle] -> (..., 4, 2) corners (CCW winding)."""
    x1, y1, x2, y2, ang = [boxes[..., i] for i in range(5)]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    hx, hy = (x2 - x1) / 2, (y2 - y1) / 2
    sx = jnp.asarray([1.0, -1.0, -1.0, 1.0], dtype=boxes.dtype)
    sy = jnp.asarray([1.0, 1.0, -1.0, -1.0], dtype=boxes.dtype)
    ox = hx[..., None] * sx
    oy = hy[..., None] * sy
    c, s = jnp.cos(ang)[..., None], jnp.sin(ang)[..., None]
    px = ox * c + oy * s + cx[..., None]
    py = -ox * s + oy * c + cy[..., None]
    return jnp.stack([px, py], axis=-1)


def _cross(o, a, b):
    """2D cross of (a - o) x (b - o); broadcasting over leading dims."""
    return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
            - (b[..., 0] - o[..., 0]) * (a[..., 1] - o[..., 1]))


def _points_in_quad(points, quad):
    """points (..., P, 2) inside convex CCW quad (..., 4, 2) -> (..., P) bool."""
    eps = 1e-6
    inside = None
    for i in range(4):
        v0 = quad[..., i, :][..., None, :]
        v1 = quad[..., (i + 1) % 4, :][..., None, :]
        c = _cross(v0, v1, points)
        cond = c >= -eps
        inside = cond if inside is None else (inside & cond)
    return inside


def _segment_intersections(ca, cb):
    """All 16 edge-pair intersections of two quads.

    :param ca: (..., 4, 2), :param cb: (..., 4, 2)
    :return: points (..., 16, 2), valid (..., 16)
    """
    p0 = ca                      # (..., 4, 2)
    p1 = jnp.roll(ca, -1, axis=-2)
    q0 = cb
    q1 = jnp.roll(cb, -1, axis=-2)
    # pair grid (..., 4, 4, 2)
    p0g = p0[..., :, None, :]
    p1g = p1[..., :, None, :]
    q0g = q0[..., None, :, :]
    q1g = q1[..., None, :, :]
    r = p1g - p0g
    s = q1g - q0g
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qp = q0g - p0g
    t_num = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    u_num = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    eps = 1e-8
    safe = jnp.where(jnp.abs(denom) > eps, denom, 1.0)
    t = t_num / safe
    u = u_num / safe
    valid = (jnp.abs(denom) > eps) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pt = p0g + t[..., None] * r
    batch_shape = pt.shape[:-3]
    return (pt.reshape(*batch_shape, 16, 2),
            valid.reshape(*batch_shape, 16))


def quad_intersection_area_sort(ca, cb):
    """Intersection area of two convex quads given corners (..., 4, 2) —
    24-candidate centroid-angle-sort formulation.  Kept as an independent
    cross-check; `quad_intersection_area` (edge-clip) is the default."""
    shape = jnp.broadcast_shapes(ca.shape, cb.shape)
    ca = jnp.broadcast_to(ca, shape)
    cb = jnp.broadcast_to(cb, shape)
    in_b = _points_in_quad(ca, cb)                  # (..., 4)
    in_a = _points_in_quad(cb, ca)                  # (..., 4)
    ipts, ivalid = _segment_intersections(ca, cb)   # (..., 16, 2/16)

    pts = jnp.concatenate([ca, cb, ipts], axis=-2)              # (..., 24, 2)
    valid = jnp.concatenate([in_b, in_a, ivalid], axis=-1)      # (..., 24)

    vf = valid.astype(pts.dtype)
    count = jnp.sum(vf, axis=-1, keepdims=True)                 # (..., 1)
    centroid = (jnp.sum(pts * vf[..., None], axis=-2)
                / jnp.maximum(count, 1.0))                      # (..., 2)

    ang = jnp.arctan2(pts[..., 1] - centroid[..., None, 1],
                      pts[..., 0] - centroid[..., None, 0])
    ang = jnp.where(valid, ang, jnp.inf)                        # invalid last
    order = jnp.argsort(ang, axis=-1)
    pts_sorted = jnp.take_along_axis(pts, order[..., None], axis=-2)
    valid_sorted = jnp.take_along_axis(valid, order, axis=-1)
    # park invalid slots on the first (highest-priority) vertex so the
    # shoelace wrap-around term p_{m-1} -> p_0 appears exactly once and the
    # remaining degenerate edges contribute zero area.
    first = pts_sorted[..., 0:1, :]
    pts_fixed = jnp.where(valid_sorted[..., None], pts_sorted, first)

    nxt = jnp.roll(pts_fixed, -1, axis=-2)
    area2 = jnp.sum(pts_fixed[..., 0] * nxt[..., 1]
                    - nxt[..., 0] * pts_fixed[..., 1], axis=-1)
    area = 0.5 * jnp.abs(area2)
    return jnp.where(count[..., 0] >= 3, area, 0.0)


def _edge_clip_contrib(p, q, eps_side):
    """Green's-theorem contribution of polygon `p`'s edges restricted to the
    interior of convex CCW quad `q`: sum over edges of INT_{edge∩q} x dy.

    Each edge is clipped to a parameter interval [s_lo, s_hi] against q's 4
    half-planes (pure elementwise — no vertex enumeration, no ordering).
    `eps_side` sets the boundary convention: +eps counts edges lying ON
    partner boundary as inside, -eps excludes them — used asymmetrically so
    a shared boundary (identical boxes) is traversed exactly once.

    :param p: (..., 4, 2) CCW corners; :param q: (..., 4, 2) CCW corners
    :return: (...,) signed area contribution
    """
    tiny = 1e-12
    p0 = p
    d = jnp.roll(p, -1, axis=-2) - p                       # (..., 4, 2)
    q0 = q[..., None, :, :]                                # (..., 1, 4, 2)
    e = jnp.roll(q, -1, axis=-2)[..., None, :, :] - q0     # q edge vectors

    # f(s) = f0 + s * fd per (p-edge i, q-edge j): inside q iff f >= -eps
    rel = p0[..., :, None, :] - q0                         # (..., 4, 4, 2)
    f0 = e[..., 0] * rel[..., 1] - e[..., 1] * rel[..., 0]
    fd = (e[..., 0] * d[..., :, None, 1]
          - e[..., 1] * d[..., :, None, 0])                # (..., 4, 4)

    bound = (-eps_side - f0) / jnp.where(jnp.abs(fd) > tiny, fd, 1.0)
    pos = fd > tiny
    neg = fd < -tiny
    s_lo = jnp.max(jnp.where(pos, bound, 0.0), axis=-1)
    s_hi = jnp.min(jnp.where(neg, bound, 1.0), axis=-1)
    para_ok = jnp.all((jnp.abs(fd) > tiny) | (f0 >= -eps_side), axis=-1)

    s_lo = jnp.clip(s_lo, 0.0, 1.0)
    s_hi = jnp.clip(s_hi, 0.0, 1.0)
    ds = jnp.maximum(s_hi - s_lo, 0.0)
    live = para_ok & (ds > 1e-6)

    x0 = p0[..., 0]
    dx = d[..., 0]
    dy = d[..., 1]
    integral = dy * (x0 * ds + 0.5 * dx * (s_hi + s_lo) * ds)
    return (jnp.sum(jnp.where(live, integral, 0.0), axis=-1),
            jnp.sum(live, axis=-1))


def quad_intersection_area(ca, cb, eps=1e-7):
    """Intersection area by Green's theorem over clipped edges — ~10x fewer
    ops than the 24-candidate sort formulation (quad_intersection_area_sort):
    area(A∩B) = SUM_{e in dA} INT_{e∩B} x dy + SUM_{e in dB} INT_{e∩A} x dy.
    The asymmetric boundary epsilon makes shared boundaries count once.
    """
    shape = jnp.broadcast_shapes(ca.shape, cb.shape)
    ca = jnp.broadcast_to(ca, shape)
    cb = jnp.broadcast_to(cb, shape)
    a1, n1 = _edge_clip_contrib(ca, cb, eps)
    a2, n2 = _edge_clip_contrib(cb, ca, -eps)
    # a nonempty 2D intersection is a convex polygon with >= 3 boundary
    # arcs; fewer arcs = degenerate touching (open traversal, bogus area)
    return jnp.where(n1 + n2 >= 3, jnp.maximum(a1 + a2, 0.0), 0.0)


def _pairwise(fn, boxes_a, boxes_b, row_chunk=None):
    """Apply a pair fn over the (N, K) grid, optionally chunking rows."""
    ca = boxes5_to_corners(boxes_a)      # (N, 4, 2)
    cb = boxes5_to_corners(boxes_b)      # (K, 4, 2)

    def rows(ca_chunk):
        return fn(ca_chunk[:, None], cb[None, :])

    if row_chunk is None:
        return rows(ca)
    n = ca.shape[0]
    assert n % row_chunk == 0, (n, row_chunk)
    ca_r = ca.reshape(n // row_chunk, row_chunk, 4, 2)
    out = jax.lax.map(rows, ca_r)
    return out.reshape(n, -1)


def boxes_overlap_bev(boxes_a, boxes_b, row_chunk=None):
    """(N,5) x (K,5) -> (N,K) rotated intersection areas.

    TPU equivalent of iou3d_nms_cuda.boxes_overlap_bev_gpu.
    """
    return _pairwise(quad_intersection_area, boxes_a, boxes_b, row_chunk)


def boxes_iou_bev(boxes_a, boxes_b, row_chunk=None):
    """(N,5) x (K,5) -> (N,K) rotated BEV IoU (iou3d_nms_kernel.cu:237-248)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b, row_chunk)
    area_a = ((boxes_a[:, 2] - boxes_a[:, 0])
              * (boxes_a[:, 3] - boxes_a[:, 1]))[:, None]
    area_b = ((boxes_b[:, 2] - boxes_b[:, 0])
              * (boxes_b[:, 3] - boxes_b[:, 1]))[None, :]
    return overlap / jnp.maximum(area_a + area_b - overlap, 1e-8)


def boxes_iou3d(boxes_a, boxes_b, row_chunk=None):
    """3D IoU of (N,7) x (K,7) lidar boxes [x,y,z,w,l,h,ry], z bottom center.

    BEV rotated overlap x z-extent overlap over union of volumes
    (reference iou3d_nms_utils.boxes_iou3d_gpu).
    """
    from ..utils import jnp_common
    bev_a = jnp_common.boxes3d_to_bev_corner_format(boxes_a)
    bev_b = jnp_common.boxes3d_to_bev_corner_format(boxes_b)
    overlaps_bev = boxes_overlap_bev(bev_a, bev_b, row_chunk)

    a_zmin, a_zmax = boxes_a[:, 2], boxes_a[:, 2] + boxes_a[:, 5]
    b_zmin, b_zmax = boxes_b[:, 2], boxes_b[:, 2] + boxes_b[:, 5]
    overlaps_h = jnp.clip(jnp.minimum(a_zmax[:, None], b_zmax[None, :])
                          - jnp.maximum(a_zmin[:, None], b_zmin[None, :]),
                          min=0)
    overlaps_3d = overlaps_bev * overlaps_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlaps_3d / jnp.maximum(vol_a + vol_b - overlaps_3d, 1e-6)


def rotate_iou_eval(boxes_a, boxes_b, criterion=-1):
    """Eval-time rotated IoU on [x, y, dx, dy, angle] center-format boxes.

    Mirrors the numba-CUDA `rotate_iou_gpu_eval`
    (kitti_object_eval_python/rotate_iou.py:262-329):
      criterion -1: intersection / union
      criterion  0: intersection / area_a
      criterion  1: intersection / area_b

    NOTE the eval code passes camera-frame boxes whose rotation convention is
    the same polygon geometry; the sign convention of `angle` only flips the
    winding, which the area (absolute value) is invariant to.
    """
    def to5(b):
        x, y, dx, dy, ang = [b[..., i] for i in range(5)]
        return jnp.stack([x - dx / 2, y - dy / 2, x + dx / 2, y + dy / 2, ang],
                         axis=-1)

    b5a, b5b = to5(boxes_a), to5(boxes_b)
    inter = boxes_overlap_bev(b5a, b5b)
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    if criterion == -1:
        denom = area_a + area_b - inter
    elif criterion == 0:
        denom = area_a * jnp.ones_like(inter)
    elif criterion == 1:
        denom = area_b * jnp.ones_like(inter)
    else:
        raise ValueError(criterion)
    return inter / jnp.maximum(denom, 1e-8)
