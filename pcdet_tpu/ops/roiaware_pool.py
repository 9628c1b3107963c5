"""RoI-aware 3D pooling — TPU-native (jnp scatter-max/mean, fixed shapes).

Replaces the reference's roiaware_pool3d CUDA extension
(pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu): instead of the
3-phase mask/collect/pool kernels with per-voxel point lists, each (roi,
point) pair is classified into its sub-voxel cell and pooled with one XLA
scatter — differentiable out of the box (scatter-add / scatter-max have
built-in VJPs), so no custom backward kernels are needed.
"""

import jax
import jax.numpy as jnp


def roiaware_pool3d(rois, points, features, point_mask, out_size=14,
                    pool_method='max', roi_chunk=None, max_pts_per_roi=None):
    """Pool per-point features into each RoI's (out, out, out) grid.

    :param rois: (N, 7) [x, y, z, w, l, h, rz] lidar, z bottom center
    :param points: (P, 3) point/voxel-center coordinates
    :param features: (P, C)
    :param point_mask: (P,) bool — valid points
    :param pool_method: 'max' or 'avg'
    :param max_pts_per_roi: static cap K: gather the first K in-box points
        per roi (top-k compaction) and pool only those.  Turns the scatter
        from N*P rows into N*K (32x at N=512, P=16k) — XLA scatters are the
        TPU bottleneck here.  Exact whenever every roi holds <= K active
        points (LiDAR surfaces put O(100) voxels in a car-sized box; the
        CUDA kernel caps per-CELL at 128 pts similarly).  None = exact
        all-pairs path.
    :return: (N, out, out, out, C) pooled features
             cell layout [x_idx, y_idx, z_idx] like the CUDA kernel
    """
    n = rois.shape[0]
    p = points.shape[0]
    c = features.shape[-1]
    o = out_size

    if max_pts_per_roi is not None:
        return _pool_compacted(rois, points, features, point_mask, o,
                               pool_method, int(max_pts_per_roi))

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


def _roi_local_cells(rois, pts, o):
    """Canonical-frame cell index + in-box test for (..., N, K, 3) points vs
    their (..., N, 7) rois (arbitrary leading batch dims)."""
    shift = pts - rois[..., :, None, 0:3]                         # (N, K, 3)
    cosa = jnp.cos(-rois[..., :, 6])[..., :, None]
    sina = jnp.sin(-rois[..., :, 6])[..., :, None]
    lx = shift[..., 0] * cosa + shift[..., 1] * sina
    ly = -shift[..., 0] * sina + shift[..., 1] * cosa
    lz = shift[..., 2]
    w = rois[..., :, 3:4]
    l = rois[..., :, 4:5]
    h = rois[..., :, 5:6]
    in_box = ((jnp.abs(lx) <= w / 2) & (jnp.abs(ly) <= l / 2)
              & (lz >= 0) & (lz <= h))
    eps = 1e-8
    xi = jnp.clip(((lx + w / 2) / jnp.maximum(w, eps) * o), 0,
                  o - 1).astype(jnp.int32)
    yi = jnp.clip(((ly + l / 2) / jnp.maximum(l, eps) * o), 0,
                  o - 1).astype(jnp.int32)
    zi = jnp.clip((lz / jnp.maximum(h, eps) * o), 0, o - 1).astype(jnp.int32)
    return (xi * o + yi) * o + zi, in_box


def _pool_compacted(rois, points, features, point_mask, o, pool_method, k):
    """Top-k compaction path (see roiaware_pool3d_multi)."""
    (out,) = roiaware_pool3d_multi(rois, points,
                                   [(features, pool_method)],
                                   point_mask, out_size=o, max_pts_per_roi=k)
    return out


def roiaware_pool3d_multi(rois, points, feature_specs, point_mask,
                          out_size=14, max_pts_per_roi=512):
    """Pool SEVERAL feature sets over the same (rois, points) geometry in
    one pass: in-box selection + per-roi sort by cell are shared, each
    feature set gets its own segmented-scan reduction.

    Pipeline (all fixed shape, no non-unique scatters — XLA TPU scatters
    serialized at ~1 ms / 1k rows were the Part-A² bottleneck):
      1. in-box test (N, P), first-k compaction via top_k        (~20 ms)
      2. per-roi argsort by cell id                              (shared)
      3. per (features, method): gather + log-depth segmented
         associative scan (sum or max over each cell's segment)
      4. one unique-index set per segment end into (N, o^3, C)

    :param feature_specs: list of (features (P, C_i), 'avg'|'max')
    :return: list of (N, o, o, o, C_i) pooled grids
    """
    outs = roiaware_pool3d_multi_batched(
        rois[None], points[None],
        [(f[None], m) for f, m in feature_specs],
        point_mask[None], out_size=out_size,
        max_pts_per_roi=max_pts_per_roi)
    return [o[0] for o in outs]


def roiaware_pool3d_multi_batched(rois, points, feature_specs, point_mask,
                                  out_size=14, max_pts_per_roi=512,
                                  return_overflow=False):
    """Batched roiaware_pool3d_multi: one pass for the whole batch.

    Round-2 mapped the per-sample pool under lax.map (~0.17 s/sample
    SERIAL — a major term of the Part-A² B8 train cliff); every step here
    (top_k, argsort, segmented scan, one unique-index scatter) carries the
    leading batch axis natively.

    :param rois: (B, N, 7), :param points: (B, P, 3)
    :param feature_specs: list of ((B, P, C_i) features, 'avg'|'max')
    :param point_mask: (B, P) bool
    :param return_overflow: also return the total number of in-box points
        beyond the max_pts_per_roi compaction cap (silent-truncation
        telemetry; exactness holds only when this is 0)
    :return: list of (B, N, o, o, o, C_i) pooled grids
             (+ overflow scalar int32 when return_overflow)
    """
    b, n = rois.shape[0], rois.shape[1]
    o = out_size
    p = points.shape[1]
    k = min(int(max_pts_per_roi), p)

    # (B, N, P) in-box mask in the roi frame (geometry only)
    cell_all, in_box_all = _roi_local_cells(rois, points[:, None, :, :], o)
    in_box_all = in_box_all & point_mask[:, None, :]

    # first k in-box point indices per roi: top_k over descending rank
    rank = jnp.where(in_box_all, jnp.arange(p, dtype=jnp.int32)[None, None, :],
                     jnp.iinfo(jnp.int32).max)
    topv, topi = jax.lax.top_k(-rank, k)                          # (B, N, k)
    sel_valid = topv != -jnp.iinfo(jnp.int32).max
    sel = jnp.where(sel_valid, topi, 0)                           # (B, N, k)

    cell = jnp.take_along_axis(cell_all, sel, axis=2)             # (B, N, k)
    # pads route to a sentinel cell so they sort last and never write
    cell = jnp.where(sel_valid, cell, o ** 3)

    order = jnp.argsort(cell, axis=2)                             # stable
    cell_s = jnp.take_along_axis(cell, order, axis=2)
    sel_s = jnp.take_along_axis(sel, order, axis=2)

    new_seg = jnp.concatenate(
        [jnp.ones((b, n, 1), bool), cell_s[..., 1:] != cell_s[..., :-1]],
        axis=2)
    is_end = jnp.concatenate(
        [cell_s[..., 1:] != cell_s[..., :-1], jnp.ones((b, n, 1), bool)],
        axis=2)
    slot_idx = (jnp.arange(b)[:, None, None] * n
                + jnp.arange(n)[None, :, None])                   # (B, N, 1)
    write = is_end & (cell_s < o ** 3)
    flat = jnp.where(write, slot_idx * (o ** 3) + cell_s,
                     b * n * o ** 3).reshape(-1)

    cnt = None
    outs = []
    for features, pool_method in feature_specs:
        c = features.shape[-1]
        vals_s = jnp.take_along_axis(
            features, sel_s.reshape(b, n * k)[..., None],
            axis=1).reshape(b, n, k, c)                           # (B, N, k, C)
        flags = jnp.broadcast_to(new_seg[..., None], vals_s.shape)

        if pool_method == 'max':
            def op(a, bb):
                fa, va = a
                fb, vb = bb
                return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))
            _, red = jax.lax.associative_scan(op, (flags, vals_s), axis=2)
        else:
            def op(a, bb):
                fa, va = a
                fb, vb = bb
                return fa | fb, jnp.where(fb, vb, va + vb)
            _, red = jax.lax.associative_scan(op, (flags, vals_s), axis=2)
            if cnt is None:
                ones = jnp.ones_like(vals_s[..., :1])
                _, cnt = jax.lax.associative_scan(
                    op, (flags[..., :1], ones), axis=2)
            red = red / jnp.maximum(cnt, 1.0)

        out = jnp.zeros((b * n * o ** 3, c), features.dtype)
        out = out.at[flat].set(red.reshape(-1, c), mode='drop',
                               unique_indices=True)
        outs.append(out.reshape(b, n, o, o, o, c))
    if return_overflow:
        n_in_box = in_box_all.sum(axis=2)                         # (B, N)
        overflow = jnp.maximum(n_in_box - k, 0).sum().astype(jnp.int32)
        return outs, overflow
    return outs


def points_in_boxes_batch(points, boxes, point_mask=None):
    """(P, 3) x (N, 7) -> (N, P) bool — jnp twin of the CUDA points_in_boxes."""
    from ..utils import jnp_common
    m = jnp_common.points_in_boxes(points, boxes)
    if point_mask is not None:
        m = m & point_mask[None, :]
    return m
