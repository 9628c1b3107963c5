"""Point-cloud voxelization.

Two implementations:

* `VoxelGenerator` — host-side vectorised numpy, replacing the external
  `spconv.utils.VoxelGenerator` C++ op used by the reference data pipeline
  (reference usage: pcdet/datasets/kitti/kitti_dataset.py:673-688,
  pcdet/datasets/dataset.py:162-181).  Keeps spconv's semantics: points are
  consumed in order, voxels are created in first-appearance order, capped at
  `max_voxels`, points per voxel capped at `max_num_points`; coordinates are
  returned in ZYX order.  Also emits the fork's
  `voxel_pt_indices_into_original_pt_cloud` gather map (experiments.py:228-241)
  enabling differentiable re-voxelization on device.

* `voxelize_jnp` — fully on-device (jit/vmap-able) fixed-shape voxelizer via
  sort + segment ranking + scatter, used by the TPU inference path
  (raw scan -> boxes entirely on device) and by the differentiable
  voxelization hook.  Voxels come out ordered by linear voxel id rather than
  first appearance; all downstream consumers are order-invariant.
"""
import numpy as np


class VoxelGenerator:
    def __init__(self, voxel_size, point_cloud_range, max_num_points,
                 max_voxels=20000, full_mean=False):
        self.voxel_size = np.asarray(voxel_size, dtype=np.float32)
        self.point_cloud_range = np.asarray(point_cloud_range, dtype=np.float32)
        grid_size = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) \
            / self.voxel_size
        self.grid_size = np.round(grid_size).astype(np.int64)
        self.max_num_points = int(max_num_points)
        self.max_voxels = int(max_voxels)
        assert not full_mean

    def generate(self, points, max_voxels=None, pad_to_max=False):
        """Voxelize `points` (P, C); xyz must be the first 3 channels.

        :return: dict with
            voxels:  (N, max_num_points, C) float32
            coordinates: (N, 3) int32, ZYX order
            num_points_per_voxel: (N,) int32
            voxel_pt_indices_into_original_pt_cloud: (N, max_num_points) int64,
                -1 padded
        where N = num_voxels (or max_voxels when pad_to_max).
        """
        max_voxels = max_voxels or self.max_voxels
        points = np.asarray(points)
        p = points.shape[0]

        # native single-pass hash voxelizer (pcdet_tpu/native), ~10x the
        # numpy path; falls back transparently when g++ is unavailable
        from .. import native
        out = native.voxelize(points.astype(np.float32, copy=False),
                              self.voxel_size, self.point_cloud_range[:3],
                              self.grid_size, self.max_num_points, max_voxels)
        if out is not None:
            if not pad_to_max:
                n = out['num_voxels']
                out = {k: (v[:n] if isinstance(v, np.ndarray) else v)
                       for k, v in out.items()}
            return out

        grid = self.grid_size                                    # [nx, ny, nz]
        coords_f = (points[:, :3] - self.point_cloud_range[:3]) / self.voxel_size
        coords = np.floor(coords_f).astype(np.int64)             # (P, 3) xyz
        in_range = ((coords >= 0) & (coords < grid[None, :])).all(axis=1)

        pt_idx = np.flatnonzero(in_range)
        c = coords[pt_idx]
        lin = (c[:, 2] * grid[1] + c[:, 1]) * grid[0] + c[:, 0]  # z-major

        # voxels in first-appearance order (spconv semantics)
        uniq, first_idx, inverse = np.unique(lin, return_index=True,
                                             return_inverse=True)
        order = np.argsort(first_idx, kind='stable')
        rank = np.empty(len(uniq), dtype=np.int64)
        rank[order] = np.arange(len(uniq))
        vidx = rank[inverse]                                     # (Pv,)

        # slot within voxel, in original point order
        sort_idx = np.argsort(vidx, kind='stable')
        sorted_v = vidx[sort_idx]
        if len(sorted_v):
            grp_change = np.flatnonzero(np.diff(sorted_v)) + 1
            grp_start = np.concatenate([[0], grp_change])
            grp_len = np.diff(np.concatenate([grp_start, [len(sorted_v)]]))
            within_sorted = np.arange(len(sorted_v)) - np.repeat(grp_start, grp_len)
        else:
            within_sorted = np.zeros(0, dtype=np.int64)
        slot = np.empty_like(within_sorted)
        slot[sort_idx] = within_sorted

        keep = (vidx < max_voxels) & (slot < self.max_num_points)
        num_voxels = int(min(len(uniq), max_voxels))
        n_rows = max_voxels if pad_to_max else num_voxels

        voxels = np.zeros((n_rows, self.max_num_points, points.shape[1]),
                          dtype=points.dtype)
        indices = np.full((n_rows, self.max_num_points), -1, dtype=np.int64)
        kept_v = vidx[keep]
        kept_s = slot[keep]
        kept_pt = pt_idx[keep]
        voxels[kept_v, kept_s] = points[kept_pt]
        indices[kept_v, kept_s] = kept_pt
        num_points = np.zeros(n_rows, dtype=np.int32)
        np.add.at(num_points, kept_v, 1)

        coordinates = np.zeros((n_rows, 3), dtype=np.int32)
        uniq_in_order = uniq[order][:num_voxels]
        zz = uniq_in_order // (grid[1] * grid[0])
        rem = uniq_in_order % (grid[1] * grid[0])
        yy = rem // grid[0]
        xx = rem % grid[0]
        coordinates[:num_voxels] = np.stack([zz, yy, xx], axis=1)

        return {
            'voxels': voxels,
            'coordinates': coordinates,
            'num_points_per_voxel': num_points,
            'num_voxels': num_voxels,
            'voxel_pt_indices_into_original_pt_cloud': indices,
        }


def voxelize_jnp(points, point_mask, voxel_size, point_cloud_range,
                 max_num_points, max_voxels):
    """On-device fixed-shape voxelizer (jit-able; differentiable w.r.t. points
    through the emitted gather indices).

    :param points: (P, C) f32 — fixed-size, padded
    :param point_mask: (P,) bool — True for real points
    :return: dict of fixed-shape arrays:
        voxels (max_voxels, max_num_points, C),
        coordinates (max_voxels, 3) int32 ZYX (-1 rows for empty),
        num_points_per_voxel (max_voxels,) int32,
        voxel_mask (max_voxels,) bool,
        point_voxel_idx (P,) int32 — voxel row of each point (-1 = dropped),
        pt_indices (max_voxels, max_num_points) int32 — gather map, -1 pad.
    """
    import jax
    import jax.numpy as jnp

    voxel_size = jnp.asarray(voxel_size, jnp.float32)
    pc_range = jnp.asarray(point_cloud_range, jnp.float32)
    grid = jnp.round((pc_range[3:6] - pc_range[0:3]) / voxel_size).astype(jnp.int32)
    p = points.shape[0]

    coords = jnp.floor((points[:, :3] - pc_range[:3]) / voxel_size).astype(jnp.int32)
    in_range = ((coords >= 0) & (coords < grid[None, :])).all(axis=1) & point_mask
    nx, ny, nz = grid[0], grid[1], grid[2]
    lin = (coords[:, 2] * ny + coords[:, 1]) * nx + coords[:, 0]
    big = nx * ny * nz
    lin = jnp.where(in_range, lin, big)

    # sort points by voxel id (stable keeps original point order in each
    # voxel).  The payload — original index + every point column — rides in
    # ONE variadic lax.sort instead of argsort + post-hoc gathers: on a v5e
    # the three (P,)-sized gathers cost ~10 ms/batch at P=65536 while the
    # payload-carrying sort costs ~3 ms (scripts/exp_voxelize_cost.py), so
    # this is a ~3x cut on the on-device voxelize stage of the detect path.
    sorted_ops = jax.lax.sort(
        (lin, jnp.arange(p, dtype=jnp.int32))
        + tuple(points[:, c] for c in range(points.shape[1])),
        num_keys=1, is_stable=True)
    lin_s, sort_idx = sorted_ops[0], sorted_ops[1]
    pts_s = jnp.stack(sorted_ops[2:], axis=1)
    valid_s = lin_s < big

    first = jnp.concatenate([valid_s[:1],
                             (lin_s[1:] != lin_s[:-1]) & valid_s[1:]])
    voxel_rank = jnp.cumsum(first.astype(jnp.int32)) - 1          # (P,)
    pos = jnp.arange(p, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(first, pos, 0), axis=0)
    slot = pos - seg_start

    ok = valid_s & (voxel_rank < max_voxels) & (slot < max_num_points)
    v_safe = jnp.where(ok, voxel_rank, max_voxels)
    s_safe = jnp.where(ok, slot, 0)

    voxels = jnp.zeros((max_voxels, max_num_points, points.shape[1]),
                       dtype=points.dtype)
    voxels = voxels.at[v_safe, s_safe].set(pts_s, mode='drop')

    pt_indices = jnp.full((max_voxels, max_num_points), -1, dtype=jnp.int32)
    pt_indices = pt_indices.at[v_safe, s_safe].set(sort_idx.astype(jnp.int32),
                                                   mode='drop')

    num_points = jnp.zeros(max_voxels, dtype=jnp.int32)
    num_points = num_points.at[v_safe].add(ok.astype(jnp.int32), mode='drop')

    # recompute cell coords from the sorted points (same floor formula on the
    # same f32 values -> bit-identical to gathering coords[sort_idx])
    coords_s = jnp.floor((pts_s[:, :3] - pc_range[:3]) / voxel_size
                         ).astype(jnp.int32)
    coord_rows = jnp.full((max_voxels, 3), -1, dtype=jnp.int32)
    zyx = jnp.stack([coords_s[:, 2], coords_s[:, 1], coords_s[:, 0]], axis=1)
    first_ok = first & (voxel_rank < max_voxels)
    vfirst = jnp.where(first_ok, voxel_rank, max_voxels)
    coord_rows = coord_rows.at[vfirst].set(zyx, mode='drop')

    voxel_mask = coord_rows[:, 0] >= 0

    # per original point: its voxel row (or -1)
    pvi_sorted = jnp.where(ok, voxel_rank, -1)
    point_voxel_idx = jnp.zeros(p, dtype=jnp.int32).at[sort_idx].set(pvi_sorted)

    return {
        'voxels': voxels,
        'coordinates': coord_rows,
        'num_points_per_voxel': num_points,
        'voxel_mask': voxel_mask,
        'point_voxel_idx': point_voxel_idx,
        'voxel_pt_indices_into_original_pt_cloud': pt_indices,
    }
