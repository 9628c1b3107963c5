"""Voxelizer tests: host (numpy) semantics + host/device agreement."""
import numpy as np

from pcdet_tpu.ops.voxelizer import VoxelGenerator, voxelize_jnp

VOXEL_SIZE = [0.16, 0.16, 4.0]
PC_RANGE = [0, -39.68, -3, 69.12, 39.68, 1]


def test_grid_size():
    vg = VoxelGenerator(VOXEL_SIZE, PC_RANGE, max_num_points=32, max_voxels=16000)
    np.testing.assert_array_equal(vg.grid_size, [432, 496, 1])


def test_host_voxelizer_basic():
    vg = VoxelGenerator(VOXEL_SIZE, PC_RANGE, max_num_points=2, max_voxels=100)
    pts = np.array([
        [1.0, 0.0, 0.0, 0.5],     # voxel A
        [1.01, 0.01, 0.0, 0.6],   # voxel A (2nd point)
        [1.02, 0.02, 0.0, 0.7],   # voxel A — overflows max_num_points, dropped
        [5.0, 5.0, 0.0, 0.8],     # voxel B
        [-10.0, 0.0, 0.0, 0.9],   # out of range
        [200.0, 0.0, 0.0, 1.0],   # out of range
    ], dtype=np.float32)
    out = vg.generate(pts)
    assert out['num_voxels'] == 2
    assert out['voxels'].shape == (2, 2, 4)
    np.testing.assert_array_equal(out['num_points_per_voxel'], [2, 1])
    # first-appearance order: voxel A first
    np.testing.assert_allclose(out['voxels'][0, 0], pts[0])
    np.testing.assert_allclose(out['voxels'][0, 1], pts[1])
    np.testing.assert_allclose(out['voxels'][1, 0], pts[3])
    # gather map points at original cloud
    np.testing.assert_array_equal(
        out['voxel_pt_indices_into_original_pt_cloud'][0], [0, 1])
    np.testing.assert_array_equal(
        out['voxel_pt_indices_into_original_pt_cloud'][1], [3, -1])
    # ZYX coords
    c = out['coordinates'][0]
    assert c[0] == 0  # z
    assert c[2] == int((1.0 - 0) / 0.16)  # x idx


def test_host_voxelizer_max_voxels_cap():
    vg = VoxelGenerator(VOXEL_SIZE, PC_RANGE, max_num_points=4, max_voxels=3)
    rng = np.random.RandomState(0)
    pts = np.concatenate([
        rng.uniform(0, 60, (50, 1)),
        rng.uniform(-30, 30, (50, 1)),
        rng.uniform(-2, 0.5, (50, 1)),
        rng.uniform(0, 1, (50, 1)),
    ], axis=1).astype(np.float32)
    out = vg.generate(pts)
    assert out['num_voxels'] == 3
    assert out['voxels'].shape[0] == 3


def test_device_matches_host_contents():
    # NOTE: uses a non-binding max_voxels cap — when the cap binds, the host
    # keeps first-seen voxels while the device keeps smallest-linear-id ones.
    import jax.numpy as jnp
    vg = VoxelGenerator(VOXEL_SIZE, PC_RANGE, max_num_points=8, max_voxels=512)
    rng = np.random.RandomState(3)
    n_real = 200
    pts = np.concatenate([
        rng.uniform(0, 20, (n_real, 1)),
        rng.uniform(-10, 10, (n_real, 1)),
        rng.uniform(-2, 0.5, (n_real, 1)),
        rng.uniform(0, 1, (n_real, 1)),
    ], axis=1).astype(np.float32)
    host = vg.generate(pts)

    padded = np.concatenate([pts, np.zeros((56, 4), np.float32)], axis=0)
    mask = np.concatenate([np.ones(n_real, bool), np.zeros(56, bool)])
    dev = voxelize_jnp(jnp.asarray(padded), jnp.asarray(mask),
                       VOXEL_SIZE, PC_RANGE, max_num_points=8, max_voxels=512)

    n_host = host['num_voxels']
    n_dev = int(np.asarray(dev['voxel_mask']).sum())
    assert n_host == n_dev

    # same voxel sets (order differs: host = first appearance, device = id order)
    def key(coords, n):
        c = np.asarray(coords)[:n]
        return set(map(tuple, c.tolist()))
    assert key(host['coordinates'], n_host) == key(dev['coordinates'], n_dev)

    # per-voxel point multisets agree
    host_map = {tuple(host['coordinates'][i].tolist()):
                np.sort(host['voxels'][i][:host['num_points_per_voxel'][i]], axis=0)
                for i in range(n_host)}
    dev_coords = np.asarray(dev['coordinates'])
    dev_voxels = np.asarray(dev['voxels'])
    dev_np = np.asarray(dev['num_points_per_voxel'])
    for i in range(n_dev):
        k = tuple(dev_coords[i].tolist())
        got = np.sort(dev_voxels[i][:dev_np[i]], axis=0)
        np.testing.assert_allclose(got, host_map[k], atol=1e-6)


def test_device_voxelizer_point_overflow():
    import jax.numpy as jnp
    pts = np.zeros((16, 4), np.float32)
    pts[:, 0] = 1.0   # all in one voxel
    mask = np.ones(16, bool)
    out = voxelize_jnp(jnp.asarray(pts), jnp.asarray(mask),
                       VOXEL_SIZE, PC_RANGE, max_num_points=4, max_voxels=8)
    assert int(np.asarray(out['voxel_mask']).sum()) == 1
    np.testing.assert_array_equal(np.asarray(out['num_points_per_voxel'])[:2], [4, 0])
