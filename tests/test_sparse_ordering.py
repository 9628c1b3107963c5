"""Voxel id-ordering contract between the host data path and the sparse
backbones.

The SparseLevel invariant (ops/sparse.py:39-46) is ids sorted ascending —
every rulebook is a merge/rank lookup over that order.  The host voxelizer
emits spconv's FIRST-APPEARANCE order (reference spconv VoxelGeneratorV2
semantics), so DatasetTemplate.prepare_data must re-sort; feeding
first-appearance order straight into `from_voxelizer` silently corrupts
every rulebook (caught live in round 3: unsorted-vs-sorted subm conv outputs
diverged by O(feature magnitude) on the stock SECOND/Part-A² CLI path).
"""
import numpy as np

from tiny_config import tiny_second_cfg


def _prepare_example(training):
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    cfg = tiny_second_cfg()
    ds = SyntheticDataset(cfg, training=training)
    ds.set_sample_seed(3, 0)
    return ds, ds[0]


def _lin_zyx(coords, grid_size):
    return ((coords[:, 0].astype(np.int64) * grid_size[1] + coords[:, 1])
            * grid_size[0] + coords[:, 2])


def test_prepare_data_emits_sorted_voxels():
    for training in (True, False):        # train shuffles points; eval doesn't
        ds, ex = _prepare_example(training)
        m = ex['voxel_mask']
        assert m.any() and not m.all()
        ids = _lin_zyx(ex['coordinates'][m], ds.voxel_generator.grid_size)
        assert (np.diff(ids) > 0).all(), 'voxel ids must be strictly ascending'
        # padding stays a suffix (prefix-true mask layout)
        assert (np.flatnonzero(m) == np.arange(m.sum())).all()


def test_sorted_voxels_stay_aligned_with_their_points():
    """The sort must carry voxels/num_points along with coordinates: every
    stored point must fall inside the voxel cell its row claims."""
    ds, ex = _prepare_example(True)
    vg = ds.voxel_generator
    m = ex['voxel_mask']
    coords = ex['coordinates'][m]                       # (V, 3) ZYX
    voxels = ex['voxels'][m]
    npts = ex['num_points'][m]
    cell = np.asarray(vg.voxel_size, np.float32)
    origin = np.asarray(vg.point_cloud_range[:3], np.float32)
    for i in range(min(64, len(coords))):
        pts = voxels[i, :npts[i], :3]
        got = np.floor((pts - origin) / cell).astype(np.int64)
        want = coords[i][::-1]                          # XYZ
        assert (got == want[None, :]).all(), (i, got, want)


def test_subm_conv_matches_from_unsorted_reference():
    """End-to-end: a subm conv on the prepare_data level equals the same conv
    built via from_unsorted on a deliberately shuffled copy (row-permutation
    mapped) — the invariant the backbones rely on."""
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse

    ds, ex = _prepare_example(True)
    shape = (int(ds.grid_size[2]) + 1, int(ds.grid_size[1]),
             int(ds.grid_size[0]))
    rng = np.random.RandomState(0)
    V = ex['voxel_mask'].shape[0]
    feats = rng.randn(V, 4).astype(np.float32) * ex['voxel_mask'][:, None]
    w = rng.randn(27, 4, 4).astype(np.float32)

    lv = sparse.from_voxelizer(jnp.asarray(feats),
                               jnp.asarray(ex['coordinates']),
                               jnp.asarray(ex['voxel_mask']), shape)
    out = sparse.subm_conv3d(lv, jnp.asarray(w))

    perm = rng.permutation(V)
    lv_ref = sparse.from_unsorted(jnp.asarray(feats[perm]),
                                  jnp.asarray(ex['coordinates'][perm]),
                                  jnp.asarray(ex['voxel_mask'][perm]), shape)
    out_ref = sparse.subm_conv3d(lv_ref, jnp.asarray(w))

    np.testing.assert_allclose(
        np.asarray(out.features)[np.asarray(lv.mask)],
        np.asarray(out_ref.features)[np.asarray(lv_ref.mask)],
        rtol=0, atol=1e-5)
