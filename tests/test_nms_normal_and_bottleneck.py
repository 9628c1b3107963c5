import numpy as np, jax.numpy as jnp

def test_nms_normal_type_threaded():
    from pcdet_tpu.utils.edict import EDict as EasyDict
    from pcdet_tpu.models.detector3d import post_process_batch
    # two near-identical axis-aligned boxes + one far box
    boxes = np.array([[0, 0, 0, 4, 2, 1.5, 0.3],
                      [0.1, 0, 0, 4, 2, 1.5, 0.31],
                      [20, 20, 0, 4, 2, 1.5, 0.0]], np.float32)
    cls = np.array([[5.0], [4.0], [3.0]], np.float32)
    tc = EasyDict(SCORE_THRESH=0.1, NMS_THRESH=0.5, NMS_PRE_MAXSIZE_LAST=16,
                  NMS_POST_MAXSIZE_LAST=8, NMS_TYPE='nms_normal_gpu')
    out = post_process_batch(jnp.asarray(cls[None]), jnp.asarray(boxes[None]), tc)
    assert int(out['num'][0]) == 2, out['num']

def test_sparse_bottleneck():
    import jax
    from pcdet_tpu.models.backbones3d import SparseBottleneck
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(0)
    coords = np.unique(rng.randint(0, 6, size=(40, 3)), axis=0).astype(np.int32)[:24]
    n = len(coords)
    feats = rng.randn(1, 32, 8).astype(np.float32)
    level = sparse.from_unsorted(
        jnp.asarray(np.pad(feats[:, :n], ((0, 0), (0, 32 - n), (0, 0))))[0],
        jnp.asarray(np.pad(coords, ((0, 32 - n), (0, 0)))),
        jnp.asarray(np.arange(32) < n), (6, 6, 6))
    level = jax.tree_util.tree_map(
        lambda x: x[None] if hasattr(x, 'ndim') else x, level,
        is_leaf=lambda x: not isinstance(x, sparse.SparseLevel))
    mod = SparseBottleneck(planes=4)
    vars_ = mod.init(jax.random.PRNGKey(0), level, False)
    out = mod.apply(vars_, level, False)
    assert out.features.shape == (1, 32, 16)
    assert np.all(np.isfinite(np.asarray(out.features)))
