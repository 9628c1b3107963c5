"""Dense-tail parity: conv4/conv_out as masked dense conv3d must match the
sparse path (ops/dense.py vs ops/sparse.py) through the full backbones.

Same params, same inputs, sparse vs dense-tail — equality to f32 tolerance
(sum order differs between the gather-GEMM and the dense conv).  Caps are
set above the dilated active counts: the sparse path truncates past its
caps while the dense path never does, so parity is only defined without
overflow (the production configs' caps are calibrated for that anyway).
"""
import numpy as np
import pytest


def _batched_level(rng, shape=(25, 16, 16), n_active=80, cap=128, cin=4,
                   batch=2):
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    d, h, w = shape
    total = d * h * w
    f = np.zeros((batch, cap, cin), np.float32)
    c = np.full((batch, cap, 3), -1, np.int32)
    i = np.full((batch, cap), sparse.INT_MAX, np.int32)
    m = np.zeros((batch, cap), bool)
    for b in range(batch):
        n = n_active - 7 * b                 # ragged actives across the batch
        ids = rng.choice(total, size=n, replace=False)
        ids.sort()
        c[b, :n] = np.stack([ids // (h * w), (ids % (h * w)) // w, ids % w],
                            axis=1)
        f[b, :n] = rng.randn(n, cin).astype(np.float32)
        i[b, :n] = ids
        m[b, :n] = True
    return sparse.SparseLevel(jnp.asarray(f), jnp.asarray(i), jnp.asarray(c),
                              jnp.asarray(m), shape)


CAPS = (1024, 512, 256, 256)


def _backbone(tail, **kw):
    from pcdet_tpu.models.backbones3d import BackBone8x
    return BackBone8x(sparse_shape=(25, 16, 16), level_caps=CAPS,
                      dense_tail=tail, **kw)


@pytest.mark.parametrize('tail', ['subm', 'full', 'conv3'])
def test_backbone8x_dense_tail_parity(tail):
    import jax
    rng = np.random.RandomState(0)
    level = _batched_level(rng)
    ref_m = _backbone('')
    var = ref_m.init(jax.random.PRNGKey(0), level, False)
    bev_ref, enc_ref = ref_m.apply(var, level, False)
    bev, enc = _backbone(tail).apply(var, level, False)
    np.testing.assert_allclose(np.asarray(bev), np.asarray(bev_ref),
                               rtol=1e-4, atol=1e-5)
    # overflow telemetry keys survive, and the dense stages report zero
    for k in ('conv2', 'conv3', 'conv4', 'conv_out'):
        assert k in enc['overflow']
    assert np.all(np.asarray(enc['overflow']['conv_out']) == 0)
    if tail == 'subm':
        # the gathered-back x_conv4 must equal the sparse path's level
        ref4, got4 = enc_ref['x_conv4'], enc['x_conv4']
        np.testing.assert_array_equal(np.asarray(ref4.ids),
                                      np.asarray(got4.ids))
        np.testing.assert_allclose(np.asarray(got4.features),
                                   np.asarray(ref4.features),
                                   rtol=1e-4, atol=1e-5)


def test_backbone8x_dense_tail_train_step_parity():
    """Train mode: grads + updated BN batch stats match the sparse path."""
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(1)
    level = _batched_level(rng)
    ref_m = _backbone('')
    var = ref_m.init(jax.random.PRNGKey(0), level, False)
    params, stats = var['params'], var['batch_stats']

    def loss(module):
        def f(p, s):
            (bev, _), new = module.apply(
                {'params': p, 'batch_stats': s}, level, True,
                mutable=['batch_stats'])
            return jnp.sum(bev ** 2), new['batch_stats']
        return jax.value_and_grad(f, has_aux=True)(params, stats)

    (l_ref, bs_ref), g_ref = loss(ref_m)
    (l_got, bs_got), g_got = loss(_backbone('subm'))
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-4)
    key = lambda kv: str(kv[0])                      # noqa: E731
    for (p1, a), (p2, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_ref), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(g_got), key=key)):
        assert p1 == p2
        # sum-of-squares loss amplifies f32 sum-order noise through the
        # deep chain; observed worst case 1/27k elements at 1.4% rel
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-2, atol=5e-4, err_msg=str(p1))
    for (p1, a), (p2, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(bs_ref), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(bs_got), key=key)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6, err_msg=str(p1))


def test_unetv2_dense_tail_parity():
    """Full UNet (encoder tail dense, decoder sparse as always): bev + seg
    heads match — covers gather_level id/book preservation through up4."""
    import jax
    from pcdet_tpu.models.backbones3d import UNetV2
    rng = np.random.RandomState(2)
    level = _batched_level(rng)
    ref_m = UNetV2(sparse_shape=(25, 16, 16), level_caps=CAPS)
    var = ref_m.init(jax.random.PRNGKey(0), level, False)
    bev_ref, ret_ref = ref_m.apply(var, level, False)
    bev, ret = UNetV2(sparse_shape=(25, 16, 16), level_caps=CAPS,
                      dense_tail='subm').apply(var, level, False)
    bev3, ret3 = UNetV2(sparse_shape=(25, 16, 16), level_caps=CAPS,
                        dense_tail='conv3').apply(var, level, False)
    np.testing.assert_allclose(np.asarray(bev3), np.asarray(bev_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret3['seg_features']),
                               np.asarray(ret_ref['seg_features']),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bev), np.asarray(bev_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret['u_seg_preds']),
                               np.asarray(ret_ref['u_seg_preds']),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret['seg_features']),
                               np.asarray(ret_ref['seg_features']),
                               rtol=1e-4, atol=1e-5)


def test_dense_tail_bf16_close():
    """compute_dtype_test=bfloat16 + dense_tail_test runs the bf16 dense
    convs; result stays within bf16 tolerance of exact f32."""
    import jax
    rng = np.random.RandomState(3)
    level = _batched_level(rng)
    ref_m = _backbone('')
    var = ref_m.init(jax.random.PRNGKey(0), level, False)
    bev_ref, _ = ref_m.apply(var, level, False)
    bev, _ = _backbone('', dense_tail_test='subm',
                       compute_dtype_test='bfloat16').apply(var, level, False)
    err = np.abs(np.asarray(bev) - np.asarray(bev_ref))
    scale = np.abs(np.asarray(bev_ref)).max() + 1e-6
    assert err.max() / scale < 0.05


def test_env_override(monkeypatch):
    """PCDET_DENSE_TAIL env forces the mode on and off for chip A/Bs."""
    import jax
    rng = np.random.RandomState(4)
    level = _batched_level(rng)
    ref_m = _backbone('')
    var = ref_m.init(jax.random.PRNGKey(0), level, False)
    bev_ref, _ = ref_m.apply(var, level, False)
    monkeypatch.setenv('PCDET_DENSE_TAIL', 'subm')
    bev_on, _ = _backbone('').apply(var, level, False)
    monkeypatch.setenv('PCDET_DENSE_TAIL', 'off')
    bev_off, _ = _backbone('full').apply(var, level, False)
    np.testing.assert_allclose(np.asarray(bev_on), np.asarray(bev_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bev_off), np.asarray(bev_ref))


@pytest.mark.parametrize('seed', range(4))
def test_dense_ops_fuzz_random_geometry(seed):
    """ops/dense.py conv3d + dilate_occ vs the sparse library on random
    kernels/strides/paddings — the backbone tests pin only the fixed
    conv3/conv4/conv_out geometries; this guards the helpers themselves."""
    import jax.numpy as jnp
    from pcdet_tpu.ops import dense as dense_ops
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(100 + seed)
    shape = tuple(int(x) for x in rng.randint(6, 14, size=3))
    level = _batched_level(rng, shape=shape, n_active=60, cap=96, cin=3,
                           batch=2)
    grid = dense_ops.from_level(level)
    np.testing.assert_array_equal(
        np.asarray(grid.occ.reshape(2, -1).sum(axis=1)),
        np.asarray(level.mask.sum(axis=1)))

    # subm: dense conv + input occupancy == sparse subm at active sites
    kernel = tuple(int(k) for k in rng.choice([1, 3], size=3))
    cout = 5
    w = jnp.asarray(rng.randn(int(np.prod(kernel)), 3, cout)
                    .astype(np.float32) * 0.2)
    out_s = sparse.subm_conv3d_batched(level, w, kernel=kernel)
    y = dense_ops.conv3d(grid.grid, w, kernel,
                         padding=tuple(k // 2 for k in kernel))
    got = dense_ops.gather_level(
        dense_ops.DenseGrid(y, grid.occ), level._replace(
            features=jnp.zeros(level.features.shape[:2] + (cout,))))
    np.testing.assert_allclose(np.asarray(got.features),
                               np.asarray(out_s.features),
                               rtol=1e-4, atol=1e-5)

    # strided: dense conv + dilated occupancy == sparse strided conv
    stride = tuple(int(s) for s in rng.randint(1, 3, size=3))
    padding = tuple(int(p) for p in rng.randint(0, 2, size=3))
    kernel = (3, 3, 3)
    if any((shape[i] + 2 * padding[i] - 3) // stride[i] + 1 <= 0
           for i in range(3)):
        pytest.skip('degenerate out shape')
    w = jnp.asarray(rng.randn(27, 3, cout).astype(np.float32) * 0.2)
    out_s = sparse.sparse_conv3d_batched(level, w, kernel=kernel,
                                         stride=stride, padding=padding,
                                         out_cap=4096)
    assert int(np.asarray(out_s.overflow).max()) == 0
    y = dense_ops.conv3d(grid.grid, w, kernel, stride, padding)
    occ_out = dense_ops.dilate_occ(grid.occ, kernel, stride, padding)
    # occupancy must be exactly the sparse out-set
    occ_ref = np.zeros(occ_out.shape, bool).reshape(2, -1)
    ids = np.asarray(out_s.ids)
    msk = np.asarray(out_s.mask)
    for b in range(2):
        occ_ref[b, ids[b][msk[b]]] = True
    np.testing.assert_array_equal(np.asarray(occ_out).reshape(2, -1),
                                  occ_ref)
    got = dense_ops.gather_level(
        dense_ops.DenseGrid(y, occ_out), out_s._replace(
            features=jnp.zeros(out_s.features.shape[:2] + (cout,))))
    np.testing.assert_allclose(np.asarray(got.features),
                               np.asarray(out_s.features),
                               rtol=1e-4, atol=1e-5)
