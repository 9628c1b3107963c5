"""Scatter-free subm-conv backward: the tap-reversed rulebook is the exact
transpose rulebook, so df is another gather-GEMM (gather_gemm.py
gather_matmul_subm).  These tests pin the identity against plain XLA
autodiff of the naive gather formulation, including the bf16 compute path.
"""
import numpy as np
import pytest


@pytest.fixture(scope='module')
def level_and_weights():
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(0)
    v, c, sh = 512, 16, (8, 40, 40)
    ids = np.unique(rng.randint(0, 8 * 40 * 40, 400))
    n = len(ids)
    buf = np.full((v,), sparse.INT_MAX, np.int32)
    buf[:n] = ids
    m = np.zeros(v, bool)
    m[:n] = True
    coords = np.stack([buf // 1600, (buf % 1600) // 40, buf % 40], -1)
    coords = np.where(m[:, None], coords, -1).astype(np.int32)
    feats = (rng.randn(v, c) * m[:, None]).astype(np.float32)
    lv = sparse.SparseLevel(jnp.asarray(feats), jnp.asarray(buf),
                            jnp.asarray(coords), jnp.asarray(m), sh)
    w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.1)
    go = jnp.asarray(rng.randn(v, c).astype(np.float32))
    return lv, w, go


def test_subm_backward_matches_autodiff(level_and_weights):
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    lv, w, go = level_and_weights
    v = lv.ids.shape[0]
    c = lv.features.shape[-1]
    rows, found = sparse._rules_affine(lv, lv.coords, lv.mask, lv.coords,
                                       (3, 3, 3), (-1, -1, -1))

    def naive(feats, wts):
        g = jnp.where(found.reshape(-1)[:, None], feats[rows.reshape(-1)],
                      0.0).reshape(v, 27 * c)
        return (g @ wts.reshape(27 * c, c)) * lv.mask[:, None]

    def custom(feats, wts):
        return sparse.subm_conv3d(lv._replace(features=feats), wts).features

    o1, vjp1 = jax.vjp(naive, lv.features, w)
    o2, vjp2 = jax.vjp(custom, lv.features, w)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)
    d1, dw1 = vjp1(go)
    d2, dw2 = vjp2(go)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2),
                               atol=3e-4, rtol=1e-3)


def test_subm_backward_bf16_close(level_and_weights):
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    lv, w, go = level_and_weights

    def f32(feats):
        return (sparse.subm_conv3d(lv._replace(features=feats), w).features
                * go).sum()

    def bf16(feats):
        return (sparse.subm_conv3d(lv._replace(features=feats), w,
                                   compute_dtype=jnp.bfloat16).features
                * go).sum()

    g32 = np.asarray(jax.grad(f32)(lv.features))
    g16 = np.asarray(jax.grad(bf16)(lv.features))
    assert g16.dtype == np.float32
    scale = np.abs(g32).max() + 1e-9
    assert np.abs(g32 - g16).max() / scale < 0.03


@pytest.mark.slow
def test_strided_backward_matches_autodiff(level_and_weights):
    """sparse_conv3d's lazy transpose rulebook (inverse-conv geometry) must
    equal XLA autodiff of the naive gather formulation."""
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    lv, w, _ = level_and_weights
    v = lv.ids.shape[0]
    c = lv.features.shape[-1]
    rng = np.random.RandomState(3)

    out = sparse.sparse_conv3d(lv, w, stride=2, out_cap=2 * v)
    rows, found = sparse._rules_affine(lv, out.coords, out.mask,
                                       out.coords * 2, (3, 3, 3),
                                       (-1, -1, -1))
    go = jnp.asarray(rng.randn(2 * v, c).astype(np.float32))

    def naive(feats, wts):
        g = jnp.where(found.reshape(-1)[:, None], feats[rows.reshape(-1)],
                      0.0).reshape(2 * v, 27 * c)
        return (g @ wts.reshape(27 * c, c)) * out.mask[:, None]

    def custom(feats, wts):
        return sparse.sparse_conv3d(lv._replace(features=feats), wts,
                                    stride=2, out_cap=2 * v).features

    o1, vjp1 = jax.vjp(naive, lv.features, w)
    o2, vjp2 = jax.vjp(custom, lv.features, w)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)
    for a, b in zip(vjp1(go), vjp2(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)


@pytest.mark.slow
def test_inverse_backward_matches_autodiff(level_and_weights):
    """inverse_conv3d's lazy transpose rulebook (affine geometry) must equal
    XLA autodiff of the naive gather formulation."""
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    lv, w, go = level_and_weights
    v = lv.ids.shape[0]
    c = lv.features.shape[-1]
    rng = np.random.RandomState(4)

    coarse = sparse.sparse_conv3d(lv, w, stride=2, out_cap=2 * v)
    coarse = coarse._replace(features=jnp.asarray(
        (rng.randn(2 * v, c) * np.asarray(coarse.mask)[:, None])
        .astype(np.float32)))

    def in_pos(oc, tap):
        num = oc + 1 - tap
        return num // 2, ((num % 2 == 0).all(-1) & (num >= 0).all(-1))

    rows, found = sparse._rules_generic(coarse, lv.coords, lv.mask, in_pos,
                                        (3, 3, 3))

    def naive(feats, wts):
        g = jnp.where(found.reshape(-1)[:, None], feats[rows.reshape(-1)],
                      0.0).reshape(v, 27 * c)
        return (g @ wts.reshape(27 * c, c)) * lv.mask[:, None]

    def custom(feats, wts):
        return sparse.inverse_conv3d(coarse._replace(features=feats), lv,
                                     wts, stride=2, padding=1).features

    o1, vjp1 = jax.vjp(naive, coarse.features, w)
    o2, vjp2 = jax.vjp(custom, coarse.features, w)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)
    for a, b in zip(vjp1(go), vjp2(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)
