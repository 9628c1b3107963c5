"""bf16 pair-packed streaming path of the sparse convs.

On TPU, `compute_dtype: bfloat16` routes the gather-GEMM through the
pair-packed int32 Pallas kernel (Mosaic cannot lower narrow bf16 row
loads — see ops/pallas/gather_gemm.py).  On CPU the same flag emulates the
identical bf16 rounding of features and weights, so these tests pin the
numerics contract of the TPU path.  Mirrors the reference's fp16-able
spconv usage (reference: pcdet/ops/spconv — dtype follows the tensors).
"""
import numpy as np

from tests.test_sparse import _dense_conv, _random_level


def test_pack_unpack_roundtrip():
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.ops.pallas.gather_gemm import (pack_bf16_pairs,
                                                  split_weights_packed)
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(33, 8).astype(np.float32))
    packed = pack_bf16_pairs(f)
    assert packed.shape == (33, 4) and packed.dtype == jnp.int32
    # lo half = even channels, hi half = odd channels, value-exact per bf16
    bits = np.asarray(packed).view(np.uint32)
    lo = (bits & 0xFFFF).astype(np.uint16)
    hi = (bits >> 16).astype(np.uint16)
    want = np.asarray(f.astype(jnp.bfloat16)).astype(np.float32)
    got_lo = np.asarray(
        jax.lax.bitcast_convert_type(jnp.asarray(lo), jnp.bfloat16),
        dtype=np.float32)
    got_hi = np.asarray(
        jax.lax.bitcast_convert_type(jnp.asarray(hi), jnp.bfloat16),
        dtype=np.float32)
    np.testing.assert_array_equal(got_lo, want[:, 0::2])
    np.testing.assert_array_equal(got_hi, want[:, 1::2])

    w = jnp.asarray(rng.randn(27, 8, 16).astype(np.float32))
    ws = split_weights_packed(w)
    assert ws.shape == (27, 2, 4, 16)
    np.testing.assert_array_equal(np.asarray(ws[:, 0]), np.asarray(w[:, 0::2]))
    np.testing.assert_array_equal(np.asarray(ws[:, 1]), np.asarray(w[:, 1::2]))


def test_subm_packed_matches_dense_bf16_tol():
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(1)
    cin, cout = 8, 16
    level, dense = _random_level(rng, cin=cin)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
    out = sparse.subm_conv3d(level, jnp.asarray(w), kernel=3,
                             compute_dtype=jnp.bfloat16)
    ref = _dense_conv(dense, w, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    coords = np.asarray(level.coords)
    mask = np.asarray(level.mask)
    got = np.asarray(out.features)[mask]
    want = ref[coords[mask, 0], coords[mask, 1], coords[mask, 2]]
    # bf16 has ~8 mantissa bits: rel tol 2e-2 against the f32 dense ref
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    assert np.abs(np.asarray(out.features)[~mask]).max() == 0


def test_strided_packed_matches_dense_bf16_tol():
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(2)
    cin, cout = 6, 10
    level, dense = _random_level(rng, cin=cin)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
    out = sparse.sparse_conv3d(level, jnp.asarray(w), kernel=3, stride=2,
                               padding=1, out_cap=96,
                               compute_dtype=jnp.bfloat16)
    ref = _dense_conv(dense, w, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    coords = np.asarray(out.coords)
    mask = np.asarray(out.mask)
    got = np.asarray(out.features)[mask]
    want = ref[coords[mask, 0], coords[mask, 1], coords[mask, 2]]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_packed_gradients_close_to_f32():
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(3)
    cin, cout = 8, 8
    level, _ = _random_level(rng, cin=cin)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)

    def loss(feats, weights, cd):
        lv = sparse.SparseLevel(feats, level.ids, level.coords, level.mask,
                                level.shape)
        out = sparse.subm_conv3d(lv, weights, kernel=3, compute_dtype=cd)
        return (out.features ** 2).sum()

    gf_f32, gw_f32 = jax.grad(loss, argnums=(0, 1))(
        level.features, w, None)
    gf_pk, gw_pk = jax.grad(loss, argnums=(0, 1))(
        level.features, w, jnp.bfloat16)
    assert np.isfinite(np.asarray(gf_pk)).all()
    assert np.isfinite(np.asarray(gw_pk)).all()
    scale_f = np.abs(np.asarray(gf_f32)).max() + 1e-6
    scale_w = np.abs(np.asarray(gw_f32)).max() + 1e-6
    assert np.abs(np.asarray(gf_pk - gf_f32)).max() / scale_f < 5e-2
    assert np.abs(np.asarray(gw_pk - gw_f32)).max() / scale_w < 5e-2


def test_yaml_threads_eval_dtype_to_modules():
    """second.yaml / PartA2.yaml ship eval-only bf16: training keeps exact
    f32 (`compute_dtype` unset), eval selects the packed kernel."""
    from pcdet_tpu.config import cfg_from_yaml_file
    from pcdet_tpu.models.backbones3d import _effective_dtype
    from pcdet_tpu.models.build import build_network

    cfg = cfg_from_yaml_file('tools/cfgs/second.yaml')
    net = build_network(cfg, grid_size=[352, 352, 40])
    m = net.module
    assert m.compute_dtype == '' and m.compute_dtype_test == 'bfloat16'
    assert _effective_dtype(m, train=True) == ''
    assert _effective_dtype(m, train=False) == 'bfloat16'

    cfg = cfg_from_yaml_file('tools/cfgs/PartA2.yaml')
    net = build_network(cfg, grid_size=[352, 352, 40])
    m = net.module
    assert m.compute_dtype == '' and m.compute_dtype_test == 'bfloat16'


def test_odd_channels_fall_back_unpacked():
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    from pcdet_tpu.ops.sparse import _packed_mode
    assert not _packed_mode(jnp.bfloat16, 5)
    assert _packed_mode(jnp.bfloat16, 6)
    assert not _packed_mode(None, 6)
    rng = np.random.RandomState(4)
    level, dense = _random_level(rng, cin=5)          # odd cin
    w = rng.randn(27, 5, 7).astype(np.float32) * 0.1
    out = sparse.subm_conv3d(level, jnp.asarray(w), kernel=3,
                             compute_dtype=jnp.bfloat16)
    ref = _dense_conv(dense, w, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    coords = np.asarray(level.coords)
    mask = np.asarray(level.mask)
    got = np.asarray(out.features)[mask]
    want = ref[coords[mask, 0], coords[mask, 1], coords[mask, 2]]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
