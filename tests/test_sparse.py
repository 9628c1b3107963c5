"""Sparse conv library vs dense XLA conv references on small grids."""
import numpy as np
import pytest


def _random_level(rng, shape=(6, 8, 8), n_active=40, cap=64, cin=5):
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    d, h, w = shape
    total = d * h * w
    ids = rng.choice(total, size=n_active, replace=False)
    ids.sort()
    coords = np.stack([ids // (h * w), (ids % (h * w)) // w, ids % w], axis=1)
    feats = rng.randn(n_active, cin).astype(np.float32)

    f = np.zeros((cap, cin), np.float32)
    f[:n_active] = feats
    c = np.full((cap, 3), -1, np.int32)
    c[:n_active] = coords
    i = np.full((cap,), sparse.INT_MAX, np.int32)
    i[:n_active] = ids
    m = np.zeros(cap, bool)
    m[:n_active] = True
    level = sparse.SparseLevel(jnp.asarray(f), jnp.asarray(i), jnp.asarray(c),
                               jnp.asarray(m), shape)
    dense = np.zeros((*shape, cin), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    return level, dense


def _dense_conv(dense, w_kcc, kernel, stride, padding):
    """Reference: XLA dense 3D conv. w_kcc: (K, Cin, Cout) z-major taps."""
    import jax
    import jax.numpy as jnp
    kd, kh, kw = kernel
    cin = dense.shape[-1]
    cout = w_kcc.shape[-1]
    w = np.asarray(w_kcc).reshape(kd, kh, kw, cin, cout)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense[None]), jnp.asarray(w),
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    return np.asarray(out[0])


def test_subm_conv_matches_dense():
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(0)
    level, dense = _random_level(rng)
    cin, cout = 5, 7
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
    out = sparse.subm_conv3d(level, jnp.asarray(w), kernel=3)
    ref = _dense_conv(dense, w, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    coords = np.asarray(level.coords)
    mask = np.asarray(level.mask)
    got = np.asarray(out.features)[mask]
    want = ref[coords[mask, 0], coords[mask, 1], coords[mask, 2]]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # padded rows stay zero
    assert np.abs(np.asarray(out.features)[~mask]).max() == 0


def test_sparse_conv_stride2_matches_dense():
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(1)
    level, dense = _random_level(rng)
    cin, cout = 5, 4
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
    out = sparse.sparse_conv3d(level, jnp.asarray(w), kernel=3, stride=2,
                               padding=1, out_cap=128)
    ref = _dense_conv(dense, w, (3, 3, 3), (2, 2, 2), (1, 1, 1))

    # active set must equal positions whose receptive field hits an input
    occ = (np.abs(_dense_conv((dense != 0).any(-1, keepdims=True).astype(
        np.float32), np.ones((27, 1, 1), np.float32), (3, 3, 3), (2, 2, 2),
        (1, 1, 1))) > 0)[..., 0]
    got_set = {tuple(c) for c in np.asarray(out.coords)[np.asarray(out.mask)]}
    want_set = {tuple(c) for c in np.argwhere(occ)}
    assert got_set == want_set

    coords = np.asarray(out.coords)
    mask = np.asarray(out.mask)
    got = np.asarray(out.features)[mask]
    want = ref[coords[mask, 0], coords[mask, 1], coords[mask, 2]]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sparse_conv_anisotropic():
    """conv_out style: kernel (3,1,1), stride (2,1,1), pad 0."""
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(2)
    level, dense = _random_level(rng, shape=(5, 6, 6), n_active=30, cap=48)
    cin, cout = 5, 3
    w = rng.randn(3, cin, cout).astype(np.float32) * 0.1
    out = sparse.sparse_conv3d(level, jnp.asarray(w), kernel=(3, 1, 1),
                               stride=(2, 1, 1), padding=(0, 0, 0),
                               out_cap=64)
    ref = _dense_conv(dense, w, (3, 1, 1), (2, 1, 1), (0, 0, 0))
    coords = np.asarray(out.coords)
    mask = np.asarray(out.mask)
    np.testing.assert_allclose(
        np.asarray(out.features)[mask],
        ref[coords[mask, 0], coords[mask, 1], coords[mask, 2]],
        rtol=1e-4, atol=1e-5)
    assert out.shape == (2, 6, 6)


def test_inverse_conv_matches_bruteforce():
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(3)
    fine, fine_dense = _random_level(rng, shape=(6, 8, 8), n_active=40)
    cin, cout = 5, 6
    wd = rng.randn(27, cin, cout).astype(np.float32) * 0.1
    coarse = sparse.sparse_conv3d(fine, jnp.asarray(wd), 3, 2, 1, out_cap=128)

    wu = rng.randn(27, cout, cin).astype(np.float32) * 0.1
    up = sparse.inverse_conv3d(coarse, fine, jnp.asarray(wu), kernel=3,
                               stride=2, padding=1)
    # brute force: out[c] = sum_k coarse[(c + p - k) / s] @ wu[k]
    coarse_np = {tuple(c): f for c, f in
                 zip(np.asarray(coarse.coords)[np.asarray(coarse.mask)],
                     np.asarray(coarse.features)[np.asarray(coarse.mask)])}
    offs = [(i, j, l) for i in range(3) for j in range(3) for l in range(3)]
    fmask = np.asarray(fine.mask)
    fcoords = np.asarray(fine.coords)
    got = np.asarray(up.features)
    for r in np.flatnonzero(fmask):
        c = fcoords[r]
        want = np.zeros(cin, np.float32)
        for t, off in enumerate(offs):
            num = c + 1 - np.asarray(off)
            if np.all(num % 2 == 0) and np.all(num >= 0):
                o = tuple(num // 2)
                if o in coarse_np:
                    want = want + coarse_np[o] @ wu[t]
        np.testing.assert_allclose(got[r], want, rtol=1e-3, atol=1e-4)
    assert up.shape == fine.shape


def test_sparse_maxpool():
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(4)
    level, dense = _random_level(rng, shape=(6, 8, 8), n_active=40)
    out = sparse.sparse_maxpool3d(level, kernel=3, stride=2, padding=1,
                                  out_cap=128)
    # dense reference: max over active (others -> -inf), then mask
    neg = np.full_like(dense, -1e30)
    occ = (dense != 0).any(-1)
    src = np.where(occ[..., None], dense, neg)
    import jax
    ref = np.asarray(jax.lax.reduce_window(
        jnp.asarray(src[None]), -1e30, jax.lax.max,
        (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])[0])
    coords = np.asarray(out.coords)
    mask = np.asarray(out.mask)
    got = np.asarray(out.features)[mask]
    want = ref[coords[mask, 0], coords[mask, 1], coords[mask, 2]]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_to_dense_roundtrip():
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(5)
    level, dense = _random_level(rng)
    got = np.asarray(sparse.to_dense(level))
    np.testing.assert_allclose(got, dense)


def test_rules_inverse_matches_generic():
    """The parity-specialised inverse rulebook must agree bit-for-bit with
    the generic K*V-query lookup on every shipped geometry."""
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(7)
    geoms = [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
        ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
        ((3, 1, 1), (2, 1, 1), (1, 0, 0)),
    ]
    coarse, _ = _random_level(rng, shape=(5, 7, 6), n_active=50, cap=64)
    for kernel, stride, padding in geoms:
        fine_shape = tuple(cs * st for cs, st in zip(coarse.shape, stride))
        n_out, cap_out = 70, 96
        total = int(np.prod(fine_shape))
        ids = rng.choice(total, size=n_out, replace=False)
        ids.sort()
        d, h, w = fine_shape
        out_coords = np.full((cap_out, 3), -1, np.int32)
        out_coords[:n_out] = np.stack(
            [ids // (h * w), (ids % (h * w)) // w, ids % w], axis=1)
        out_mask = np.zeros(cap_out, bool)
        out_mask[:n_out] = True
        out_coords = jnp.asarray(out_coords)
        out_mask = jnp.asarray(out_mask)

        s_arr = jnp.asarray(stride, jnp.int32)
        p_arr = jnp.asarray(padding, jnp.int32)

        def in_pos(u_coords, tap):
            num = u_coords + p_arr - jnp.asarray(tap, jnp.int32)
            ok = (num % s_arr == 0).all(-1) & (num >= 0).all(-1)
            return num // s_arr, ok

        rows_g, found_g = sparse._rules_generic(
            coarse, out_coords, out_mask, in_pos, kernel)
        rows_s, found_s = sparse._rules_inverse(
            coarse, out_coords, out_mask, kernel, stride, padding)
        np.testing.assert_array_equal(np.asarray(found_s),
                                      np.asarray(found_g),
                                      err_msg=str((kernel, stride, padding)))
        fg = np.asarray(found_g)
        np.testing.assert_array_equal(np.asarray(rows_s)[fg],
                                      np.asarray(rows_g)[fg],
                                      err_msg=str((kernel, stride, padding)))


def test_subm_rulebook_cache_reused_and_correct():
    """The first k3 subm conv populates level.subm_rules; a second conv on
    the same sites reuses it and must produce the same output as a conv on
    a cache-less level."""
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(9)
    level, _ = _random_level(rng, cin=6)
    assert level.subm_rules is None
    w1 = jnp.asarray(rng.randn(27, 6, 8).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32) * 0.1)
    out1 = sparse.subm_conv3d(level, w1, kernel=3)
    assert out1.subm_rules is not None
    out2 = sparse.subm_conv3d(out1, w2, kernel=3)       # cache hit
    # reference: same second conv on a stripped (cache-less) level
    fresh = out1._replace(subm_rules=None)
    ref2 = sparse.subm_conv3d(fresh, w2, kernel=3)
    np.testing.assert_allclose(np.asarray(out2.features),
                               np.asarray(ref2.features), rtol=1e-6)
    # k=1 convs neither use nor clobber the k3 cache
    wk1 = jnp.asarray(rng.randn(1, 8, 4).astype(np.float32) * 0.1)
    out3 = sparse.subm_conv3d(out2, wk1, kernel=1)
    assert out3.subm_rules is out2.subm_rules
