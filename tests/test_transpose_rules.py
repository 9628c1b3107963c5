"""Transpose rulebooks by forward-book inversion (one packed scatter) must
equal the geometric builders they replaced in the strided/inverse backward
(`_rules_inverse` over the out table / `_rules_affine` over the fine table).
Uniqueness fact under test: for fixed (input, tap) the contributing output
is unique for both geometries, so the scatter never collides.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pcdet_tpu.ops import sparse


def _rand_level(rng, v, shape, frac=0.7):
    n = int(v * frac)
    ids = np.sort(rng.choice(np.prod(shape), n, replace=False))
    buf = np.full((v,), sparse.INT_MAX, np.int64)
    buf[:n] = ids
    mask = np.zeros(v, bool)
    mask[:n] = True
    z = buf // (shape[1] * shape[2])
    rem = buf % (shape[1] * shape[2])
    coords = np.where(mask[:, None],
                      np.stack([z, rem // shape[2], rem % shape[2]], -1),
                      -1).astype(np.int32)
    feats = (rng.randn(v, 4).astype(np.float32) * mask[:, None])
    return sparse.SparseLevel(jnp.asarray(feats),
                              jnp.asarray(buf.astype(np.int32)),
                              jnp.asarray(coords), jnp.asarray(mask), shape)


@pytest.mark.parametrize('kernel,stride,padding', [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
])
def test_strided_transpose_matches_geometric(kernel, stride, padding):
    rng = np.random.RandomState(0)
    shape = (9, 16, 16)
    lv = _rand_level(rng, 96, shape)
    out_cap = 128
    out_ids, out_coords, out_mask, out_shape, _, rows, found = \
        sparse._strided_out_set(lv, kernel, stride, padding, out_cap)

    n_in = lv.ids.shape[0]
    fwd_rules = jnp.where(found, rows, n_in)
    got = sparse._transpose_rules_from_fwd(fwd_rules, n_in, out_cap)

    # the geometric builder this replaced (pre-round-3 bwd_builder)
    tbl = sparse.SparseLevel(jnp.zeros((out_cap, 0)), out_ids,
                             jnp.zeros((out_cap, 3), jnp.int32),
                             out_ids < sparse.INT_MAX, out_shape)
    rows_b, found_b = sparse._rules_inverse(tbl, lv.coords, lv.mask,
                                            kernel, stride, padding)
    want = jnp.where(found_b, rows_b, out_cap)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_inverse_transpose_matches_bruteforce():
    """Transpose of the inverse-conv forward book vs a dict brute force.

    Deliberately NOT compared against the pre-round-3 geometric builder
    (`_rules_affine` over stride-multiplied bases): brute-forcing exposed
    that builder to be WRONG on 13/1728 entries of this very configuration
    (it was the round-2 inverse-conv backward; the scatter inversion both
    replaces and fixes it).
    """
    rng = np.random.RandomState(1)
    kernel, stride, padding = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    fine_shape = (9, 16, 16)
    fine = _rand_level(rng, 128, fine_shape)
    coarse_shape = sparse.conv_out_shape(fine_shape, kernel, stride, padding)
    coarse = _rand_level(rng, 64, coarse_shape)

    rows, found = sparse._rules_inverse(coarse, fine.coords, fine.mask,
                                        kernel, stride, padding)
    n_in = coarse.ids.shape[0]
    n_out = fine.ids.shape[0]
    fwd_rules = jnp.where(found, rows, n_in)
    got = np.asarray(sparse._transpose_rules_from_fwd(fwd_rules, n_in, n_out))

    offs = sparse._kernel_offsets(kernel)
    fc, fm = np.asarray(fine.coords), np.asarray(fine.mask)
    cc, cm = np.asarray(coarse.coords), np.asarray(coarse.mask)
    lut = {tuple(fc[i]): i for i in range(n_out) if fm[i]}
    want = np.full((n_in, offs.shape[0]), n_out, np.int32)
    for u in range(n_in):
        if not cm[u]:
            continue
        for t in range(offs.shape[0]):
            f = cc[u] * np.array(stride) - np.array(padding) + offs[t]
            if (f < 0).any() or (f >= np.array(fine_shape)).any():
                continue
            i = lut.get(tuple(f))
            if i is not None:
                want[u, t] = i
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('kernel,stride,padding', [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
])
def test_inverse_conv_indice_key_reuse(kernel, stride, padding):
    """inverse_conv3d on a level produced by the matching strided conv must
    reuse the stashed forward book (one scatter) and produce bit-identical
    features to the fresh `_rules_inverse` lookup path."""
    rng = np.random.RandomState(7)
    shape = (9, 16, 16)
    fine = _rand_level(rng, 96, shape)
    w_dn = jnp.asarray(rng.randn(27, 4, 6).astype(np.float32))
    w_up = jnp.asarray(rng.randn(27, 6, 5).astype(np.float32))

    coarse = sparse.sparse_conv3d(fine, w_dn, kernel, stride, padding,
                                  out_cap=128)
    assert coarse.strided_rules is not None
    assert coarse.strided_meta == (kernel, stride, padding, 96, '')

    up = sparse.inverse_conv3d(coarse, fine, w_up, kernel, stride, padding)

    # strip the stash -> the generic lookup path
    coarse_fresh = coarse._replace(strided_rules=None, strided_meta=None)
    up_ref = sparse.inverse_conv3d(coarse_fresh, fine, w_up, kernel, stride,
                                   padding)
    np.testing.assert_array_equal(np.asarray(up.features),
                                  np.asarray(up_ref.features))

    # gradients flow identically through both book paths
    def loss(fn_level, w):
        return sparse.inverse_conv3d(fn_level, fine, w, kernel, stride,
                                     padding).features.sum()
    import jax
    g1 = jax.grad(lambda w: loss(coarse, w))(w_up)
    g2 = jax.grad(lambda w: loss(coarse_fresh, w))(w_up)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_inverse_conv_key_mismatch_falls_back():
    """A target level that is NOT the producing conv's input but has the
    same cap must NOT silently reuse the stashed book when indice keys
    differ (ADVICE r3): the mismatched key forces the fresh lookup path,
    which stays correct for the actual target."""
    rng = np.random.RandomState(13)
    shape = (9, 16, 16)
    kernel, stride, padding = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    fine_a = _rand_level(rng, 96, shape)
    fine_b = _rand_level(rng, 96, shape)      # same cap, different sites
    w_dn = jnp.asarray(rng.randn(27, 4, 6).astype(np.float32))
    w_up = jnp.asarray(rng.randn(27, 6, 5).astype(np.float32))

    coarse = sparse.sparse_conv3d(fine_a, w_dn, kernel, stride, padding,
                                  out_cap=128, indice_key='enc_a')
    # inverse onto the UNRELATED fine_b with a different key: falls back
    up_b = sparse.inverse_conv3d(coarse, fine_b, w_up, kernel, stride,
                                 padding, indice_key='other')
    coarse_fresh = coarse._replace(strided_rules=None, strided_meta=None)
    up_b_ref = sparse.inverse_conv3d(coarse_fresh, fine_b, w_up, kernel,
                                     stride, padding)
    np.testing.assert_array_equal(np.asarray(up_b.features),
                                  np.asarray(up_b_ref.features))
    # matching key on the true parent still takes the reuse path
    up_a = sparse.inverse_conv3d(coarse, fine_a, w_up, kernel, stride,
                                 padding, indice_key='enc_a')
    up_a_ref = sparse.inverse_conv3d(coarse_fresh, fine_a, w_up, kernel,
                                     stride, padding)
    np.testing.assert_array_equal(np.asarray(up_a.features),
                                  np.asarray(up_a_ref.features))


def test_unet_decoder_reuses_forward_books(monkeypatch):
    """The full UNetV2 decoder must take the indice-key-reuse path for all
    three inverse convs — the subm convs / BN / residual fusion between the
    encoder's strided convs and the decoder must not drop the stashed books
    (spconv shares rulebooks by indice_key name, rpn_unet.py; ours ride the
    SparseLevel through `_replace`)."""
    import jax
    from pcdet_tpu.models.backbones3d import UNetV2

    rng = np.random.RandomState(11)
    shape = (25, 16, 16)
    levels = [_rand_level(rng, 64, shape) for _ in range(2)]
    lv = sparse.SparseLevel(
        *[jnp.stack([getattr(l, f) for l in levels])
          for f in ('features', 'ids', 'coords', 'mask')], shape)

    model = UNetV2(sparse_shape=shape)
    variables = model.init(jax.random.PRNGKey(0), lv, train=False)
    bev_ref, aux_ref = model.apply(variables, lv, train=False)

    def boom(*a, **k):
        raise AssertionError('decoder fell back to fresh inverse lookup')
    monkeypatch.setattr(sparse, '_rules_inverse', boom)
    bev, aux = model.apply(variables, lv, train=False)
    np.testing.assert_array_equal(np.asarray(bev), np.asarray(bev_ref))
    np.testing.assert_array_equal(np.asarray(aux['u_seg_preds']),
                                  np.asarray(aux_ref['u_seg_preds']))
