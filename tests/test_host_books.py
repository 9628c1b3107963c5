"""Host-built rulebooks (ops/host_books.py) vs the device builders.

Contract: identical out_ids/out_coords/out_mask/dropped, identical `found`,
identical `rows` wherever found — and therefore bit-identical model outputs
when the books are fed through the batch dict (`hb_*` keys).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcdet_tpu.ops import host_books, sparse


def _random_level(seed, v=128, frac=0.55, shape=(7, 12, 14)):
    rng = np.random.RandomState(seed)
    n = int(v * frac)
    ids = np.sort(rng.choice(np.prod(shape), n, replace=False))
    coords = np.stack([ids // (shape[1] * shape[2]),
                       (ids // shape[2]) % shape[1],
                       ids % shape[2]], axis=-1).astype(np.int32)
    coords_p = np.full((v, 3), -1, np.int32)
    coords_p[:n] = coords
    mask = np.zeros((v,), bool)
    mask[:n] = True
    feats = rng.randn(v, 4).astype(np.float32) * mask[:, None]
    ids_p = np.full((v,), sparse.INT_MAX, np.int32)
    ids_p[:n] = ids
    level = sparse.SparseLevel(
        features=jnp.asarray(feats), ids=jnp.asarray(ids_p),
        coords=jnp.asarray(coords_p), mask=jnp.asarray(mask), shape=shape)
    return level, coords_p, mask


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_subm_book_parity(seed):
    level, coords, mask = _random_level(seed)
    rows_d, found_d = jax.jit(
        lambda: sparse._rules_subm(level, (3, 3, 3)))()
    rows_h, found_h = host_books.subm_book_np(coords, mask, level.shape)
    np.testing.assert_array_equal(np.asarray(found_d), found_h)
    f = found_h
    np.testing.assert_array_equal(np.asarray(rows_d)[f], rows_h[f])


GEOMS = [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1), 128),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1), 128),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0), 128),
    ((3, 1, 1), (2, 1, 1), (1, 0, 0), 128),
    ((3, 3, 3), (2, 2, 2), (1, 1, 1), 24),      # cap truncation
]


@pytest.mark.parametrize('kernel,stride,padding,cap', GEOMS)
@pytest.mark.parametrize('seed', [0, 5])
def test_strided_book_parity(kernel, stride, padding, cap, seed):
    level, coords, mask = _random_level(seed)
    out = jax.jit(lambda: sparse._strided_out_set(
        level, kernel, stride, padding, cap))()
    oid_d, ocrd_d, omsk_d, _, drop_d, rows_d, found_d = out
    oid_h, ocrd_h, omsk_h, drop_h, rows_h, found_h = \
        host_books.strided_book_np(coords, mask, level.shape, kernel,
                                   stride, padding, cap)
    np.testing.assert_array_equal(np.asarray(oid_d), oid_h)
    np.testing.assert_array_equal(np.asarray(omsk_d), omsk_h)
    np.testing.assert_array_equal(np.asarray(ocrd_d), ocrd_h)
    assert int(drop_d) == int(drop_h)
    np.testing.assert_array_equal(np.asarray(found_d), found_h)
    f = found_h
    np.testing.assert_array_equal(np.asarray(rows_d)[f], rows_h[f])


def test_native_matches_numpy_oracle():
    """C++ builders (compact wire format) == numpy oracle on a mixed spec,
    including cap truncation and the (3,1,1) conv_out geometry."""
    from pcdet_tpu import native
    if native.get_lib() is None:
        pytest.skip('no native toolchain')
    rng = np.random.RandomState(7)
    B, V, shape = 3, 256, (9, 24, 28)
    coords = np.zeros((B, V, 3), np.int32)
    mask = np.zeros((B, V), bool)
    for b in range(B):
        n = 150 + 20 * b
        ids = np.sort(rng.choice(np.prod(shape), n, replace=False))
        coords[b, :n] = np.stack([ids // (shape[1] * shape[2]),
                                  (ids // shape[2]) % shape[1],
                                  ids % shape[2]], axis=-1)
        mask[b, :n] = True
    spec = host_books.encoder_spec(shape, [200, 120, 60, 40], (0, 0, 0))
    flat_native = host_books._build_books_batch_native(coords, mask, shape,
                                                       spec)
    assert flat_native is not None
    per = [host_books.pack_books(host_books.build_books_sample(
        coords[b], mask[b], shape, spec)) for b in range(B)]
    flat_np = {k: np.stack([p[k] for p in per]) for k in per[0]}
    assert set(flat_native) == set(flat_np)
    for k in sorted(flat_np):
        a, b = flat_np[k], flat_native[k]
        if k.endswith('_rows'):
            K = a.shape[-1]
            fa = ((flat_np[k[:-5] + '_fnd'][..., None]
                   >> np.arange(K, dtype=np.uint32)) & 1) > 0
            np.testing.assert_array_equal(a[fa], b[fa], err_msg=k)
        else:
            np.testing.assert_array_equal(a, b, err_msg=k)


def _second_setup():
    from tiny_config import tiny_second_cfg
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    from pcdet_tpu.datasets.dataset import collate_batch
    from pcdet_tpu.models.second import SECONDNet
    cfg = tiny_second_cfg(num_class=1)
    ds = SyntheticDataset(cfg, training=True)
    model = SECONDNet(cfg, ds.grid_size)
    ds.set_anchor_targets(model.anchor_targets)
    batch_np = collate_batch([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray) and k != 'sample_idx'}
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    return model, batch_np, batch, variables


def _with_books(model, batch_np, batch, train):
    spec = model.host_book_spec(batch_np['coordinates'].shape[1], train)
    flat = host_books.build_books_batch(
        np.asarray(batch_np['coordinates']),
        np.asarray(batch_np['voxel_mask']), model.sparse_shape, spec)
    out = dict(batch)
    out.update({k: jnp.asarray(v) for k, v in flat.items()})
    return out


@pytest.mark.slow
def test_second_eval_bit_identical_with_host_books():
    model, batch_np, batch, variables = _second_setup()
    ret0, _ = jax.jit(lambda b: model.forward(variables, b, False))(batch)
    batch_b = _with_books(model, batch_np, batch, train=False)
    ret1, _ = jax.jit(lambda b: model.forward(variables, b, False))(batch_b)
    for k in ('box_preds', 'cls_preds', 'spatial_features'):
        np.testing.assert_array_equal(np.asarray(ret0[k]),
                                      np.asarray(ret1[k]), err_msg=k)
    for k, v in ret0['overflow'].items():
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(ret1['overflow'][k]),
                                      err_msg='overflow/' + k)


@pytest.mark.slow
def test_second_train_grads_bit_identical_with_host_books():
    model, batch_np, batch, variables = _second_setup()

    def loss_fn(params, b):
        ret, _ = model.forward({'params': params,
                                'batch_stats': variables['batch_stats']},
                               b, train=True)
        loss, _ = model.loss(ret, b)
        return loss

    batch_b = _with_books(model, batch_np, batch, train=True)
    g = jax.jit(jax.grad(loss_fn))
    g0 = g(variables['params'], batch)
    g1 = g(variables['params'], batch_b)
    leaves0 = jax.tree_util.tree_leaves(g0)
    leaves1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_parta2_eval_bit_identical_with_host_books():
    from tiny_config import tiny_parta2_cfg
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    from pcdet_tpu.datasets.dataset import collate_batch
    from pcdet_tpu.models.parta2 import PartA2Net
    cfg = tiny_parta2_cfg(num_class=1)
    ds = SyntheticDataset(cfg, training=True)
    model = PartA2Net(cfg, ds.grid_size)
    ds.set_anchor_targets(model.anchor_targets)
    batch_np = collate_batch([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray) and k != 'sample_idx'}
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    ret0, _ = jax.jit(lambda b: model.forward(variables, b, False))(batch)
    batch_b = _with_books(model, batch_np, batch, train=False)
    ret1, _ = jax.jit(lambda b: model.forward(variables, b, False))(batch_b)
    for k in ('box_preds', 'cls_preds', 'u_seg_preds', 'u_reg_preds'):
        np.testing.assert_array_equal(np.asarray(ret0[k]),
                                      np.asarray(ret1[k]), err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(ret0['rcnn']['rcnn_cls']),
        np.asarray(ret1['rcnn']['rcnn_cls']))
