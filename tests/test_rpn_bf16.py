"""Eval-only bf16 dense conv stack: active at eval, exact at train.

Mirrors the sparse backbone's compute_dtype_test contract
(tests/test_sparse_packed.py): training and torch-parity stay exact f32;
eval logits track f32 within bf16 rounding.
"""
import numpy as np


def _build(cd):
    import jax
    from pcdet_tpu.models.rpn_head import RPNV2
    m = RPNV2(num_class=3, num_anchors_per_location=6,
              layer_nums=(2, 2), layer_strides=(2, 2),
              num_filters=(16, 32), upsample_strides=(1, 2),
              num_upsample_filters=(16, 16), compute_dtype_test=cd)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8))
    v = m.init(jax.random.PRNGKey(0), x, True)
    return m, v, x


def test_eval_bf16_within_rounding_and_train_exact():
    m32, v, x = _build('')
    m16, _, _ = _build('bfloat16')

    e32 = m32.apply(v, x, False, mutable=False)
    e16 = m16.apply(v, x, False, mutable=False)
    for k in ('box_preds', 'cls_preds', 'dir_cls_preds'):
        a, b = np.asarray(e32[k]), np.asarray(e16[k])
        assert not np.array_equal(a, b), f'{k}: bf16 path inactive at eval'
        denom = np.maximum(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 3e-2, k

    t32, _ = m32.apply(v, x, True, mutable=['batch_stats'])
    t16, _ = m16.apply(v, x, True, mutable=['batch_stats'])
    for k in ('box_preds', 'cls_preds', 'dir_cls_preds'):
        np.testing.assert_array_equal(np.asarray(t32[k]),
                                      np.asarray(t16[k]),
                                      err_msg=f'{k}: train path not exact')


import pytest


@pytest.mark.parametrize('which', ['spconv', 'fc'])
def test_rcnn_eval_bf16_within_rounding_and_train_exact(which):
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.roi_heads import FCRCNNModule, SpConvRCNNModule

    rng = np.random.RandomState(0)
    o = 6
    part = rng.randn(4, o, o, o, 4).astype(np.float32)
    part[:, : o // 2] = 0.0                     # some inactive cells
    rpnf = rng.randn(4, o, o, o, 16).astype(np.float32)
    rpnf[np.abs(part).sum(-1) == 0] = 0.0
    part, rpnf = jnp.asarray(part), jnp.asarray(rpnf)

    def build(cd):
        if which == 'fc':
            return FCRCNNModule(pool_size=o, shared_fc=(32, 64, 64, 64),
                                cls_fc=(32,), reg_fc=(32,),
                                compute_dtype_test=cd)
        return SpConvRCNNModule(pool_size=o, shared_fc=(32, 64, 64, 64),
                                cls_fc=(32,), reg_fc=(32,),
                                compute_dtype_test=cd)

    m32, m16 = build(''), build('bfloat16')
    v = m32.init({'params': jax.random.PRNGKey(0),
                  'dropout': jax.random.PRNGKey(1)}, part, rpnf, True)
    c32, r32 = m32.apply(v, part, rpnf, False)
    c16, r16 = m16.apply(v, part, rpnf, False)
    assert not np.array_equal(np.asarray(c32), np.asarray(c16)), \
        'bf16 path inactive at eval'
    for a, b in ((c32, c16), (r32, r16)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 5e-2

    kw = dict(mutable=['batch_stats'],
              rngs={'dropout': jax.random.PRNGKey(2)})
    (tc32, tr32), _ = m32.apply(v, part, rpnf, True, **kw)
    (tc16, tr16), _ = m16.apply(v, part, rpnf, True, **kw)
    np.testing.assert_array_equal(np.asarray(tc32), np.asarray(tc16))
    np.testing.assert_array_equal(np.asarray(tr32), np.asarray(tr16))
