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
