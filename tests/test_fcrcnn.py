"""FCRCNN head (Part-A²-fc variant): shapes + gradient flow."""
import numpy as np
import pytest


@pytest.mark.slow
def test_fcrcnn_forward_and_grads():
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.roi_heads import FCRCNNModule

    rng = np.random.RandomState(0)
    n, o, c = 6, 12, 16
    pooled_part = jnp.asarray(rng.rand(n, o, o, o, 4).astype(np.float32)
                              * (rng.rand(n, o, o, o, 1) > 0.7))
    pooled_rpn = jnp.asarray(rng.randn(n, o, o, o, c).astype(np.float32))

    mod = FCRCNNModule(num_point_features=c, pool_size=o,
                       shared_fc=(128, 64, 64), cls_fc=(32,), reg_fc=(32,),
                       dp_ratio=0.3)
    variables = mod.init(jax.random.PRNGKey(0), pooled_part, pooled_rpn,
                         train=False)
    cls, reg = mod.apply(variables, pooled_part, pooled_rpn, False)
    assert cls.shape == (n, 1)
    assert reg.shape == (n, 7)

    def loss_fn(params):
        (c_, r_), _ = mod.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            pooled_part, pooled_rpn, True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(1)})
        return (c_ ** 2).sum() + (r_ ** 2).sum()

    grads = jax.grad(loss_fn)(variables['params'])
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0
