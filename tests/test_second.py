"""SECOND end-to-end on a tiny grid: shapes, loss, grads, predict."""
import numpy as np
import pytest

from tiny_config import tiny_second_cfg

# XLA-compile-heavy on a 1-core host; run with -m slow (CI) or full suite
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def setup():
    import jax
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    from pcdet_tpu.datasets.dataset import collate_batch
    from pcdet_tpu.models.second import SECONDNet

    cfg = tiny_second_cfg(num_class=1)
    ds = SyntheticDataset(cfg, training=True)
    model = SECONDNet(cfg, ds.grid_size)
    ds.set_anchor_targets(model.anchor_targets)
    batch_np = collate_batch([ds[0], ds[1]])
    batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray) and k != 'sample_idx'}
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    return cfg, ds, model, batch, variables


def test_shapes(setup):
    cfg, ds, model, batch, variables = setup
    np.testing.assert_array_equal(ds.grid_size, [128, 128, 16])
    assert model.sparse_shape == (17, 128, 128)
    # feature map = grid/8 = 16x16, 2 anchors/loc/class
    assert model.anchor_targets.num_anchors == 16 * 16 * 2
    ret, _ = model.forward(variables, batch, train=False)
    assert ret['spatial_features'].shape[0] == 2
    # conv_out halves z (to 1 given 17//...), H/8, W/8
    assert ret['box_preds'].shape == (2, 16, 16, 2 * 7)


def test_loss_and_grads(setup):
    import jax
    import jax.numpy as jnp
    cfg, ds, model, batch, variables = setup

    def loss_fn(params):
        ret, _ = model.forward({'params': params,
                                'batch_stats': variables['batch_stats']},
                               batch, train=True)
        loss, tb = model.loss(ret, batch)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0
    # sparse backbone weights must receive gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    bb = [float(jnp.abs(g).sum()) for p, g in flat
          if 'backbone_3d' in str(p)]
    assert sum(bb) > 0


def test_predict(setup):
    cfg, ds, model, batch, variables = setup
    ret, _ = model.forward(variables, batch, train=False)
    preds = model.predict(ret)
    assert preds['boxes'].shape == (2, 64, 7)
    assert preds['valid'].shape == (2, 64)
