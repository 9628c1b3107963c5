"""PointPillar end-to-end: shapes, loss, gradient flow, overfit, predict."""
import numpy as np
import pytest

from tiny_config import tiny_pointpillar_cfg

# XLA-compile-heavy on a 1-core host; run with -m slow (CI) or full suite
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def setup():
    import jax
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    from pcdet_tpu.datasets.dataset import collate_batch
    from pcdet_tpu.models.pointpillar import PointPillar

    cfg = tiny_pointpillar_cfg(num_class=1)
    ds = SyntheticDataset(cfg, training=True)
    model = PointPillar(cfg, ds.grid_size)
    ds.set_anchor_targets(model.anchor_targets)
    batch_np = collate_batch([ds[0], ds[1]])
    batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray) and k != 'sample_idx'}
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    return cfg, ds, model, batch, variables


def test_shapes_and_anchor_count(setup):
    cfg, ds, model, batch, variables = setup
    # grid: 64 x 64 pillars (32m/0.5m); feature map 32x32; 2 anchors/loc
    np.testing.assert_array_equal(ds.grid_size, [64, 64, 1])
    assert model.anchor_targets.num_anchors == 32 * 32 * 2
    assert batch['voxels'].shape == (2, 2000, 16, 4)
    assert batch['box_cls_labels'].shape == (2, 32 * 32 * 2)
    assert batch['box_reg_targets'].shape == (2, 32 * 32 * 2, 7)


def test_forward_and_loss(setup):
    import jax
    cfg, ds, model, batch, variables = setup
    ret, new_stats = model.forward(variables, batch, train=True)
    assert ret['box_preds'].shape == (2, 32, 32, 2 * 7)
    assert ret['cls_preds'].shape == (2, 32, 32, 2 * 1)
    assert ret['dir_cls_preds'].shape == (2, 32, 32, 2 * 2)
    loss, tb = model.loss(ret, batch)
    assert np.isfinite(float(loss))
    # focal bias init => initial cls loss should be small-ish but positive
    assert float(tb['rpn_loss_cls']) > 0

    # BN stats must update in train mode
    old = variables['batch_stats']
    changed = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(np.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_stats, old), 0.0)
    assert changed != 0.0


def test_gradients_flow(setup):
    import jax
    import jax.numpy as jnp
    cfg, ds, model, batch, variables = setup

    def loss_fn(params):
        ret, _ = model.forward({'params': params,
                                'batch_stats': variables['batch_stats']},
                               batch, train=True)
        loss, _ = model.loss(ret, batch)
        return loss

    grads = jax.grad(loss_fn)(variables['params'])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0


def test_overfit_two_scenes(setup):
    """Loss must drop sharply when overfitting 2 fixed scenes."""
    import jax
    import jax.numpy as jnp
    import optax
    cfg, ds, model, batch, variables = setup

    tx = optax.adam(3e-3)
    params = variables['params']
    stats = variables['batch_stats']
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            ret, new_stats = model.forward({'params': p, 'batch_stats': stats},
                                           batch, train=True)
            loss, tb = model.loss(ret, batch)
            return loss, (new_stats, tb)
        (loss, (new_stats, tb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    losses = []
    for i in range(60):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_predict_shapes(setup):
    import jax
    cfg, ds, model, batch, variables = setup
    ret, _ = model.forward(variables, batch, train=False)
    preds = model.predict(ret)
    assert preds['boxes'].shape == (2, 64, 7)
    assert preds['scores'].shape == (2, 64)
    assert preds['labels'].shape == (2, 64)
    assert preds['valid'].shape == (2, 64)
