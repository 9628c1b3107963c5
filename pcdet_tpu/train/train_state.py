"""Train state pytree + jitted train-step factory."""
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                    # scalar int32 (accumulated_iter)
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, tx):
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(variables['params']),
    )


def make_train_step(model, tx, donate=True):
    """Build the jitted train step: forward + loss + grad + optax update.

    Gradient all-reduce across the data mesh is inserted by XLA (the batch is
    sharded, params are replicated).  Equivalent of the reference hot loop
    train_utils.train_one_epoch:32-52 minus the host-side scheduler stepping
    (schedules are folded into optax via inject_hyperparams on state.step).
    """
    import inspect
    wants_rng = 'rng' in inspect.signature(model.forward).parameters
    base_key = jax.random.PRNGKey(20260816)
    # fork capability layer: differentiable re-voxelization between the
    # dataloader and the feedforward (reference train_utils.py:23,46), and
    # the MODE-gated BEV-seg loss path (reference pointpillar.py:151-160) —
    # both INSIDE the jitted step.
    from ..experiments import between_dataloading_and_feedforward
    loss_of = getattr(model, 'loss_with_bev', model.loss)

    def train_step(state: TrainState, batch):
        batch = between_dataloading_and_feedforward(batch, model.cfg,
                                                    train=True)

        def loss_fn(params):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            if wants_rng:
                rng = jax.random.fold_in(base_key, state.step)
                ret, new_stats = model.forward(variables, batch, train=True,
                                               rng=rng)
            else:
                ret, new_stats = model.forward(variables, batch, train=True)
            loss, tb = loss_of(ret, batch)
            return loss, (new_stats, tb)

        (loss, (new_stats, tb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt_state)
        tb = dict(tb)
        tb['loss'] = loss
        return new_state, tb

    if donate:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step)


def make_eval_forward(model):
    """Jitted eval forward: logits -> decoded + NMS'd fixed-shape preds."""
    from ..experiments import between_dataloading_and_feedforward

    def eval_forward(params, batch_stats, batch):
        batch = between_dataloading_and_feedforward(batch, model.cfg,
                                                    train=False)
        ret, _ = model.forward({'params': params, 'batch_stats': batch_stats},
                               batch, train=False)
        preds = model.predict(ret)
        # cap-overflow telemetry rides along (accumulated by the eval loop;
        # eval caps are tighter than train caps, so this is where a real
        # over-dense scene would silently truncate first)
        overflow = {k: jnp.asarray(v).sum()
                    for k, v in (ret.get('overflow') or {}).items()
                    if v is not None}
        if 'voxel_overflow' in batch:
            overflow['voxelizer'] = jnp.asarray(batch['voxel_overflow']).sum()
        return preds, overflow
    return jax.jit(eval_forward)
