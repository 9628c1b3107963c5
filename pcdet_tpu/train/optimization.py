"""Optimizers + LR/momentum schedules (optax).

Parity targets:
  - adam_onecycle (default in all reference cfgs): fastai OptimWrapper with
    true (decoupled) weight decay applied to every param incl. BN (bn_wd=True,
    fastai_optim.py:135-148), Adam betas=(scheduled_mom, 0.99), and the
    OneCycle cosine lr/momentum phases stepped PER ITERATION
    (learning_schedules_fastai.py:58-75).
  - adam / sgd with per-iter LambdaLR step decay + optional cosine warmup
    (optimization/__init__.py:37-88).
"""
import math
from functools import partial

import numpy as np
import optax


def annealing_cos(start, end, pct):
    cos_out = math.cos(math.pi * pct) + 1
    return end + (start - end) / 2 * cos_out


def onecycle_lr_schedule(total_steps, lr_max, div_factor, pct_start):
    low_lr = lr_max / div_factor
    split = int(total_steps * pct_start)

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.minimum(step, total_steps)
        pct1 = step / max(split, 1)
        pct2 = (step - split) / max(total_steps - split, 1)
        cos1 = jnp.cos(jnp.pi * jnp.clip(pct1, 0, 1)) + 1
        cos2 = jnp.cos(jnp.pi * jnp.clip(pct2, 0, 1)) + 1
        lr1 = lr_max + (low_lr - lr_max) / 2 * cos1
        lr2 = low_lr / 1e4 + (lr_max - low_lr / 1e4) / 2 * cos2
        return jnp.where(step < split, lr1, lr2)
    return schedule


def onecycle_mom_schedule(total_steps, moms, pct_start):
    m0, m1 = moms
    split = int(total_steps * pct_start)

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.minimum(step, total_steps)
        pct1 = step / max(split, 1)
        pct2 = (step - split) / max(total_steps - split, 1)
        cos1 = jnp.cos(jnp.pi * jnp.clip(pct1, 0, 1)) + 1
        cos2 = jnp.cos(jnp.pi * jnp.clip(pct2, 0, 1)) + 1
        a = m1 + (m0 - m1) / 2 * cos1
        b = m0 + (m1 - m0) / 2 * cos2
        return jnp.where(step < split, a, b)
    return schedule


def step_decay_lr_schedule(base_lr, decay_step_list, total_iters_each_epoch,
                           lr_decay, lr_clip):
    decay_steps = [x * total_iters_each_epoch for x in decay_step_list]

    def schedule(step):
        import jax.numpy as jnp
        cur_decay = 1.0
        decay = jnp.asarray(1.0)
        for ds in decay_steps:
            decay = jnp.where(step >= ds, decay * lr_decay, decay)
        return base_lr * jnp.maximum(decay, lr_clip / base_lr)
    return schedule


def warmup_cosine_lr_schedule(base_lr, eta_min, t_max):
    def schedule(step):
        import jax.numpy as jnp
        return eta_min + (base_lr - eta_min) * (
            1 - jnp.cos(jnp.pi * step / t_max)) / 2
    return schedule


def _freeze_wrap(tx, frozen_prefixes):
    """Route params whose top path starts with a frozen prefix through
    set_to_zero — the functional equivalent of the reference's
    `requires_grad = False` epoch hook (experiments.training_before_epoch).
    """
    if not frozen_prefixes:
        return tx

    def labels(params):
        import flax.traverse_util as tu
        flat = tu.flatten_dict(params)
        def frozen(k):
            # match whole path components: freezing 'conv1' must not also
            # freeze 'conv1_extra', nor 'backbone' freeze 'backbone_3d'
            path = '/'.join(str(s) for s in k)
            return any(path == p or path.startswith(p + '/')
                       for p in frozen_prefixes)
        out = {k: ('freeze' if frozen(k) else 'train') for k in flat}
        return tu.unflatten_dict(out)

    return optax.multi_transform(
        {'train': tx, 'freeze': optax.set_to_zero()}, labels)


def build_optimizer_and_schedule(optim_cfg, total_iters_each_epoch,
                                 total_epochs, frozen_prefixes=()):
    """:return: (optax tx, lr_schedule fn) — tx already folds in grad clipping
    and (optionally) param freezing by top-level path prefix.

    The lr schedule is returned separately for logging.
    """
    tx, lr_sched = _build_base(optim_cfg, total_iters_each_epoch,
                               total_epochs)
    return _freeze_wrap(tx, tuple(frozen_prefixes)), lr_sched


def _build_base(optim_cfg, total_iters_each_epoch, total_epochs):
    total_steps = total_iters_each_epoch * total_epochs
    name = optim_cfg.OPTIMIZER
    clip = optax.clip_by_global_norm(float(optim_cfg.GRAD_NORM_CLIP))

    if name == 'adam_onecycle':
        lr_sched = onecycle_lr_schedule(total_steps, float(optim_cfg.LR),
                                        float(optim_cfg.DIV_FACTOR),
                                        float(optim_cfg.PCT_START))
        mom_sched = onecycle_mom_schedule(total_steps, list(optim_cfg.MOMS),
                                          float(optim_cfg.PCT_START))
        tx = optax.chain(
            clip,
            optax.inject_hyperparams(optax.scale_by_adam)(
                b1=mom_sched, b2=0.99),
            optax.add_decayed_weights(float(optim_cfg.WEIGHT_DECAY)),
            optax.inject_hyperparams(lambda learning_rate: optax.scale(
                -learning_rate))(learning_rate=lr_sched),
        )
        return tx, lr_sched

    if name == 'adam':
        lr_sched = step_decay_lr_schedule(
            float(optim_cfg.LR), list(optim_cfg.DECAY_STEP_LIST),
            total_iters_each_epoch, float(optim_cfg.LR_DECAY),
            float(optim_cfg.LR_CLIP))
        tx = optax.chain(
            clip,
            optax.add_decayed_weights(float(optim_cfg.WEIGHT_DECAY)),  # L2
            optax.scale_by_adam(b1=0.9, b2=0.999),
            optax.inject_hyperparams(lambda learning_rate: optax.scale(
                -learning_rate))(learning_rate=lr_sched),
        )
        return tx, lr_sched

    if name == 'sgd':
        lr_sched = step_decay_lr_schedule(
            float(optim_cfg.LR), list(optim_cfg.DECAY_STEP_LIST),
            total_iters_each_epoch, float(optim_cfg.LR_DECAY),
            float(optim_cfg.LR_CLIP))
        tx = optax.chain(
            clip,
            optax.add_decayed_weights(float(optim_cfg.WEIGHT_DECAY)),
            optax.trace(decay=float(optim_cfg.MOMENTUM)),
            optax.inject_hyperparams(lambda learning_rate: optax.scale(
                -learning_rate))(learning_rate=lr_sched),
        )
        return tx, lr_sched

    raise NotImplementedError(name)
