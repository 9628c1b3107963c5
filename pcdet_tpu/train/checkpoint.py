"""Checkpointing (orbax) with the reference's epoch-tagged naming contract.

Reference behaviour mirrored (train_utils.py:104-155, detector3d.py:325-382,
tools/train.py:109-116):
  - save `checkpoint_epoch_<N>` every interval, prune to max_ckpt_save_num
    oldest-first by mtime
  - resume = newest checkpoint in the dir (with optimizer state)
  - shape-tolerant partial load for pretrained weights
"""
import glob
import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_state import TrainState


def _ckpt_path(ckpt_dir, epoch):
    return os.path.join(os.path.abspath(ckpt_dir), 'checkpoint_epoch_%d' % epoch)


def save_checkpoint(state: TrainState, ckpt_dir, epoch,
                    max_ckpt_save_num=None, version='pcdet_tpu+0.1.0'):
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        'epoch': epoch,
        'it': int(jax.device_get(state.step)),
        'model_state': {
            'params': jax.device_get(state.params),
            'batch_stats': jax.device_get(state.batch_stats),
        },
        'optimizer_state': jax.device_get(state.opt_state),
        'version': version,
    }
    ckptr = ocp.PyTreeCheckpointer()
    path = _ckpt_path(ckpt_dir, epoch)
    ckptr.save(path, payload, force=True)

    if max_ckpt_save_num is not None:
        ckpts = glob.glob(os.path.join(ckpt_dir, 'checkpoint_epoch_*'))
        ckpts.sort(key=os.path.getmtime)
        while len(ckpts) > max_ckpt_save_num:
            victim = ckpts.pop(0)
            import shutil
            shutil.rmtree(victim, ignore_errors=True)
    return path


def list_checkpoints(ckpt_dir):
    # a killed run leaves `*.orbax-checkpoint-tmp` dirs: incomplete, must
    # never be resumed from (reference tolerates in-flight writes by
    # sleeping, tools/test.py watcher; here we just exclude them)
    ckpts = [p for p in glob.glob(os.path.join(ckpt_dir, 'checkpoint_epoch_*'))
             if not p.endswith('.orbax-checkpoint-tmp')]
    ckpts.sort(key=os.path.getmtime)
    return ckpts


def latest_checkpoint(ckpt_dir):
    ckpts = list_checkpoints(ckpt_dir)
    return ckpts[-1] if ckpts else None


def load_checkpoint(path):
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def restore_train_state(path, state: TrainState):
    """Full resume (with optimizer), reference load_params_with_optimizer."""
    payload = load_checkpoint(path)

    def cast_like(ref, new):
        return jax.tree_util.tree_map(
            lambda r, n: np.asarray(n, dtype=r.dtype), ref, new)

    new_state = TrainState(
        step=jax.numpy.asarray(payload['it'], jax.numpy.int32),
        params=cast_like(jax.device_get(state.params),
                         payload['model_state']['params']),
        batch_stats=cast_like(jax.device_get(state.batch_stats),
                              payload['model_state']['batch_stats']),
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(jax.device_get(state.opt_state)),
            jax.tree_util.tree_leaves(payload['optimizer_state'])),
    )
    return new_state, int(payload['epoch'])


def load_params_partial(path, variables, logger=None):
    """Shape-tolerant pretrained load (reference load_params_from_file:325-351).

    Leaves present in the checkpoint with matching shapes are copied; anything
    else keeps its fresh init.
    """
    payload = load_checkpoint(path)
    disk = payload['model_state']

    def merge(tree, disk_tree, prefix=''):
        out = {}
        for k, v in tree.items():
            key = f'{prefix}/{k}' if prefix else k
            if isinstance(v, dict):
                out[k] = merge(v, disk_tree.get(k, {}) if isinstance(disk_tree, dict) else {}, key)
            else:
                dv = disk_tree.get(k, None) if isinstance(disk_tree, dict) else None
                if dv is not None and np.shape(dv) == np.shape(v):
                    out[k] = np.asarray(dv, dtype=np.asarray(v).dtype)
                else:
                    if logger is not None:
                        logger.info('Not updated weight %s: %s' % (key, np.shape(v)))
                    out[k] = v
        return out

    new_vars = {
        'params': merge(jax.device_get(variables['params']),
                        disk.get('params', {})),
        'batch_stats': merge(jax.device_get(variables.get('batch_stats', {})),
                             disk.get('batch_stats', {})),
    }
    return new_vars, payload.get('epoch', -1), payload.get('it', 0)
