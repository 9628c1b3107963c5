"""Device mesh + sharding helpers for data-parallel training.

TPU-native replacement for the reference's torch.distributed/NCCL DDP stack
(common_utils.py:122-165, tools/train.py:119-122): a 1-axis `data` mesh;
batches are sharded over it, parameters/optimizer state are replicated, and
XLA inserts the gradient all-reduce (psum over ICI) automatically when the
jitted train step consumes sharded batches and produces replicated params —
exactly DDP's semantics with zero hand-written collectives.

Multi-host: `jax.distributed.initialize()` + per-host dataset sharding
(datasets.loader host_id/num_hosts) replace SLURM + DistributedSampler.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name='data'):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name='data'):
    """Shard the leading (batch) axis of every array in the batch."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name='data'):
    """Device-put a host batch dict with the batch axis sharded over `mesh`."""
    sh = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sh) for k, v in batch.items()
            if not np.isscalar(v)}


def replicate_state(state, mesh):
    return jax.device_put(state, replicated(mesh))
