"""pcdet_tpu — a TPU-native LiDAR 3D detection framework.

Re-implementation of the capabilities of PCDet (reference: /root/reference) with a
JAX / XLA / Pallas compute path designed for TPU:

- fixed-shape, fully-jittable detect path (voxelize -> VFE -> backbone -> head -> NMS)
- host-side numpy data pipeline (augmentation, GT-sampling, target assignment)
  streamed ahead of device step time
- data-parallel training over a `jax.sharding.Mesh` with XLA collectives
"""

__version__ = "0.1.0"
