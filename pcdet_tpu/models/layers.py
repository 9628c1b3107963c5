"""Flax building blocks with torch-parity initialisation and BN semantics.

The reference's AP numbers depend on details like BatchNorm(eps=1e-3,
momentum=0.01), torch's default kaiming-uniform init, and the focal-loss bias
init (SURVEY.md §7 hard-part #4).  These wrappers reproduce those semantics on
top of flax.linen; data layout is NHWC (TPU-preferred) instead of NCHW.
"""
import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


# BatchNorm device-grouping (reference parity): torch DDP's default is
# per-GPU BN statistics, with --sync_bn as opt-in
# (reference tools/train.py:94-95 convert_sync_batchnorm).  Under SPMD a
# plain batch-axis mean IS SyncBN; setting groups = device count computes
# stats per contiguous batch shard instead — each group's reduction stays
# on its own device (no collective), exactly emulating per-GPU BN.
# Set ONCE before building/tracing the train step (jit traces cache it).
BN_GROUPS = 1


def set_bn_groups(groups: int):
    global BN_GROUPS
    BN_GROUPS = max(int(groups), 1)


def torch_uniform_init(fan_in):
    """torch kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchBatchNorm(nn.Module):
    """BatchNorm matching torch semantics.

    - running = (1 - momentum) * running + momentum * batch  (momentum=0.01)
    - normalisation uses biased batch var; running var update uses unbiased
    - optional per-row `mask` restricts statistics to valid rows (used by the
      pillar VFE so that padding voxels don't shift statistics; the reference
      computes stats only over real voxels since it never pads)
    """
    features: int
    eps: float = 1e-3
    momentum: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mask=None):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda *_: jnp.zeros(self.features, self.dtype))
        ra_var = self.variable('batch_stats', 'var',
                               lambda *_: jnp.ones(self.features, self.dtype))

        if train:
            g = BN_GROUPS if (BN_GROUPS > 1 and x.ndim >= 2
                              and x.shape[0] % BN_GROUPS == 0) else 1
            c = self.features
            xg = x.reshape((g, x.shape[0] // g) + x.shape[1:])
            red_axes = tuple(range(1, xg.ndim - 1))
            if mask is None:
                n = 1
                for d in xg.shape[1:-1]:
                    n *= d
                n = jnp.full((g, 1), n, self.dtype)
                mean = jnp.mean(xg, axis=red_axes)              # (g, C)
                var = jnp.mean(
                    jnp.square(xg - mean.reshape((g,) + (1,) * (xg.ndim - 2)
                                                 + (c,))), axis=red_axes)
            else:
                mg = mask.astype(self.dtype).reshape(
                    (g, x.shape[0] // g) + mask.shape[1:])
                w = jnp.broadcast_to(mg[..., None], xg.shape)
                n = jnp.maximum(w[..., 0].sum(axis=red_axes), 1.0)[:, None]
                mean = jnp.sum(xg * w, axis=red_axes) / n       # (g, C)
                mexp = mean.reshape((g,) + (1,) * (xg.ndim - 2) + (c,))
                var = jnp.sum(jnp.square(xg - mexp) * w, axis=red_axes) / n
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                # per-device BN: group 0 plays DDP rank 0 (whose buffers the
                # reference checkpoints); sync BN (g=1) reduces to the usual
                ra_mean.value = (1 - m) * ra_mean.value + m * mean[0]
                ra_var.value = (1 - m) * ra_var.value + m * unbiased[0]
            shape = (g,) + (1,) * (xg.ndim - 2) + (c,)
            y = ((xg - mean.reshape(shape))
                 * jax.lax.rsqrt(var.reshape(shape) + self.eps))
            return y.reshape(x.shape) * scale + bias

        mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class TorchLinear(nn.Module):
    """Dense layer with torch default init."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param('kernel', torch_uniform_init(fan_in),
                            (fan_in, self.features))
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param('bias', torch_uniform_init(fan_in), (self.features,))
            y = y + b
        return y


class TorchConv(nn.Module):
    """2D conv (NHWC) with torch default init and explicit padding.

    ``compute_dtype`` (e.g. bfloat16) casts activations and kernel for the
    MXU multiply; accumulation and output stay f32
    (preferred_element_type) — the standard TPU mixed-precision recipe.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    bias_init: Optional[Callable] = None
    compute_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        fan_in = x.shape[-1] * k * k
        kernel = self.param('kernel', torch_uniform_init(fan_in),
                            (k, k, x.shape[-1], self.features))
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            kernel = kernel.astype(self.compute_dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            binit = self.bias_init or torch_uniform_init(fan_in)
            b = self.param('bias', binit, (self.features,))
            y = y + b
        return y


class TorchConvTranspose(nn.Module):
    """2D transposed conv (NHWC), kernel == stride (the only mode RPNV2 uses).

    Exact torch ConvTranspose2d semantics
    (out[i*s+a, j*s+b, o] = sum_c x[i, j, c] * w[a, b, c, o]) expressed as a
    single matmul + pixel shuffle — lands on the MXU with no scatter.
    """
    features: int
    stride: int = 2
    use_bias: bool = True
    compute_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        s = self.stride
        # torch ConvTranspose2d fan_in = out_channels * k * k
        fan_in = self.features * s * s
        kernel = self.param('kernel', torch_uniform_init(fan_in),
                            (s, s, x.shape[-1], self.features))
        n, h, w, c = x.shape
        k2 = kernel.transpose(2, 0, 1, 3).reshape(c, s * s * self.features)
        xf = x.reshape(-1, c)
        if self.compute_dtype is not None:
            xf = xf.astype(self.compute_dtype)
            k2 = k2.astype(self.compute_dtype)
        y = jnp.dot(xf, k2,
                    preferred_element_type=jnp.float32)
        y = y.reshape(n, h, w, s, s, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * s, w * s,
                                                  self.features)
        if self.use_bias:
            b = self.param('bias', torch_uniform_init(fan_in), (self.features,))
            y = y + b
        return y


class ConvBNReLU(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_norm: bool = True
    compute_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = TorchConv(self.features, self.kernel_size, self.stride,
                      self.padding, use_bias=not self.use_norm,
                      compute_dtype=self.compute_dtype)(x)
        if self.use_norm:
            x = TorchBatchNorm(self.features)(x, train)
        return jax.nn.relu(x)


class DeconvBNReLU(nn.Module):
    features: int
    stride: int = 2
    use_norm: bool = True
    compute_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = TorchConvTranspose(self.features, self.stride,
                               use_bias=not self.use_norm,
                               compute_dtype=self.compute_dtype)(x)
        if self.use_norm:
            x = TorchBatchNorm(self.features)(x, train)
        return jax.nn.relu(x)
