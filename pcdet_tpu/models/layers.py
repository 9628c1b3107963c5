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
            red_axes = tuple(range(x.ndim - 1))
            if mask is None:
                n = 1
                for d in x.shape[:-1]:
                    n *= d
                n = jnp.asarray(n, self.dtype)
                mean = jnp.mean(x, axis=red_axes)
                var = jnp.mean(jnp.square(x - mean), axis=red_axes)
            else:
                # mask: (x.shape[:-1]) row validity
                w = jnp.broadcast_to(mask.astype(self.dtype)[..., None], x.shape)
                n = jnp.maximum(jnp.sum(mask.astype(self.dtype)), 1.0)
                mean = jnp.sum(x * w, axis=red_axes) / n
                var = jnp.sum(jnp.square(x - mean) * w, axis=red_axes) / n
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
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
    """2D conv (NHWC) with torch default init and explicit padding."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        fan_in = x.shape[-1] * k * k
        kernel = self.param('kernel', torch_uniform_init(fan_in),
                            (k, k, x.shape[-1], self.features))
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

    @nn.compact
    def __call__(self, x):
        s = self.stride
        # torch ConvTranspose2d fan_in = out_channels * k * k
        fan_in = self.features * s * s
        kernel = self.param('kernel', torch_uniform_init(fan_in),
                            (s, s, x.shape[-1], self.features))
        n, h, w, c = x.shape
        k2 = kernel.transpose(2, 0, 1, 3).reshape(c, s * s * self.features)
        y = jnp.dot(x.reshape(-1, c), k2,
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

    @nn.compact
    def __call__(self, x, train: bool):
        x = TorchConv(self.features, self.kernel_size, self.stride,
                      self.padding, use_bias=not self.use_norm)(x)
        if self.use_norm:
            x = TorchBatchNorm(self.features)(x, train)
        return jax.nn.relu(x)


class DeconvBNReLU(nn.Module):
    features: int
    stride: int = 2
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        x = TorchConvTranspose(self.features, self.stride,
                               use_bias=not self.use_norm)(x)
        if self.use_norm:
            x = TorchBatchNorm(self.features)(x, train)
        return jax.nn.relu(x)
