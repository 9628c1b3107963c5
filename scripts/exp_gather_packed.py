"""Experiment: bf16 pair-packed feature tables in the Pallas gather-GEMM.

Mosaic on this jaxlib cannot lower narrow bf16 row loads
(vector<1x1xCxbf16>, C < 128), so `compute_dtype: bfloat16` has been a
TPU no-op.  Workaround under test (round-2 verdict weak #4): pack TWO bf16
channel values into one f32 word host-side, dynamic-row-load the (V+1, C/2)
f32 table (supported), and bitcast back to bf16 INSIDE the kernel before
the MXU dot.

Measures correctness (vs f32 kernel) and per-call time at SECOND shapes.
"""
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', str(ROOT / '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcdet_tpu.ops.pallas.gather_gemm import TV, _gather_matmul_fwd_only

V, C, COUT, K = 16384, 64, 64, 27


def _kernel_packed(rules_ref, featsp_ref, w_ref, out_ref, g_scratch):
    # featsp_ref: (V+1, C/2) int32, each word = two packed bf16 channels
    # (hi = channel 2c+1, lo = channel 2c).  A bf16's value is EXACTLY the
    # f32 whose top 16 bits are its bits, so unpacking is shift/mask + a
    # SAME-WIDTH bitcast (Mosaic rejects width-changing bitcasts).
    # w_ref: (K, 2, C/2, Cout) f32 — w_ref[k, 0] = even channels' rows,
    # w_ref[k, 1] = odd.  g_scratch: (TV, C/2) int32.
    k_taps = w_ref.shape[0]
    cout = w_ref.shape[3]

    def tap_body(k, acc):
        for i in range(TV):
            row = rules_ref[i, k]
            g_scratch[i, :] = featsp_ref[row, :]
        wv = g_scratch[:]
        lo = jax.lax.bitcast_convert_type(wv << 16, jnp.float32)
        hi = jax.lax.bitcast_convert_type(
            wv & jnp.int32(-65536), jnp.float32)      # 0xffff0000
        acc = acc + jnp.dot(lo, w_ref[k, 0],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(hi, w_ref[k, 1],
                            preferred_element_type=jnp.float32)
        return acc

    acc = jax.lax.fori_loop(
        0, k_taps, tap_body, jnp.zeros((TV, cout), jnp.float32))
    out_ref[:] = acc


@jax.jit
def gather_matmul_packed(feats_packed, rules, weights_split):
    vp, k = rules.shape
    cout = weights_split.shape[3]
    return pl.pallas_call(
        _kernel_packed,
        out_shape=jax.ShapeDtypeStruct((vp, cout), jnp.float32),
        grid=(vp // TV,),
        in_specs=[
            pl.BlockSpec((TV, k), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TV, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TV, feats_packed.shape[1]), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rules, feats_packed, weights_split)


def pack_bf16_pairs(feats_f32):
    """(N, C) f32 -> (N, C/2) int32: word c packs bf16(ch 2c) in the LOW
    half and bf16(ch 2c+1) in the HIGH half."""
    fb = feats_f32.astype(jnp.bfloat16)
    bits = jax.lax.bitcast_convert_type(fb, jnp.uint16).astype(jnp.uint32)
    lo = bits[:, 0::2]
    hi = bits[:, 1::2]
    return ((hi << 16) | lo).astype(jnp.int32)


def split_weights(w):
    """(K, C, Cout) -> (K, 2, C/2, Cout): [k, 0] = even channels,
    [k, 1] = odd channels."""
    return jnp.stack([w[:, 0::2, :], w[:, 1::2, :]], axis=1)


def main():
    print('backend:', jax.default_backend())
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(V + 1, C).astype(np.float32))
    feats = feats.at[V].set(0.0)
    rules = jnp.asarray(rng.randint(0, V + 1, (V, K)).astype(np.int32))
    w = jnp.asarray(0.1 * rng.randn(K, C, COUT).astype(np.float32))

    ref = _gather_matmul_fwd_only(feats, rules, w)

    packed = pack_bf16_pairs(feats)
    w_split = split_weights(w)
    got = gather_matmul_packed(packed, rules, w_split)
    err = jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9)
    print('packed rel err: %.2e' % float(err))
    assert float(err) < 1e-2, 'numerics off'

    def timed(fn, *args, iters=20):
        @jax.jit
        def many(*a):
            s = 0.0
            for i in range(iters):
                if a[0].dtype == jnp.int32:       # defeat CSE, dtype-safe
                    f0 = jnp.bitwise_xor(a[0], jnp.int32(i & 1))
                else:
                    f0 = a[0] + i * 1e-6
                s = s + fn(f0, *a[1:]).sum()
            return s
        float(many(*args))
        t0 = time.perf_counter()
        float(many(*args))
        return (time.perf_counter() - t0) / iters * 1e3

    t_f32 = timed(lambda f, r, ww: _gather_matmul_fwd_only(f, r, ww),
                  feats, rules, w)
    t_pk = timed(lambda f, r, ww: gather_matmul_packed(f, r, ww),
                 packed, rules, w_split)
    print('f32 kernel:    %.3f ms/call' % t_f32)
    print('packed kernel: %.3f ms/call  (%.2fx)' % (t_pk, t_f32 / t_pk))


if __name__ == '__main__':
    main()
