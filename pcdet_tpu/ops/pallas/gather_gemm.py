"""Pallas TPU kernel: rulebook gather + GEMM for sparse 3D convolution.

XLA's TPU row-gather path runs at ~1 GB/s effective on the (V x K, Cin)
neighbour gathers of ops.sparse (measured 238 ms for one 16k-voxel layer);
this kernel keeps the whole feature table VMEM-resident and streams each
output tile's neighbour rows through scratch with per-row dynamic ref loads
(supported by Mosaic, unlike vector gathers), accumulating one MXU matmul
per kernel tap.

API: `gather_matmul(features (V+1, Cin) [row V = zeros], rules (V, K) int32
in [0, V], weights (K, Cin, Cout)) -> (V, Cout)`, equal to

    features[rules].reshape(V, K*Cin) @ weights.reshape(K*Cin, Cout)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TV = 64          # output rows per program (static unroll bound)


def _kernel(rules_ref, feats_ref, w_ref, out_ref, g_scratch):
    # rules_ref: (TV, K) int32 in SMEM; feats_ref: (V+1, Cin) VMEM;
    # w_ref: (K, Cin, Cout) VMEM; out_ref: (TV, Cout); g_scratch: (TV, Cin).
    # feats/weights may be bfloat16 (halves the VMEM streaming that
    # dominates); accumulation stays float32.
    k_taps = w_ref.shape[0]
    cout = w_ref.shape[2]

    def tap_body(k, acc):
        # per-row dynamic loads (vector gathers are not lowerable); the
        # row index comes from SMEM as a scalar
        for i in range(TV):                     # static unroll
            row = rules_ref[i, k]
            g_scratch[i, :] = feats_ref[row, :]
        prec = (jax.lax.Precision.DEFAULT
                if g_scratch.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        acc = acc + jnp.dot(g_scratch[:], w_ref[k],
                            preferred_element_type=jnp.float32,
                            precision=prec)
        return acc

    acc = jax.lax.fori_loop(
        0, k_taps, tap_body, jnp.zeros((TV, cout), jnp.float32))
    out_ref[:] = acc


@jax.custom_vjp
def gather_matmul(features, rules, weights):
    """:param features: (V+1, Cin) f32, last row zeros
    :param rules: (V, K) int32 row indices in [0, V]
    :param weights: (K, Cin, Cout) f32
    :return: (V, Cout) f32
    """
    return _gather_matmul_fwd_only(features, rules, weights)


@jax.jit
def _gather_matmul_fwd_only(features, rules, weights):
    v, k = rules.shape
    cin = features.shape[1]
    cout = weights.shape[2]
    pad = (-v) % TV
    if pad:
        rules = jnp.pad(rules, ((0, pad), (0, 0)),
                        constant_values=features.shape[0] - 1)
    vp = rules.shape[0]

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((vp, cout), jnp.float32),
        grid=(vp // TV,),
        in_specs=[
            pl.BlockSpec((TV, k), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # full feature table
            pl.BlockSpec(memory_space=pltpu.VMEM),      # full weights
        ],
        out_specs=pl.BlockSpec((TV, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TV, cin), features.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rules, features, weights)
    return out[:v]


def _gather_matmul_vjp_fwd(features, rules, weights):
    return _gather_matmul_fwd_only(features, rules, weights), (
        features, rules, weights)


def _gather_matmul_vjp_bwd(res, g):
    """out[v] = sum_k feats[rules[v,k]] @ W[k], rules constant:
    dW[k] = feats[rules[:,k]]^T @ g;  dfeats[rules[v,k]] += g[v] @ W[k]^T.

    The backward runs as XLA gathers/scatter-add (the scatter-add has no
    Pallas equivalent yet; misses were routed to the zero padding row, whose
    gradient is discarded by the caller's concatenate VJP).
    """
    features, rules, weights = res
    v, k = rules.shape
    cin = features.shape[1]
    gathered = features[rules.reshape(-1)].reshape(v, k, cin)
    dw = jnp.einsum('vki,vo->kio', gathered, g,
                    preferred_element_type=jnp.float32)
    contrib = jnp.einsum('vo,kio->vki', g, weights,
                         preferred_element_type=jnp.float32)
    df = jnp.zeros_like(features).at[rules.reshape(-1)].add(
        contrib.reshape(v * k, cin))
    return df, None, dw


gather_matmul.defvjp(_gather_matmul_vjp_fwd, _gather_matmul_vjp_bwd)


# ---------------------------------------------------------------------------
# dW kernel for the subm-conv backward: dW[k] = feats[rules[:, k]]^T @ g
# ---------------------------------------------------------------------------

def _dw_kernel(rules_ref, g_ref, feats_ref, out_ref, f_scratch, acc_ref):
    """Grid (K, n_tiles) with the tile dim fastest: for each tap k the
    scratch accumulator is reset at tile 0, accumulates one
    (Cin, TV) x (TV, Cout) MXU matmul per tile, and lands in out block k at
    the last tile.  rules_ref: (TV, K) SMEM (full tap dim — Mosaic requires
    the last block dim to span the array; the tap column is selected by
    program id); g_ref: (TV, Cout); feats_ref: (V+1, Cin) resident;
    out_ref: (1, Cin, Cout)."""
    k = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for r in range(f_scratch.shape[0]):          # static unroll
        row = rules_ref[r, k]
        f_scratch[r, :] = feats_ref[row, :]
    prec = (jax.lax.Precision.DEFAULT if f_scratch.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
        f_scratch[:], g_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(i == n - 1)
    def _():
        out_ref[0] = acc_ref[...]


@jax.jit
def gather_dw(features, rules, g):
    """dW[k] = sum_v features[rules[v, k]] (outer) g[v]  ->  (K, Cin, Cout).

    :param features: (V+1, Cin), last row zeros; :param rules: (V, K) int32
    in [0, V] (misses routed to the zero row); :param g: (V, Cout) f32
    """
    v, k = rules.shape
    cin = features.shape[1]
    cout = g.shape[1]
    pad = (-v) % TV
    if pad:
        rules = jnp.pad(rules, ((0, pad), (0, 0)),
                        constant_values=features.shape[0] - 1)
        g = jnp.pad(g, ((0, pad), (0, 0)))
    vp = rules.shape[0]

    out = pl.pallas_call(
        _dw_kernel,
        out_shape=jax.ShapeDtypeStruct((k, cin, cout), jnp.float32),
        grid=(k, vp // TV),
        in_specs=[
            pl.BlockSpec((TV, k), lambda kk, i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TV, cout), lambda kk, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # full feature table
        ],
        out_specs=pl.BlockSpec((1, cin, cout), lambda kk, i: (kk, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TV, cin), features.dtype),
                        pltpu.VMEM((cin, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rules, g, features)
    return out


# ---------------------------------------------------------------------------
# Scatter-free subm-conv matmul: backward uses the MIRRORED rulebook
# ---------------------------------------------------------------------------

def _gm_any(features, rules, weights):
    """gather+GEMM on either backend (Pallas on TPU, XLA gather on CPU)."""
    if jax.default_backend() != 'cpu':
        return _gather_matmul_fwd_only(features, rules, weights)
    v, k = rules.shape
    cin = features.shape[1]
    gathered = features[rules.reshape(-1)].reshape(v, k * cin)
    return jnp.dot(gathered, weights.reshape(k * cin, -1),
                   preferred_element_type=jnp.float32)


def _dw_any(features, rules, g):
    if jax.default_backend() != 'cpu':
        return gather_dw(features, rules, g)
    v, k = rules.shape
    cin = features.shape[1]
    gathered = features[rules.reshape(-1)].reshape(v, k, cin)
    return jnp.einsum('vki,vo->kio', gathered, g,
                      preferred_element_type=jnp.float32)


@jax.custom_vjp
def gather_matmul_subm(features, rules, rules_mirror, weights):
    """gather_matmul for SUBMANIFOLD convs (output sites == input sites,
    odd kernel): `rules_mirror` = rules[:, ::-1] is the exact transpose
    rulebook (offset a_{K-1-k} = -a_k), so the feature gradient is ANOTHER
    gather-GEMM — no XLA scatter-add anywhere in the backward:

        df[u] = sum_k g[rules[u, K-1-k]] @ W[K-1-k]^T
        dW[k] = feats[rules[:, k]]^T @ g        (gather_dw Pallas kernel)
    """
    return _gm_any(features, rules, weights)


def _gm_subm_fwd(features, rules, rules_mirror, weights):
    return _gm_any(features, rules, weights), (features, rules, rules_mirror,
                                               weights)


def _gm_subm_bwd(res, g):
    features, rules, rules_mirror, weights = res
    cin = features.shape[1]
    g_c = g.astype(features.dtype)
    g_padded = jnp.concatenate(
        [g_c, jnp.zeros((1, g.shape[1]), g_c.dtype)], axis=0)
    # df[u] = sum_k g[neighbor at -a_k] @ W[k]^T: the gather taps come from
    # the MIRRORED rulebook while the weights keep their original tap order
    # (mirroring both would cancel out)
    w_t = jnp.transpose(weights, (0, 2, 1)).astype(features.dtype)
    df = _gm_any(g_padded, rules_mirror, w_t).astype(features.dtype)
    df = jnp.concatenate([df, jnp.zeros((1, cin), features.dtype)], axis=0)
    dw = _dw_any(features, rules, g_c).astype(weights.dtype)
    return df, None, None, dw


gather_matmul_subm.defvjp(_gm_subm_fwd, _gm_subm_bwd)
