"""Pallas TPU kernel: windowed rank/presence lookup for rulebook builds.

Replaces `sparse._merge_lookup_ext`'s O((V+Q) log^2 (V+Q)) bitonic
merge-sort (the dominant cost of every rulebook build — the r5 bitmap-micro
chip step times the sort path at 21-40 ms/batch PER LEVEL on SECOND B8,
~30-40% of the whole eval step) with per-tile windowed compare-counts.

Structural fact (see `sparse._rules_affine`): every tap group's query ids
are exactly ``table_ids + const`` (linearize is affine), so queries arrive
sorted per group and the rank of a tile of TQ consecutive queries spans
O(TQ) consecutive table rows.  Each kernel tile therefore:

  1. gets [lo, hi) — the table row range that can contain its queries'
     ranks — precomputed XLA-side from ONE searchsorted of the 2*n_tiles
     tile min/max values (trivial vs. sorting all V+Q elements);
  2. streams that range through VMEM in (128,)-row chunks, accumulating
     per-query ``#{table <= q}`` and presence-of-{q-1, q, q+1} with
     (TQ, 128) VPU compares.

The result is EXACT for arbitrary int32 queries (not just the sorted
common case): a tile whose queries straddle the live/padding boundary —
or the unsorted coarse queries of `sparse._rules_inverse` — simply loops
over more chunks; total work stays bounded by the sum of per-tile spans.
Output is written in query order, so the merge path's final packed
scatter disappears too.

Packed encoding matches `sparse._merge_lookup_ext` bit-for-bit:
``pos_right * 8 + [q present] * 4 + [q+1 present] * 2 + [q-1 present]``
with q+-1 computed in wrapping int32 (identical to the merge path's
``keys + 1``), table padding (INT_MAX rows) counted as real entries.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gather_gemm as _gg

# queries per kernel tile (output rows per program)
TQ = int(os.environ.get('PCDET_LOOKUP_TQ', '256'))
# table rows per fori_loop chunk (must be a multiple of 128)
CH = int(os.environ.get('PCDET_LOOKUP_CH', '512'))
_LANES = 128


def _kernel(meta_ref, q_ref, t_ref, out_ref):
    """meta: (8, 8) SMEM block, row 0 = [lo_al, hi, nch, ...] (lo_al is
    128-aligned); q: (TQ, 1) VMEM; t: (v_pad/128, 128) VMEM (whole table);
    out: (TQ, 1) int32."""
    lo_al = meta_ref[0, 0]
    hi = meta_ref[0, 1]
    nch = meta_ref[0, 2]
    q = q_ref[:]                                          # (TQ, 1)
    sub = CH // _LANES
    r_base = lo_al // _LANES

    def chunk(c, carry):
        rank, f0, fp1, fm1 = carry
        for r in range(sub):                              # static unroll
            row = t_ref[pl.ds(r_base + c * sub + r, 1), :]    # (1, 128)
            j = ((r_base + c * sub + r) * _LANES
                 + jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1))
            ok = j < hi                                   # (1, 128)
            le = ((row <= q) & ok).astype(jnp.int32)      # (TQ, 128)
            rank = rank + jnp.sum(le, axis=1, keepdims=True)
            f0 = jnp.maximum(f0, jnp.max(
                ((row == q) & ok).astype(jnp.int32), axis=1, keepdims=True))
            fp1 = jnp.maximum(fp1, jnp.max(
                ((row == q + 1) & ok).astype(jnp.int32), axis=1,
                keepdims=True))
            fm1 = jnp.maximum(fm1, jnp.max(
                ((row == q - 1) & ok).astype(jnp.int32), axis=1,
                keepdims=True))
        return rank, f0, fp1, fm1

    z = jnp.zeros((q.shape[0], 1), jnp.int32)
    rank, f0, fp1, fm1 = jax.lax.fori_loop(0, nch, chunk, (z, z, z, z))
    out_ref[:] = (lo_al + rank) * 8 + f0 * 4 + fp1 * 2 + fm1


def window_lookup_ext(ids_sorted, query_ids):
    """Drop-in for `sparse._merge_lookup_ext`: (m,) int32 packed as
    pos_right*8 + [q]*4 + [q+1]*2 + [q-1].

    :param ids_sorted: (v,) ascending int32 (INT_MAX padding tail counted
        as real entries, matching the merge path)
    :param query_ids: (m,) arbitrary int32
    """
    v = ids_sorted.shape[0]
    m = query_ids.shape[0]
    int_max = jnp.iinfo(jnp.int32).max

    m_pad = -(-m // TQ) * TQ
    q_pad = jnp.concatenate(
        [query_ids, jnp.full((m_pad - m,), int_max, jnp.int32)])
    n_tiles = m_pad // TQ
    qt = q_pad.reshape(n_tiles, TQ)
    qmin = jnp.min(qt, axis=1)
    qmax = jnp.max(qt, axis=1)

    # [lo, hi): table rows that can contain rank/presence info for this
    # tile.  lo = (#{t < qmin}) - 1 keeps the possible q-1 match; hi =
    # (#{t <= qmax}) + 1 keeps the possible q+1 match.  Avoids qmin-1 /
    # qmax+1 arithmetic entirely (no int32 overflow at the extremes).
    sl = jnp.searchsorted(ids_sorted, qmin, side='left').astype(jnp.int32)
    sr = jnp.searchsorted(ids_sorted, qmax, side='right').astype(jnp.int32)
    lo_al = (jnp.maximum(sl - 1, 0) // _LANES) * _LANES   # chunk-aligned
    hi = jnp.minimum(sr + 1, v)
    nch = -(-(hi - lo_al) // CH)

    meta = jnp.zeros((n_tiles, 8, 8), jnp.int32)
    meta = (meta.at[:, 0, 0].set(lo_al).at[:, 0, 1].set(hi)
            .at[:, 0, 2].set(nch)).reshape(8 * n_tiles, 8)

    # pad the table to whole 128-lane rows plus one chunk of slack (the
    # last chunk's loads may run past hi; padding rows are masked by j<hi)
    v_pad = -(-v // _LANES) * _LANES + CH
    t_pad = jnp.concatenate(
        [ids_sorted, jnp.full((v_pad - v,), int_max, jnp.int32)])
    t2d = t_pad.reshape(v_pad // _LANES, _LANES)
    q2d = q_pad.reshape(m_pad, 1)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, 8), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TQ, 1), lambda i: (i, 0)),
            pl.BlockSpec(t2d.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TQ, 1), lambda i: (i, 0)),
        interpret=_gg.INTERPRET,
    )(meta, q2d, t2d)
    return out.reshape(-1)[:m]
