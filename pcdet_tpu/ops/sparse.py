"""TPU-native 3D sparse convolution library (jnp, fixed shapes, jittable).

Replaces the external spconv C++/CUDA library the reference's SECOND /
Part-A² backbones depend on (reference usage: pcdet/models/rpn/
rpn_backbone.py, rpn_unet.py, second_net.py:20-25).

Design — gather-GEMM-scatter over *sorted* voxel ids:
  * A sparse level is (features (V, C), ids (V,), coords (V, 3), mask (V,))
    with V a static cap; `ids` are linearised ZYX coordinates kept sorted
    ascending with INT32_MAX padding.  That invariant makes the "rulebook"
    a vectorised `jnp.searchsorted` (binary search) instead of spconv's
    hash-table build: for every (output voxel, kernel tap) we compute the
    neighbour's linear id and look it up in O(log V) — all fixed-shape,
    all fused under jit.
  * The conv itself is ONE large GEMM per layer: gathered neighbour
    features (V, K*Cin) x reshaped weights (K*Cin, Cout) — lands on the MXU
    instead of spconv's per-offset scatter kernels.
  * Strided convs build their output active set by enumerating each input's
    <= prod(ceil(k/s)) candidate outputs, sorting, and run-length uniquing —
    no data-dependent shapes.
  * Inverse (up) convs reuse the encoder level's coords ("indice key"
    equivalent) and gather from the coarse level where (c + pad - k) % s == 0.

Semantics match spconv: SubMConv3d outputs only at input sites; SparseConv3d
outputs wherever the receptive field touches an input; out-of-grid taps are
zero; no bias (the reference backbones all use bias=False + BN).
"""
import os
from functools import partial
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INT_MAX = np.iinfo(np.int32).max


class SparseLevel(NamedTuple):
    """One resolution level of a sparse tensor (single sample)."""
    features: jnp.ndarray    # (V, C)
    ids: jnp.ndarray         # (V,) int32, sorted ascending, INT_MAX padded
    coords: jnp.ndarray      # (V, 3) int32 ZYX, -1 padded
    mask: jnp.ndarray        # (V,) bool
    shape: Tuple[int, int, int]   # static (D, H, W)
    # active sites THIS op's out_cap silently dropped (scalar int32; per-op,
    # not cumulative — the backbone attributes and accumulates).  The caps
    # are calibrated on synthetic occupancy (PERF_NOTES round 2); a real
    # scene exceeding them would corrupt accuracy silently without this
    # counter.  None where the producing op has no cap (subm/inverse).
    overflow: Any = None
    # cached k=(3,3,3) subm rulebook (rows, found) for THIS level's sites —
    # spconv's "indice key" reuse: every subm conv on the same active set
    # shares one rulebook (BackBone8x: 8 subm convs -> 4 unique rulebooks;
    # the UNet decoder inherits the stashed encoder levels' books through
    # inverse_conv3d).  Populated by the first k3 subm conv on the level.
    subm_rules: Any = None
    # forward rulebook of the strided conv that PRODUCED this level
    # ((out_cap, K) int32, misses routed to the parent cap) + its static
    # geometry `strided_meta` = (kernel, stride, padding, parent_cap).
    # An inverse conv undoing the same geometry onto the parent active set
    # derives its book from this by ONE scatter (`_transpose_rules_from_fwd`)
    # instead of a fresh merged-sort lookup — the second half of spconv's
    # indice-key reuse (SparseInverseConv3d shares the key of the conv it
    # inverts).  Unused books are dead values XLA eliminates.
    strided_rules: Any = None
    strided_meta: Any = None         # static; never vmapped


def _triple(x):
    if isinstance(x, (tuple, list)):
        return tuple(int(v) for v in x)
    return (int(x),) * 3


def linearize(coords, shape):
    """(.., 3) ZYX int -> linear id over (D, H, W)."""
    d, h, w = shape
    return (coords[..., 0] * h + coords[..., 1]) * w + coords[..., 2]


def delinearize(ids, shape):
    d, h, w = shape
    z = ids // (h * w)
    rem = ids % (h * w)
    return jnp.stack([z, rem // w, rem % w], axis=-1)


def from_voxelizer(features, coordinates, voxel_mask, shape):
    """Build a SparseLevel from ops.voxelizer.voxelize_jnp outputs (already
    sorted by linear id)."""
    ids = linearize(coordinates, shape)
    ids = jnp.where(voxel_mask, ids, INT_MAX).astype(jnp.int32)
    return SparseLevel(features=features, ids=ids,
                       coords=coordinates, mask=voxel_mask, shape=shape)


def from_unsorted(features, coordinates, voxel_mask, shape):
    """Build a SparseLevel from arbitrary-order coords (e.g. the host
    voxelizer's first-appearance order): sorts by linear id."""
    ids = linearize(coordinates, shape)
    ids = jnp.where(voxel_mask, ids, INT_MAX).astype(jnp.int32)
    order = jnp.argsort(ids, stable=True)
    return SparseLevel(features=features[order], ids=ids[order],
                       coords=coordinates[order], mask=voxel_mask[order],
                       shape=shape)


def _kernel_offsets(kernel):
    """Static (K, 3) array of kernel tap indices (z-major order, matching a
    (kz, ky, kx) weight layout)."""
    kd, kh, kw = kernel
    offs = [(i, j, l) for i in range(kd) for j in range(kh) for l in range(kw)]
    return np.asarray(offs, dtype=np.int32)


def _lookup_merge(ids_sorted, query_ids, query_valid):
    """Sorted-merge id lookup: one stable multi-operand sort of
    [table, queries] (table precedes equal queries), with both the rank and
    the presence bit computed IN sorted order — presence via a cumulative
    max of table values (ascending keys make the running max exactly the
    last table value <= q), so no per-element verification gather."""
    v = ids_sorted.shape[0]
    m = query_ids.shape[0]
    int_min = jnp.iinfo(jnp.int32).min
    comb = jnp.concatenate([ids_sorted, query_ids])
    origin = jnp.arange(v + m, dtype=jnp.int32)
    keys, origin_s = jax.lax.sort((comb, origin), is_stable=True, num_keys=1)
    is_table = origin_s < v
    pos_right = jnp.cumsum(is_table.astype(jnp.int32))
    w = jax.lax.cummax(jnp.where(is_table, keys, int_min), axis=0)
    packed = pos_right * 2 + (w == keys).astype(jnp.int32)
    pk = jnp.zeros(m, jnp.int32).at[
        jnp.where(~is_table, origin_s - v, m)].set(packed, mode='drop')
    row = jnp.clip((pk >> 1) - 1, 0, v - 1)
    found = (pk & 1 > 0) & query_valid
    return row, found


def _lookup(ids_sorted, query_ids, query_valid):
    """Find query ids in the sorted id array.

    :return: (row indices clamped to [0, V-1], found mask)
    """
    if jax.default_backend() != 'cpu':
        return _lookup_merge(ids_sorted, query_ids, query_valid)
    v = ids_sorted.shape[0]
    idx = jnp.searchsorted(ids_sorted, query_ids).astype(jnp.int32)
    idx_c = jnp.clip(idx, 0, v - 1)
    found = (ids_sorted[idx_c] == query_ids) & query_valid & (idx < v)
    return idx_c, found


def _merge_pos_right(ids_sorted, query_ids):
    """#{table elements <= q} per query via ONE stable argsort of
    [table, queries] (stable tie-break puts table entries before equal
    queries, so the rank difference is exactly pos_right)."""
    v = ids_sorted.shape[0]
    m = query_ids.shape[0]
    comb = jnp.concatenate([ids_sorted, query_ids])
    order = jnp.argsort(comb, stable=True)
    is_q = order >= v
    q_rank = jnp.cumsum(is_q.astype(jnp.int32)) - 1
    t_count = jnp.arange(v + m, dtype=jnp.int32) - q_rank
    return jnp.zeros(m, jnp.int32).at[
        jnp.where(is_q, order - v, m)].set(t_count, mode='drop')


def _merge_lookup_ext(ids_sorted, query_ids):
    """For every query q, compute pos_right = #{table <= q} and presence
    bits for q, q+1 and q-1 — with NO per-element gathers (TPU's gather is
    the slow path the rest of this module avoids).

    One stable two-operand ``lax.sort`` of [table, queries] carries the
    origin index into sorted order; ascending cumulative max/min scans then
    give, at every query's position, the last table value <= q (presence
    of q) and the first table value > q (presence of q+1).  The table
    PREDECESSOR value (presence of q-1 when q itself is present) needs no
    third sort operand: at a table entry's sorted position p, the running
    max w[p-1] IS the previous table value, so a shifted second cummax
    recovers it — the sort moves 8 bytes per element instead of 12.
    Everything returns through ONE packed scatter.

    :return: (m,) int32, packed as pos_right*8 + [q]*4 + [q+1]*2 + [q-1]
    """
    v = ids_sorted.shape[0]
    m = query_ids.shape[0]
    int_min = jnp.iinfo(jnp.int32).min
    comb = jnp.concatenate([ids_sorted, query_ids])
    origin = jnp.arange(v + m, dtype=jnp.int32)
    keys, origin_s = jax.lax.sort((comb, origin), is_stable=True, num_keys=1)
    is_table = origin_s < v
    pos_right = jnp.cumsum(is_table.astype(jnp.int32))
    w = jax.lax.cummax(jnp.where(is_table, keys, int_min), axis=0)
    w_shift = jnp.concatenate([jnp.full((1,), int_min, jnp.int32), w[:-1]])
    w_prev = jax.lax.cummax(jnp.where(is_table, w_shift, int_min), axis=0)
    v_next = jax.lax.cummin(jnp.where(is_table, keys, INT_MAX), axis=0,
                            reverse=True)
    f0 = w == keys
    fp1 = v_next == keys + 1
    fm1 = (w == keys - 1) | (f0 & (w_prev == keys - 1))
    packed = (pos_right * 8 + f0.astype(jnp.int32) * 4
              + fp1.astype(jnp.int32) * 2 + fm1.astype(jnp.int32))
    return jnp.zeros(m, jnp.int32).at[
        jnp.where(~is_table, origin_s - v, m)].set(packed, mode='drop')


# Rulebook id-lookup backend: 'sort' — one stable bitonic merge-sort per
# book (`_merge_lookup_ext`).  Two alternatives were built and DELETED
# after losing their chip microbenches at every SECOND level
# (CHIP_QUEUE_LOG 2026-08-19): 'bitmap' (dense-grid presence bitmap +
# popcount prefix ranks, 2-2.7x slower, round 3) and 'window' (Pallas
# windowed rank kernel, 3.0-3.2x slower at the rulebook stage AND failed
# the TV=256 lowering smoke, round 5).  The env var is kept so a future
# backend can slot in without touching call sites.
LOOKUP_BACKEND = os.environ.get('PCDET_SPARSE_LOOKUP', 'sort')
# Kill switch for the x-window gather kernels (falls back to per-row
# loads) — lets the unattended chip queue keep producing numbers if the
# xwin numerics gate ever trips on a new jaxlib.
XWIN_ENABLED = os.environ.get('PCDET_DISABLE_XWIN', '') != '1'
# occupancy-gated tile skipping in the gather kernels (A/B kill switch)
TILE_GATE = os.environ.get('PCDET_DISABLE_TILE_GATE', '') != '1'


def _lookup_ext(ids_sorted, query_ids, grid_shape):
    """Backend dispatch for the packed q-1/q/q+1 rank lookup."""
    del grid_shape
    return _merge_lookup_ext(ids_sorted, query_ids)


def _rules_affine(level, out_coords, out_mask, base_coords, kernel,
                  coord_off):
    """Rulebook for convs whose tap-t input site is
    ``base_coords + offs[t] + coord_off`` (subm: base=out, off=-pad;
    strided: base=out*stride, off=-padding).

    Exploits two structural facts of the sorted-id layout:
      (a) every tap's query ids are ``linearize(base + coord_off) + c_t``
          with c_t a compile-time constant, so all taps share one base-id
          vector and the lookup needs NO per-tap coordinate materialisation;
      (b) taps that differ only in the x-offset differ by exactly +-1 in
          linear id, and the table ids are unique — so #{t < q+1} =
          #{t < q} + [q in table].  Only the middle-x tap of each (z, y)
          tap group is merge-looked-up; its x-neighbours follow from that
          unit-stride position recurrence (one (V,) int gather each).

    This cuts the merged sort from (1+K)V to (1+K/kw)V elements and replaces
    2/3 of the lookup work with elementwise ops.

    :return: rows (V, K) int32 clamped to [0, V-1], found (V, K) bool —
             tap order matches ``_kernel_offsets`` (z-major, x fastest).
    """
    offs = _kernel_offsets(kernel)                        # (K, 3) static
    kw = kernel[2]
    mid = kw // 2
    v = out_coords.shape[0]
    d, h, w = level.shape
    shape_arr = jnp.asarray(level.shape, jnp.int32)
    coord_off = jnp.asarray(coord_off, jnp.int32)

    base = base_coords + coord_off                        # (V, 3)
    base_id = linearize(base, level.shape)                # raw, may be OOB

    n_groups = offs.shape[0] // kw
    # one merged lookup for all group-mid taps
    mid_consts = [int((offs[g * kw + mid][0] * h + offs[g * kw + mid][1]) * w
                      + offs[g * kw + mid][2]) for g in range(n_groups)]

    rows_by_tap = {}
    found_by_tap = {}
    if kw in (1, 3):
        # scan-based presence bits for q-1/q/q+1: no per-element gathers
        queries = jnp.concatenate([base_id + c for c in mid_consts])
        packed = _lookup_ext(level.ids, queries,
                             level.shape).reshape(n_groups, v)
        for g in range(n_groups):
            pk = packed[g]
            pr = pk >> 3
            f0 = (pk >> 2) & 1 > 0
            fp1 = (pk >> 1) & 1 > 0
            fm1 = pk & 1 > 0
            pos_l = pr - f0.astype(jnp.int32)             # #{t < q}
            rows_by_tap[g * kw + mid] = jnp.clip(pr - 1, 0, v - 1)
            found_by_tap[g * kw + mid] = f0
            if kw == 3:
                rows_by_tap[g * kw + mid + 1] = jnp.clip(
                    pos_l + f0.astype(jnp.int32), 0, v - 1)
                found_by_tap[g * kw + mid + 1] = fp1
                rows_by_tap[g * kw + mid - 1] = jnp.clip(pos_l - 1, 0, v - 1)
                found_by_tap[g * kw + mid - 1] = fm1
    else:
        queries = jnp.concatenate([base_id + c for c in mid_consts])
        pos_right = _merge_pos_right(level.ids, queries).reshape(n_groups, v)
        for g in range(n_groups):
            q_mid = base_id + mid_consts[g]
            pr = pos_right[g]
            row = jnp.clip(pr - 1, 0, v - 1)
            f_raw = (pr > 0) & (level.ids[row] == q_mid)
            rows_by_tap[g * kw + mid] = row
            found_by_tap[g * kw + mid] = f_raw
            # walk +x: L(q+1) = L(q) + [q in table]
            pos_l = pr - f_raw.astype(jnp.int32)          # #{t < q}
            f_prev, q = f_raw, q_mid
            for dx in range(mid + 1, kw):
                pos_l = pos_l + f_prev.astype(jnp.int32)
                q = q + 1
                row = jnp.clip(pos_l, 0, v - 1)
                f_prev = (pos_l < v) & (level.ids[row] == q)
                rows_by_tap[g * kw + dx] = row
                found_by_tap[g * kw + dx] = f_prev
            # walk -x: index of the largest element < q, then step down
            r = (pr - f_raw.astype(jnp.int32)) - 1        # pos_left - 1
            q = q_mid
            for dx in range(mid - 1, -1, -1):
                q = q - 1
                row = jnp.clip(r, 0, v - 1)
                f_here = (r >= 0) & (level.ids[row] == q)
                rows_by_tap[g * kw + dx] = row
                found_by_tap[g * kw + dx] = f_here
                r = r - f_here.astype(jnp.int32)

    # per-dim bounds masks, computed once per distinct offset value
    dim_ok = []
    for d in range(3):
        cache = {}
        for o in sorted({int(t[d]) for t in offs}):
            c = base[:, d] + o
            cache[o] = (c >= 0) & (c < shape_arr[d])
        dim_ok.append(cache)

    rows, found = [], []
    for t in range(offs.shape[0]):
        inb = (dim_ok[0][int(offs[t][0])] & dim_ok[1][int(offs[t][1])]
               & dim_ok[2][int(offs[t][2])])
        rows.append(rows_by_tap[t])
        found.append(found_by_tap[t] & inb & out_mask)
    return jnp.stack(rows, axis=1), jnp.stack(found, axis=1)


def _rules_generic(level: SparseLevel, out_coords, out_mask, in_pos_fn,
                   kernel):
    """Rulebook for arbitrary tap geometry (used by inverse conv, whose
    floor-division tap map is not a constant id shift).

    :param in_pos_fn: (out_coords (V,3), tap (3,)) -> (in_coords, extra_valid)
    :return: rows (V, K) int32 clamped, found (V, K) bool
    """
    offs = _kernel_offsets(kernel)                        # (K, 3) static
    k = offs.shape[0]
    v = out_coords.shape[0]

    in_coords = []
    valids = []
    for t in range(k):                                    # static unroll
        c_in, extra = in_pos_fn(out_coords, offs[t])
        inb = ((c_in >= 0).all(-1)
               & (c_in < jnp.asarray(level.shape, jnp.int32)).all(-1))
        in_coords.append(c_in)
        valids.append(inb & extra & out_mask)
    in_coords = jnp.stack(in_coords, axis=1)              # (V, K, 3)
    valid = jnp.stack(valids, axis=1)                     # (V, K)

    q_ids = linearize(in_coords, level.shape)
    q_ids = jnp.where(valid, q_ids, INT_MAX - 1).astype(jnp.int32)
    rows, found = _lookup(level.ids, q_ids.reshape(-1), valid.reshape(-1))
    return rows.reshape(v, k), found.reshape(v, k)


def _rules_inverse(level: SparseLevel, out_coords, out_mask, kernel, stride,
                   padding):
    """Rulebook for inverse-conv geometry ``in = (out + pad - tap) / stride``
    (used by inverse_conv3d and by strided-conv backward), specialised for
    per-dim (k, s) in {(3, 2), (1, 2), (1, 1)} — every case the shipped
    backbones produce.

    Structure exploited: with k=3, s=2, tap validity is a PARITY condition —
    for any output site, per dim either taps {0, 2} are valid (inputs q and
    q-1, consecutive) or tap {1} alone is (input q, q = (out+pad)//2).  The
    up-to-27 valid taps therefore all live on the 2x2x2 coarse neighborhood
    (q_z + dz, q_y + dy, q_x + dx), d in {0, -1} — so ONE `_merge_lookup_ext`
    over at most 4V queries (x handled by the q/q-1 presence bits) replaces
    the generic K*V-query lookup: a ~5x cut in rulebook sort size at K=27.

    Falls back to `_rules_generic` for unsupported (k, s) combinations.
    """
    kernel = tuple(kernel)
    stride = tuple(stride)
    padding = tuple(padding)
    if any((k, s) not in ((3, 2), (1, 2), (1, 1))
           for k, s in zip(kernel, stride)):
        s_arr = jnp.asarray(stride, jnp.int32)
        p_arr = jnp.asarray(padding, jnp.int32)

        def in_pos(u_coords, tap):
            num = u_coords + p_arr - jnp.asarray(tap, jnp.int32)
            ok = (num % s_arr == 0).all(-1) & (num >= 0).all(-1)
            return num // s_arr, ok

        return _rules_generic(level, out_coords, out_mask, in_pos, kernel)

    offs = _kernel_offsets(kernel)                        # (K, 3) static
    v = out_coords.shape[0]
    dims = level.shape                                    # coarse (D, H, W)

    num = out_coords + jnp.asarray(padding, jnp.int32)    # (V, 3)
    q, even = [], []
    for d in range(3):
        if stride[d] == 2:
            q.append(jnp.floor_divide(num[:, d], 2))
            even.append(num[:, d] % 2 == 0)
        else:
            q.append(num[:, d])
            even.append(None)                             # parity-free dim

    d_sets = [( (0, -1) if kernel[d] == 3 else (0,) ) for d in range(2)]
    groups = [(dz, dy) for dz in d_sets[0] for dy in d_sets[1]]
    # NOTE: coarse qids are NOT sorted over the fine out rows (the stride's
    # floor division collapses z, after which y order is arbitrary), so the
    # bitonic-merge shortcut of the affine path does not apply — this stays
    # one global sort (already parity-collapsed to <= 4V queries).
    queries = []
    sentinel = jnp.int32(INT_MAX - 8)
    for dz, dy in groups:
        z_in = q[0] + dz
        y_in = q[1] + dy
        ok = ((z_in >= 0) & (z_in < dims[0])
              & (y_in >= 0) & (y_in < dims[1]))
        qid = ((z_in * dims[1] + y_in) * dims[2] + q[2]).astype(jnp.int32)
        queries.append(jnp.where(ok, qid, sentinel))
    packed = _lookup_ext(level.ids, jnp.concatenate(queries), dims)
    packed = packed.reshape(len(groups), v)
    nrows = level.ids.shape[0]
    row0, rowm1, f0s, fm1s = {}, {}, {}, {}
    for g, key in enumerate(groups):
        pk = packed[g]
        pr = pk >> 3
        f0 = (pk >> 2) & 1 > 0
        row0[key] = jnp.clip(pr - 1, 0, nrows - 1)
        f0s[key] = f0
        fm1s[key] = pk & 1 > 0
        rowm1[key] = jnp.clip(pr - f0.astype(jnp.int32) - 1, 0, nrows - 1)

    def tap_dim(d, t):
        """-> (d_off, parity_mask or None) for tap offset t on dim d."""
        if stride[d] == 2 and kernel[d] == 3:
            if t == 1:
                return 0, ~even[d]
            return (0 if t == 0 else -1), even[d]
        if stride[d] == 2:                                # k == 1
            return 0, even[d]
        return 0, None                                    # s == 1

    rows, found = [], []
    for t in range(offs.shape[0]):
        tz, ty, tx = (int(offs[t][0]), int(offs[t][1]), int(offs[t][2]))
        dz, pv_z = tap_dim(0, tz)
        dy, pv_y = tap_dim(1, ty)
        dx, pv_x = tap_dim(2, tx)
        key = (dz, dy)
        r = rowm1[key] if dx == -1 else row0[key]
        f = fm1s[key] if dx == -1 else f0s[key]
        z_in, y_in, x_in = q[0] + dz, q[1] + dy, q[2] + dx
        ok = ((z_in >= 0) & (z_in < dims[0])
              & (y_in >= 0) & (y_in < dims[1])
              & (x_in >= 0) & (x_in < dims[2]))
        for pv in (pv_z, pv_y, pv_x):
            if pv is not None:
                ok = ok & pv
        rows.append(r)
        found.append(f & ok & out_mask)
    return jnp.stack(rows, axis=1), jnp.stack(found, axis=1)


def _xwin_selectors(rules, n_in):
    """Collapse each (dz, dy) tap group of a kw=3 rulebook into (window
    base, packed 2-bit x-offsets) for the x-window gather kernel.

    Structural fact (all kw=3 books in this module): the three x-taps of a
    tap group query ids q-1, q, q+1, and present consecutive ids occupy
    consecutive rows of the sorted table — so every found row of a group
    lies within a 3-consecutive-row window.  The kernel then needs ONE
    dynamic (3, C) block load per group instead of 3 row loads
    (pallas/gather_gemm.py `_kernel_xwin*`).

    :param rules: (V, K) int32, misses already routed to row ``n_in``
    :param n_in: the miss row (== feature-table zero row)
    :return: base (V, G) int32 window starts, sel (V, G) int32 packed
        offsets (bits 2dx..2dx+1 = row offset of x-tap dx; 3 = miss)
    """
    v, k = rules.shape
    g = k // 3
    r3 = rules.reshape(v, g, 3)
    f3 = r3 != n_in
    base = jnp.min(jnp.where(f3, r3, INT_MAX), axis=2)
    base_c = jnp.where(base == INT_MAX, 0, base).astype(jnp.int32)
    off = jnp.where(f3, r3 - base_c[:, :, None], 3).astype(jnp.int32)
    # Guard the 2-bit encoding: a found tap outside the 3-row window (the
    # property is fuzz-checked in tests/test_xwin_property.py, but a future
    # book geometry could break it) would overflow into the NEXT tap's
    # selector bits and corrupt results silently; clamp it to the miss code
    # so the worst case is a dropped tap, not cross-tap corruption.
    off = jnp.minimum(off, 3)
    sel = off[:, :, 0] | (off[:, :, 1] << 2) | (off[:, :, 2] << 4)
    return base_c, sel


def _packed_mode(compute_dtype, cin):
    """bf16 streaming mode: pair-packed int32 kernel (TPU) / bf16 rounding
    emulation (CPU).  Requires an even channel count."""
    return (compute_dtype is not None
            and jnp.dtype(compute_dtype) == jnp.bfloat16
            and cin % 2 == 0)


def _apply_rules(level: SparseLevel, out_mask, rows, found, weights,
                 compute_dtype=None, mirror=False, kw3=False):
    """Gather neighbour features by the rulebook and contract with the
    flattened weights: out = feats[rules].reshape(V, K*Cin) @ W.

    :param compute_dtype: optional cast (e.g. jnp.bfloat16) for the gathered
        feature table + weights — halves the VMEM streaming that dominates
        the Pallas gather-GEMM; accumulation stays float32.  The output is
        always float32.
    """
    v, k = rows.shape
    cin = level.features.shape[-1]
    feats = level.features
    packed = _packed_mode(compute_dtype, cin)
    if packed or jax.default_backend() != 'cpu':
        # TPU: Mosaic cannot lower narrow bf16 row loads, so bf16 streaming
        # runs as the PAIR-PACKED int32 kernel (2.07x measured,
        # pallas/gather_gemm.py); features stay f32 here — packing casts.
        compute_dtype = None
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    # live rows are a PREFIX of every level (sorted ids, INT_MAX padding),
    # so the Pallas kernels can skip whole dead tiles past the live count —
    # caps run 1.3-1.9x typical occupancy at production shapes
    n_live = jnp.sum(out_mask.astype(jnp.int32)) if TILE_GATE else None
    if mirror:
        # submanifold conv (out sites == in sites, odd kernel): the
        # tap-reversed rulebook IS the transpose rulebook, so the whole
        # backward is gather-GEMMs too (zero XLA scatters in training)
        from .pallas.gather_gemm import gather_matmul_subm
        n_in = feats.shape[0]
        rules = jnp.where(found, rows, n_in)
        feats_padded = jnp.concatenate(
            [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
        out = gather_matmul_subm(feats_padded, rules, rules[:, ::-1],
                                 weights, n_live, packed, kw3)
    elif jax.default_backend() != 'cpu':
        # Pallas rulebook gather+GEMM: XLA's row-gather slow path costs
        # ~240 ms/layer at V=16k (PERF_NOTES.md); the kernel is ~8x faster.
        from .pallas.gather_gemm import _gm_any, gather_matmul
        n_in = feats.shape[0]
        rules = jnp.where(found, rows, n_in)
        feats_padded = jnp.concatenate(
            [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
        if packed or kw3:
            out = _gm_any(feats_padded, rules, weights, packed, kw3, n_live)
        else:
            out = gather_matmul(feats_padded, rules, weights, n_live)
    else:
        gathered = feats[rows.reshape(-1)]                # (V*K, Cin)
        gathered = jnp.where(found.reshape(-1)[:, None], gathered,
                             jnp.zeros((), gathered.dtype))
        gathered = gathered.reshape(v, k * cin)
        w = weights.reshape(k * cin, -1)
        out = jnp.dot(gathered, w, preferred_element_type=jnp.float32)
    return out * out_mask[:, None].astype(out.dtype)


def _transpose_rules_from_fwd(rules, n_in, n_out):
    """Invert a forward rulebook into the TRANSPOSE book by ONE packed
    scatter — no lookup sort.

    Valid for every conv geometry in this module because, for a fixed
    (input site, tap), the contributing output is UNIQUE: strided convs
    satisfy out = (in + pad - tap)/stride, inverse convs
    out = in*stride - pad + tap — both functions of (in, tap).  So the
    forward entry (out o, tap t) -> input u IS the transpose entry
    (input u, tap t) -> o, and scattering o into slot (u, t) collides
    never.  Tap t stays paired with weight tap t, matching the geometric
    builders this replaces (`_rules_inverse` for strided backward,
    `_rules_affine` for inverse backward) bit-for-bit.

    :param rules: (n_out, K) int32 forward rules, misses routed to n_in
    :return: (n_in, K) int32 transpose rules, misses routed to n_out
    """
    k = rules.shape[1]
    found = rules != n_in
    o_idx = jnp.arange(rules.shape[0], dtype=jnp.int32)
    tap = jnp.arange(k, dtype=jnp.int32)
    slot = jnp.where(found, rules * k + tap[None, :], n_in * k)
    pk = jnp.zeros(n_in * k, jnp.int32).at[slot.reshape(-1)].set(
        jnp.broadcast_to(o_idx[:, None] * 2 + 1, slot.shape).reshape(-1),
        mode='drop').reshape(n_in, k)
    return jnp.where((pk & 1) > 0, pk >> 1, n_out)


def _apply_rules_transpose_bwd(level, out_mask, rows, found, weights,
                               compute_dtype, kw3=False):
    """Like _apply_rules, but the feature gradient flows through the
    TRANSPOSE rulebook instead of an XLA scatter-add:
    df[u] = sum_k g[bwd(u,k)] @ W[k]^T.  The transpose book is derived from
    the forward book by one packed scatter inside the backward pass
    (`_transpose_rules_from_fwd`) — eval pays nothing, and training pays a
    scatter instead of the merged-sort lookup the geometric builders cost.
    """
    from .pallas.gather_gemm import _dw_any, _gm_any
    cin = level.features.shape[-1]
    feats = level.features
    packed = _packed_mode(compute_dtype, cin)
    if packed or jax.default_backend() != 'cpu':
        compute_dtype = None                    # see _apply_rules
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    n_in = feats.shape[0]
    n_out = rows.shape[0]
    rules = jnp.where(found, rows, n_in)
    feats_padded = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    # tile-occupancy gating (see _apply_rules): OUT rows gate fwd + dW,
    # IN rows gate the transpose-book feature gradient.  Passed through the
    # custom_vjp as args (closing a custom_vjp over tracers leaks them).
    n_live_out = jnp.sum(out_mask.astype(jnp.int32)) if TILE_GATE else None
    n_live_in = jnp.sum(level.mask.astype(jnp.int32)) if TILE_GATE else None

    @jax.custom_vjp
    def apply(fp, w, r, nlo, nli):
        return _gm_any(fp, r, w, packed, kw3, nlo)

    def fwd(fp, w, r, nlo, nli):
        return _gm_any(fp, r, w, packed, kw3, nlo), (fp, w, r, nlo, nli)

    def bwd(res, g):
        fp, w, r, nlo, nli = res
        bwd_rules = _transpose_rules_from_fwd(r, n_in, n_out)
        g_c = g.astype(fp.dtype)
        g_p = jnp.concatenate(
            [g_c, jnp.zeros((1, g.shape[1]), g_c.dtype)], axis=0)
        w_t = jnp.transpose(w, (0, 2, 1)).astype(fp.dtype)
        df = _gm_any(g_p, bwd_rules, w_t, packed, kw3, nli).astype(fp.dtype)
        df = jnp.concatenate([df, jnp.zeros((1, fp.shape[1]), fp.dtype)],
                             axis=0)
        dw = _dw_any(fp, r, g_c, kw3, nlo).astype(w.dtype)
        return (df, dw, None, None, None)

    apply.defvjp(fwd, bwd)
    out = apply(feats_padded, weights, rules, n_live_out, n_live_in)
    return out * out_mask[:, None].astype(out.dtype)


def _rules_subm(level: SparseLevel, kernel):
    """Subm rulebook (out sites == in sites, odd kernel) via ANTISYMMETRY:
    the rule set is self-transpose under tap negation — entry (out i, tap o)
    pairing sites t_j = t_i + lin(o) IS entry (out j, tap -o) — so only the
    lex-positive half of the (dz, dy) tap groups needs the merged-sort
    lookup.  The negative half is ONE packed transpose scatter, the center
    tap is the identity, and the center group's x = +-1 taps are pure shift
    comparisons on the sorted ids (consecutive ids occupy consecutive
    rows).  For k=(3,3,3) the lookup sort shrinks from (1+9)V to (1+4)V
    elements; k=1 kernels need NO sort at all.

    :return: rows (V, K) int32 clamped to [0, V-1], found (V, K) bool —
             `_kernel_offsets` tap order, identical to `_rules_affine`.
    """
    kd, kh, kw = kernel
    if any(kk not in (1, 3) for kk in kernel):
        pad = tuple(-(kk // 2) for kk in kernel)
        return _rules_affine(level, level.coords, level.mask, level.coords,
                             kernel, pad)
    offs = _kernel_offsets(kernel)
    k_total = offs.shape[0]
    v = level.coords.shape[0]
    d, h, w = level.shape
    ids, mask = level.ids, level.mask
    shape_arr = jnp.asarray(level.shape, jnp.int32)
    center = np.asarray([kd // 2, kh // 2, kw // 2], np.int32)
    eoffs = offs - center                                  # (K, 3) in -1..1

    # per-dim bounds masks, computed once per distinct offset value
    dim_ok = []
    for dd in range(3):
        cache = {}
        for o in sorted({int(t[dd]) for t in eoffs}):
            c = level.coords[:, dd] + o
            cache[o] = (c >= 0) & (c < shape_arr[dd])
        dim_ok.append(cache)

    def inb(t):
        ez, ey, ex = int(eoffs[t][0]), int(eoffs[t][1]), int(eoffs[t][2])
        return dim_ok[0][ez] & dim_ok[1][ey] & dim_ok[2][ex]

    idx = jnp.arange(v, dtype=jnp.int32)
    rows_by_tap, found_by_tap = {}, {}
    tap_of = {(int(e[0]), int(e[1]), int(e[2])): t
              for t, e in enumerate(eoffs)}

    # center group: identity + shift comparisons (sorted unique ids make
    # id+-1 neighbours live at row +-1 exactly when present)
    rows_by_tap[tap_of[(0, 0, 0)]] = idx
    found_by_tap[tap_of[(0, 0, 0)]] = mask
    if kw == 3:
        nxt = jnp.concatenate([ids[1:], jnp.full((1,), INT_MAX, jnp.int32)])
        t = tap_of[(0, 0, 1)]
        rows_by_tap[t] = jnp.clip(idx + 1, 0, v - 1)
        found_by_tap[t] = (nxt == ids + 1) & mask & inb(t)
        prv = jnp.concatenate([jnp.full((1,), INT_MAX, jnp.int32), ids[:-1]])
        t = tap_of[(0, 0, -1)]
        rows_by_tap[t] = jnp.clip(idx - 1, 0, v - 1)
        found_by_tap[t] = (prv == ids - 1) & mask & inb(t)

    # lex-positive (dz, dy) groups: merged-sort lookup (as _rules_affine)
    pos_groups = sorted({(int(e[0]), int(e[1])) for e in eoffs
                         if (int(e[0]), int(e[1])) > (0, 0)})
    if pos_groups:
        # masked rows have ids == INT_MAX; clamp before the +const shift to
        # avoid int32 overflow (their results are masked out anyway)
        base_q = jnp.minimum(ids, jnp.int32(INT_MAX // 2))
        consts = [(gz * h + gy) * w for gz, gy in pos_groups]
        queries = jnp.concatenate([base_q + c for c in consts])
        packed = _lookup_ext(ids, queries,
                             level.shape).reshape(len(pos_groups), v)
        for g, (gz, gy) in enumerate(pos_groups):
            pk = packed[g]
            pr = pk >> 3
            f0 = (pk >> 2) & 1 > 0
            fp1 = (pk >> 1) & 1 > 0
            fm1 = pk & 1 > 0
            pos_l = pr - f0.astype(jnp.int32)
            entries = [((gz, gy, 0), jnp.clip(pr - 1, 0, v - 1), f0)]
            if kw == 3:
                entries += [
                    ((gz, gy, 1), jnp.clip(pos_l + f0.astype(jnp.int32),
                                           0, v - 1), fp1),
                    ((gz, gy, -1), jnp.clip(pos_l - 1, 0, v - 1), fm1)]
            for key, r, f in entries:
                t = tap_of[key]
                rows_by_tap[t] = r
                found_by_tap[t] = f & inb(t) & mask

    # negative groups: transpose of the positive half — entry (i -> j) at
    # tap o becomes (j -> i) at tap -o; one packed scatter for all of them
    neg_taps = [t for t, e in enumerate(eoffs)
                if (int(e[0]), int(e[1])) < (0, 0)]
    if neg_taps:
        slot_of = {t: s for s, t in enumerate(neg_taps)}
        dst, src = [], []
        for t_neg in neg_taps:
            e = eoffs[t_neg]
            t_pos = tap_of[(-int(e[0]), -int(e[1]), -int(e[2]))]
            r, f = rows_by_tap[t_pos], found_by_tap[t_pos]
            dst.append(jnp.where(f, slot_of[t_neg] * v + r,
                                 len(neg_taps) * v))
            src.append(idx * 2 + 1)
        pk = jnp.zeros(len(neg_taps) * v, jnp.int32).at[
            jnp.concatenate(dst)].set(jnp.concatenate(src), mode='drop')
        pk = pk.reshape(len(neg_taps), v)
        for t_neg in neg_taps:
            s = slot_of[t_neg]
            rows_by_tap[t_neg] = pk[s] >> 1
            found_by_tap[t_neg] = (pk[s] & 1) > 0

    rows = jnp.stack([rows_by_tap[t] for t in range(k_total)], axis=1)
    found = jnp.stack([found_by_tap[t] for t in range(k_total)], axis=1)
    return rows, found


def subm_conv3d(level: SparseLevel, weights, kernel=3, compute_dtype=None,
                book=None):
    """Submanifold conv: output sites == input sites (spconv SubMConv3d).

    The k=(3,3,3) rulebook depends only on the level's active set, so it is
    cached on the level (`subm_rules`) and reused by every later k3 subm
    conv on the same sites — spconv's indice-key reuse.

    `book`: optional precomputed (rows, found) rulebook (host-built by
    ops/host_books.py from the same sorted coords — bit-identical by
    tests/test_host_books.py).  Books are pure integer metadata of the
    active set; building them host-side overlaps with device compute via
    the loader prefetch, removing the book chain (sorts + lookups, the
    measured issue-bound ~40% of the SECOND eval step) from the device
    critical path entirely."""
    kernel = _triple(kernel)
    cacheable = kernel == (3, 3, 3)
    if cacheable and level.subm_rules is not None:
        rows, found = level.subm_rules
    elif book is not None:
        rows, found = book
    else:
        rows, found = _rules_subm(level, kernel)
    mirror = all(kk % 2 == 1 for kk in kernel)
    feats = _apply_rules(level, level.mask, rows, found, weights,
                         compute_dtype, mirror=mirror,
                         kw3=kernel[2] == 3 and XWIN_ENABLED)
    out = level._replace(features=feats)
    if cacheable and level.subm_rules is None:
        out = out._replace(subm_rules=(rows, found))
    return out


def _strided_out_set(level: SparseLevel, kernel, stride, padding, out_cap):
    """Active output set AND forward rulebook of a strided conv/pool.

    The output set is every position whose receptive field touches an
    active input: sort + run-length unique of each input's
    <= prod(ceil(k/s)) candidate outputs.  Every valid candidate IS a
    rulebook entry — it names (input row, output position, tap), and for a
    fixed (output, tap) the contributing input is unique — so carrying
    ``tap*V + input_row`` through the candidate sort yields the forward
    rulebook with ONE extra scatter, replacing the separate
    (V_in + groups*V_out)-element lookup sort `_rules_affine` would need
    (the largest sort in the backbone at conv2 shapes).

    :return: (out_ids, out_coords, out_mask, out_shape, dropped,
              rows (out_cap, K) int32, found (out_cap, K) bool) — rows/found
              in `_kernel_offsets` tap order, matching the weight layout.
    """
    v = level.coords.shape[0]
    out_shape = tuple((level.shape[i] + 2 * padding[i] - kernel[i])
                      // stride[i] + 1 for i in range(3))
    kd, kh, kw = kernel
    k_total = kd * kh * kw

    # candidate outputs per input: o in [ceil((i+p-k+1)/s), floor((i+p)/s)]
    ncand = tuple(-(-kernel[i] // stride[i]) for i in range(3))
    i_c = level.coords
    o_lo, o_hi = [], []
    for d in range(3):
        lo = -(-(i_c[:, d] + padding[d] - kernel[d] + 1) // stride[d])
        hi = (i_c[:, d] + padding[d]) // stride[d]
        o_lo.append(lo)
        o_hi.append(hi)

    pad_arr = jnp.asarray(padding, jnp.int32)
    str_arr = jnp.asarray(stride, jnp.int32)
    cand_coords = []
    cand_valid = []
    cand_origin = []
    in_row = jnp.arange(v, dtype=jnp.int32)
    for dz in range(ncand[0]):
        for dy in range(ncand[1]):
            for dx in range(ncand[2]):
                oz = o_lo[0] + dz
                oy = o_lo[1] + dy
                ox = o_lo[2] + dx
                val = ((oz <= o_hi[0]) & (oy <= o_hi[1]) & (ox <= o_hi[2])
                       & (oz >= 0) & (oy >= 0) & (ox >= 0)
                       & (oz < out_shape[0]) & (oy < out_shape[1])
                       & (ox < out_shape[2]) & level.mask)
                cand_coords.append(jnp.stack([oz, oy, ox], axis=-1))
                cand_valid.append(val)
                # tap t satisfies in = out*s - p + t
                tz = i_c[:, 0] + pad_arr[0] - oz * str_arr[0]
                ty = i_c[:, 1] + pad_arr[1] - oy * str_arr[1]
                tx = i_c[:, 2] + pad_arr[2] - ox * str_arr[2]
                tl = (tz * kh + ty) * kw + tx
                cand_origin.append(tl * v + in_row)
    cand_coords = jnp.concatenate(cand_coords, axis=0)        # (V*ncand, 3)
    cand_valid = jnp.concatenate(cand_valid, axis=0)
    cand_origin = jnp.concatenate(cand_origin, axis=0)

    cand_ids = linearize(cand_coords, out_shape)
    cand_ids = jnp.where(cand_valid, cand_ids, INT_MAX).astype(jnp.int32)

    cand_sorted, origin_s = jax.lax.sort((cand_ids, cand_origin), num_keys=1)
    first = jnp.concatenate([
        (cand_sorted[:1] < INT_MAX),
        (cand_sorted[1:] != cand_sorted[:-1]) & (cand_sorted[1:] < INT_MAX)])
    run_rank = jnp.cumsum(first.astype(jnp.int32)) - 1    # out row per cand
    n_active = jnp.sum(first.astype(jnp.int32))
    dropped = jnp.maximum(n_active - out_cap, 0)
    rank = jnp.where(first & (run_rank < out_cap), run_rank, out_cap)
    out_ids = jnp.full((out_cap,), INT_MAX, jnp.int32)
    out_ids = out_ids.at[rank].set(cand_sorted, mode='drop')
    out_mask = out_ids < INT_MAX
    out_coords = jnp.where(out_mask[:, None],
                           delinearize(out_ids, out_shape), -1).astype(jnp.int32)

    # rulebook: every kept valid candidate scatters its input row into its
    # output row's tap slot ((out, tap) pairs are unique by construction)
    keep = (cand_sorted < INT_MAX) & (run_rank < out_cap)
    slot = jnp.where(keep, run_rank * k_total + origin_s // v,
                     out_cap * k_total)
    rows = jnp.zeros(out_cap * k_total, jnp.int32).at[
        slot].set(origin_s % v, mode='drop').reshape(out_cap, k_total)
    found = jnp.zeros(out_cap * k_total, bool).at[
        slot].set(True, mode='drop').reshape(out_cap, k_total)
    return out_ids, out_coords, out_mask, out_shape, dropped, rows, found


def sparse_conv3d(level: SparseLevel, weights, kernel=3, stride=2, padding=1,
                  out_cap=None, compute_dtype=None, indice_key='', book=None):
    """Strided sparse conv (spconv SparseConv3d): output active set = every
    output position whose receptive field touches an active input.

    `indice_key` (static string) is stashed in the output's `strided_meta`;
    an `inverse_conv3d` passing the same key reuses the forward book (spconv's
    indice-key contract).  With the default '' on both sides, reuse falls back
    to geometry+cap equality — callers whose target level is NOT the producing
    conv's input must pass distinct keys to avoid a silent wrong book.

    `book`: optional precomputed (out_ids, out_coords, out_mask, dropped,
    rows, found) — the host-built output set + forward rulebook (see
    subm_conv3d); replaces the candidate sort `_strided_out_set` would run
    on device.  Inverse-conv reuse via `strided_rules` works unchanged.
    """
    kernel = _triple(kernel)
    stride = _triple(stride)
    padding = _triple(padding)
    out_cap = out_cap or level.coords.shape[0]
    if book is not None:
        out_ids, out_coords, out_mask, dropped, rows, found = book
        out_shape = conv_out_shape(level.shape, kernel, stride, padding)
    else:
        out_ids, out_coords, out_mask, out_shape, dropped, rows, found = \
            _strided_out_set(level, kernel, stride, padding, out_cap)
    feats = _apply_rules_transpose_bwd(
        level, out_mask, rows, found, weights, compute_dtype,
        kw3=kernel[2] == 3 and XWIN_ENABLED)
    n_in = level.ids.shape[0]
    return SparseLevel(features=feats, ids=out_ids, coords=out_coords,
                       mask=out_mask, shape=out_shape, overflow=dropped,
                       strided_rules=jnp.where(found, rows, n_in),
                       strided_meta=(kernel, stride, padding, n_in,
                                     indice_key))


def inverse_conv3d(level: SparseLevel, target: SparseLevel, weights,
                   kernel=3, stride=2, padding=1, compute_dtype=None,
                   indice_key=''):
    """Inverse (up) conv onto a stashed finer level's active set — the
    spconv SparseInverseConv3d / indice-key-reuse equivalent.

    :param level: coarse input level
    :param target: fine level whose ids/coords/mask define the output sites
                   (its features are ignored)
    :param kernel/stride/padding: parameters of the conv being inverted
    """
    kernel = _triple(kernel)
    stride = _triple(stride)
    padding = _triple(padding)
    n_coarse = level.ids.shape[0]
    n_fine = target.ids.shape[0]
    if (level.strided_rules is not None
            and level.strided_meta == (kernel, stride, padding, n_fine,
                                       indice_key)):
        # indice-key reuse: this conv inverts exactly the strided conv that
        # produced `level` onto the same fine active set (the UNet decoder
        # contract, reference rpn_unet.py SparseInverseConv3d indice keys) —
        # the book is the stashed forward book's transpose: one scatter,
        # no lookup sort.  The stashed `indice_key` must match the caller's:
        # geometry+cap equality alone cannot distinguish two different fine
        # levels with the same cap (a mismatched key falls back to the
        # lookup path below — slower, never wrong).
        inv_rules = _transpose_rules_from_fwd(level.strided_rules, n_fine,
                                              n_coarse)
        found = (inv_rules != n_coarse) & target.mask[:, None]
        rows = jnp.where(found, inv_rules, 0)
    else:
        rows, found = _rules_inverse(level, target.coords, target.mask,
                                     kernel, stride, padding)
    feats = _apply_rules_transpose_bwd(
        level, target.mask, rows, found, weights, compute_dtype,
        kw3=kernel[2] == 3 and XWIN_ENABLED)
    return SparseLevel(features=feats, ids=target.ids, coords=target.coords,
                       mask=target.mask, shape=target.shape,
                       subm_rules=target.subm_rules,
                       strided_rules=target.strided_rules,
                       strided_meta=target.strided_meta)


def sparse_maxpool3d(level: SparseLevel, kernel=3, stride=2, padding=1,
                     out_cap=None):
    """Sparse max-pool (spconv SparseMaxPool3d): max over active inputs in
    each output's receptive field; output active set like sparse_conv3d."""
    kernel = _triple(kernel)
    stride = _triple(stride)
    padding = _triple(padding)
    out_cap = out_cap or level.coords.shape[0]
    out_ids, out_coords, out_mask, out_shape, dropped, rows, found = \
        _strided_out_set(level, kernel, stride, padding, out_cap)
    neg = jnp.finfo(level.features.dtype).min
    acc = jnp.full((out_coords.shape[0], level.features.shape[-1]), neg,
                   level.features.dtype)
    for t in range(rows.shape[1]):
        vals = jnp.where(found[:, t:t + 1], level.features[rows[:, t]], neg)
        acc = jnp.maximum(acc, vals)
    feats = jnp.where(out_mask[:, None] & (acc > neg / 2), acc, 0.0)
    return SparseLevel(features=feats, ids=out_ids, coords=out_coords,
                       mask=out_mask, shape=out_shape, overflow=dropped)


# ---------------------------------------------------------------------------
# Batched wrappers: arrays carry a leading batch axis, `shape` stays static.
# The conv weights are closed over (shared across the batch); BatchNorm is
# applied OUTSIDE these wrappers so its statistics span the whole batch's
# voxels (spconv BatchNorm1d semantics).
# ---------------------------------------------------------------------------

def _vmap_level_op(fn, out_shape, level: SparseLevel, *extra_levels,
                   out_meta=None, extra_args=()):
    """vmap a per-sample SparseLevel op over batched SparseLevels.

    `out_shape` must be the statically-known output spatial shape;
    `out_meta` the statically-known `strided_meta` of the output level
    (vmap carries the book arrays, statics ride outside).
    `extra_args`: additional batch-leading pytrees (e.g. a precomputed
    rulebook) passed to `fn` after the per-sample levels.
    """
    all_levels = [level] + list(extra_levels)
    shapes = [lv.shape for lv in all_levels]
    metas = [lv.strided_meta for lv in all_levels]
    n_lv = len(all_levels)

    def per_sample(extra, *arrays):
        levels = []
        for i, shape in enumerate(shapes):
            f, ids, c, m, sr, strb = arrays[6 * i: 6 * i + 6]
            levels.append(SparseLevel(f, ids, c, m, shape, subm_rules=sr,
                                      strided_rules=strb,
                                      strided_meta=metas[i]))
        out = fn(*levels, *extra)
        # overflow / subm_rules / strided_rules are None (empty pytree) or
        # arrays -> vmapped
        return ((out.features, out.ids, out.coords, out.mask), out.overflow,
                out.subm_rules, out.strided_rules)

    flat = []
    for lv in all_levels:
        flat += [lv.features, lv.ids, lv.coords, lv.mask, lv.subm_rules,
                 lv.strided_rules]
    (f, ids, c, m), ovf, sr, strb = jax.vmap(per_sample)(tuple(extra_args),
                                                         *flat)
    return SparseLevel(f, ids, c, m, out_shape, overflow=ovf, subm_rules=sr,
                       strided_rules=strb, strided_meta=out_meta)


def conv_out_shape(in_shape, kernel, stride, padding):
    kernel, stride, padding = _triple(kernel), _triple(stride), _triple(padding)
    return tuple((in_shape[i] + 2 * padding[i] - kernel[i]) // stride[i] + 1
                 for i in range(3))


def subm_conv3d_batched(level, weights, kernel=3, compute_dtype=None,
                        book=None):
    if book is None:
        return _vmap_level_op(
            lambda lv: subm_conv3d(lv, weights, kernel, compute_dtype),
            level.shape, level, out_meta=level.strided_meta)
    return _vmap_level_op(
        lambda lv, b: subm_conv3d(lv, weights, kernel, compute_dtype,
                                  book=b),
        level.shape, level, out_meta=level.strided_meta, extra_args=(book,))


def sparse_conv3d_batched(level, weights, kernel=3, stride=2, padding=1,
                          out_cap=None, compute_dtype=None, indice_key='',
                          book=None):
    out_shape = conv_out_shape(level.shape, kernel, stride, padding)
    out_meta = (_triple(kernel), _triple(stride), _triple(padding),
                level.ids.shape[-1], indice_key)
    if book is None:
        return _vmap_level_op(
            lambda lv: sparse_conv3d(lv, weights, kernel, stride, padding,
                                     out_cap, compute_dtype, indice_key),
            out_shape, level, out_meta=out_meta)
    return _vmap_level_op(
        lambda lv, b: sparse_conv3d(lv, weights, kernel, stride, padding,
                                    out_cap, compute_dtype, indice_key,
                                    book=b),
        out_shape, level, out_meta=out_meta, extra_args=(book,))


def inverse_conv3d_batched(level, target, weights, kernel=3, stride=2,
                           padding=1, compute_dtype=None, indice_key=''):
    return _vmap_level_op(
        lambda lv, tg: inverse_conv3d(lv, tg, weights, kernel, stride,
                                      padding, compute_dtype, indice_key),
        target.shape, level, target, out_meta=target.strided_meta)


def sparse_maxpool3d_batched(level, kernel=3, stride=2, padding=1,
                             out_cap=None):
    out_shape = conv_out_shape(level.shape, kernel, stride, padding)
    return _vmap_level_op(
        lambda lv: sparse_maxpool3d(lv, kernel, stride, padding, out_cap),
        out_shape, level)


def to_dense_batched(level):
    def per_sample(f, ids, c, m):
        return to_dense(SparseLevel(f, ids, c, m, level.shape))
    return jax.vmap(per_sample)(level.features, level.ids, level.coords,
                                level.mask)


def to_dense(level: SparseLevel):
    """(V, C) sparse -> (D, H, W, C) dense via one XLA scatter."""
    d, h, w = level.shape
    c = level.features.shape[-1]
    flat = jnp.where(level.mask, level.ids, d * h * w)
    canvas = jnp.zeros((d * h * w, c), level.features.dtype)
    canvas = canvas.at[flat].set(level.features, mode='drop')
    return canvas.reshape(d, h, w, c)
