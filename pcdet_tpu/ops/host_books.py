"""Host-side sparse-conv rulebook construction.

Rulebooks (which input row feeds which output row at which kernel tap) are
pure integer metadata of the active voxel set.  The voxel coords originate
on the HOST (the dataset voxelizer), so the books can be built there too —
in the dataloader workers, overlapped with device compute via prefetch —
instead of on the device inside the jitted step, where the sort/lookup
chain was measured issue-bound at 5.4% MFU / 13.7% HBM utilization
(ROOFLINE.json) and ~40% of the SECOND eval step (CHIP_QUEUE_LOG
lookup-micro, 2026-08-19).

This mirrors the reference's division of labour inverted for the TPU: the
reference builds indice pairs on the GPU inside spconv
(`/root/reference/pcdet/models/rpn/rpn_backbone.py` via spconv's
get_indice_pairs); on TPU the device's comparative advantage is the MXU,
not data-dependent integer sorting, so the books move to the host where a
hash/searchsorted build is a few ms and pipelines behind the chip.

Bit-compat contract (tests/test_host_books.py fuzzes it vs the device
builders): identical out_ids / out_coords / out_mask / dropped, identical
`found`, identical `rows` wherever found (misses carry arbitrary in-range
rows — every consumer masks by `found`).

Books are per-sample dicts of numpy arrays, flattened into `hb_*` batch
keys by `pack_books` so they ride the normal collate / device_put path,
and rebuilt by `unpack_books` inside the model wrapper.
"""
from typing import Dict, List, Optional, Tuple

import numpy as np

INT_MAX = np.iinfo(np.int32).max

# field suffixes for the flat batch encoding
_SUBM_FIELDS = ('rows', 'fnd')
_STRIDED_FIELDS = ('ids', 'crd', 'msk', 'drp', 'rows', 'fnd')


def _triple(x):
    if isinstance(x, (tuple, list)):
        return tuple(int(v) for v in x)
    return (int(x),) * 3


def _linearize(coords, shape):
    d, h, w = shape
    return (coords[..., 0].astype(np.int64) * h
            + coords[..., 1].astype(np.int64)) * w + coords[..., 2]


def _kernel_offsets(kernel):
    kd, kh, kw = kernel
    return np.asarray([(i, j, l) for i in range(kd) for j in range(kh)
                       for l in range(kw)], dtype=np.int64)


def subm_book_np(coords: np.ndarray, mask: np.ndarray,
                 shape: Tuple[int, int, int],
                 kernel=(3, 3, 3)) -> Tuple[np.ndarray, np.ndarray]:
    """Subm rulebook on the host: rows (V, K) int32, found (V, K) bool in
    `_kernel_offsets` tap order (matches sparse._rules_subm)."""
    kernel = _triple(kernel)
    v = coords.shape[0]
    ids = np.where(mask, _linearize(coords, shape), np.int64(INT_MAX))
    offs = _kernel_offsets(kernel)
    center = np.asarray([k // 2 for k in kernel], np.int64)
    eoffs = offs - center                                     # (K, 3)
    shape_arr = np.asarray(shape, np.int64)
    k_total = eoffs.shape[0]

    # all taps at once: query ids are ids + linear(eoff); bounds per dim
    d, h, w = shape
    lin_off = (eoffs[:, 0] * h + eoffs[:, 1]) * w + eoffs[:, 2]   # (K,)
    nc = coords[None, :, :].astype(np.int64) + eoffs[:, None, :]  # (K, V, 3)
    inb = np.all((nc >= 0) & (nc < shape_arr[None, None, :]), axis=-1)
    q = ids[None, :] + lin_off[:, None]                           # (K, V)
    idx = np.searchsorted(ids, q).astype(np.int64)                # (K, V)
    idx_c = np.minimum(idx, v - 1)
    found = (idx < v) & (np.take(ids, idx_c) == q) & inb & mask[None, :]
    rows = np.clip(idx_c, 0, v - 1).astype(np.int32)
    return (np.ascontiguousarray(rows.T),
            np.ascontiguousarray(found.T))


def strided_book_np(coords: np.ndarray, mask: np.ndarray,
                    shape: Tuple[int, int, int], kernel, stride, padding,
                    out_cap: int):
    """Strided conv/pool output set + forward rulebook on the host
    (mirrors sparse._strided_out_set).

    :return: out_ids (O,) int32, out_coords (O, 3) int32, out_mask (O,),
             dropped () int32, rows (O, K) int32, found (O, K) bool
    """
    kernel, stride, padding = _triple(kernel), _triple(stride), _triple(padding)
    v = coords.shape[0]
    kd, kh, kw = kernel
    k_total = kd * kh * kw
    out_shape = tuple((shape[i] + 2 * padding[i] - kernel[i]) // stride[i] + 1
                      for i in range(3))
    ncand = tuple(-(-kernel[i] // stride[i]) for i in range(3))
    i_c = coords.astype(np.int64)

    o_lo, o_hi = [], []
    for dd in range(3):
        o_lo.append(-(-(i_c[:, dd] + padding[dd] - kernel[dd] + 1)
                      // stride[dd]))
        o_hi.append((i_c[:, dd] + padding[dd]) // stride[dd])

    in_row = np.arange(v, dtype=np.int64)
    cand_ids, cand_origin = [], []
    for dz in range(ncand[0]):
        for dy in range(ncand[1]):
            for dx in range(ncand[2]):
                oz, oy, ox = o_lo[0] + dz, o_lo[1] + dy, o_lo[2] + dx
                val = ((oz <= o_hi[0]) & (oy <= o_hi[1]) & (ox <= o_hi[2])
                       & (oz >= 0) & (oy >= 0) & (ox >= 0)
                       & (oz < out_shape[0]) & (oy < out_shape[1])
                       & (ox < out_shape[2]) & mask)
                oid = (oz * out_shape[1] + oy) * out_shape[2] + ox
                tz = i_c[:, 0] + padding[0] - oz * stride[0]
                ty = i_c[:, 1] + padding[1] - oy * stride[1]
                tx = i_c[:, 2] + padding[2] - ox * stride[2]
                tl = (tz * kh + ty) * kw + tx
                cand_ids.append(np.where(val, oid, np.int64(INT_MAX)))
                cand_origin.append(tl * v + in_row)
    cand_ids = np.concatenate(cand_ids)
    cand_origin = np.concatenate(cand_origin)

    order = np.argsort(cand_ids, kind='stable')
    cs = cand_ids[order]
    co = cand_origin[order]
    valid = cs < INT_MAX
    first = np.empty_like(valid)
    first[:1] = valid[:1]
    first[1:] = (cs[1:] != cs[:-1]) & valid[1:]
    run_rank = np.cumsum(first) - 1                  # out row per candidate
    n_active = int(first.sum())
    dropped = np.int32(max(n_active - out_cap, 0))

    out_ids = np.full((out_cap,), INT_MAX, np.int64)
    sel = first & (run_rank < out_cap)
    out_ids[run_rank[sel]] = cs[sel]
    out_mask = out_ids < INT_MAX
    out_coords = np.full((out_cap, 3), -1, np.int32)
    oz = out_ids // (out_shape[1] * out_shape[2])
    rem = out_ids % (out_shape[1] * out_shape[2])
    out_coords_full = np.stack(
        [oz, rem // out_shape[2], rem % out_shape[2]], axis=-1)
    out_coords[out_mask] = out_coords_full[out_mask]

    rows = np.zeros((out_cap, k_total), np.int32)
    found = np.zeros((out_cap, k_total), bool)
    keep = valid & (run_rank < out_cap)
    r_keep = run_rank[keep]
    t_keep = co[keep] // v
    rows[r_keep, t_keep] = (co[keep] % v).astype(np.int32)
    found[r_keep, t_keep] = True
    return (out_ids.astype(np.int32), out_coords, out_mask, dropped,
            rows, found)


# ---------------------------------------------------------------------------
# Encoder spec: the static geometry of the BackBone8x / UNetV2 encoder chain
# (reference rpn_backbone.py BackBone8x / rpn_unet.py UNetV2 encoder).  Kept
# declarative so the host walk and the flax modules cannot drift silently —
# tests/test_host_books.py asserts e2e bit-parity through the real model.
# ---------------------------------------------------------------------------

def encoder_spec(sparse_shape, caps, last_pad) -> List[tuple]:
    """Book spec for the shared BackBone8x/UNetV2 encoder geometry.

    :param caps: resolved per-level caps (conv2, conv3, conv4, conv_out)
                 — backbones3d._resolve_caps output.
    :return: ordered op list of
             ('subm', key) | ('spconv', key, kernel, stride, padding, cap)
    """
    return [
        ('subm', 'subm1'),
        ('spconv', 'spconv2', (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[0]),
        ('subm', 'subm2'),
        ('spconv', 'spconv3', (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[1]),
        ('subm', 'subm3'),
        ('spconv', 'spconv4', (3, 3, 3), (2, 2, 2), (0, 1, 1), caps[2]),
        ('subm', 'subm4'),
        ('spconv', 'convout', (3, 1, 1), (2, 1, 1), _triple(last_pad),
         caps[3]),
    ]


def build_books_sample(coords: np.ndarray, mask: np.ndarray, sparse_shape,
                       spec) -> Dict[str, tuple]:
    """Walk the spec on one sample's sorted coords; returns {key: book}."""
    books = {}
    shape = tuple(int(s) for s in sparse_shape)
    cur_coords, cur_mask = np.asarray(coords), np.asarray(mask)
    for op in spec:
        if op[0] == 'subm':
            books[op[1]] = subm_book_np(cur_coords, cur_mask, shape)
        else:
            _, key, kernel, stride, padding, cap = op
            book = strided_book_np(cur_coords, cur_mask, shape, kernel,
                                   stride, padding, int(cap))
            books[key] = book
            out_ids, cur_coords, cur_mask = book[0], book[1], book[2]
            shape = tuple((shape[i] + 2 * _triple(padding)[i]
                           - _triple(kernel)[i]) // _triple(stride)[i] + 1
                          for i in range(3))
    return books


# ---------------------------------------------------------------------------
# Compact wire format: rows uint16 (V caps < 65536 by construction), found
# bit-packed into one uint32 per output row (K <= 32).  ~2.3x smaller than
# (int32 rows, bool found) on the host->device path; decoded on device with
# one shift-and-mask (fused into the consumer by XLA).
# ---------------------------------------------------------------------------

def _pack_found(found: np.ndarray) -> np.ndarray:
    """(.., K) bool -> (..,) uint32 bitpack, bit t = tap t."""
    k = found.shape[-1]
    bits = (found.astype(np.uint32)
            << np.arange(k, dtype=np.uint32)).sum(axis=-1, dtype=np.uint64)
    return bits.astype(np.uint32)


def _compact(book: tuple) -> tuple:
    if len(book) == 2:
        rows, found = book
        return rows.astype(np.uint16), _pack_found(found)
    out_ids, out_coords, out_mask, dropped, rows, found = book
    return (out_ids.astype(np.int32), out_coords.astype(np.int32),
            np.asarray(out_mask, bool), np.int32(dropped),
            rows.astype(np.uint16), _pack_found(found))


def _decode(book: tuple) -> tuple:
    """Compact wire book -> (int32 rows, bool found) device form (jnp ops;
    traces into the consumer jit)."""
    import jax.numpy as jnp

    def dec(rows, fnd):
        k = rows.shape[-1]
        taps = jnp.arange(k, dtype=jnp.uint32)
        found = (fnd[..., None] >> taps) & jnp.uint32(1) > 0
        return rows.astype(jnp.int32), found

    if len(book) == 2:
        return dec(book[0], book[1])
    out_ids, out_coords, out_mask, dropped, rows, fnd = book
    rows, found = dec(rows, fnd)
    return (out_ids, out_coords, out_mask, dropped, rows, found)


def pack_books(books: Dict[str, tuple]) -> Dict[str, np.ndarray]:
    """Flatten one sample's books into collate-friendly 'hb_*' arrays
    (compact wire format)."""
    flat = {}
    for key, book in books.items():
        book = _compact(book)
        fields = _SUBM_FIELDS if len(book) == 2 else _STRIDED_FIELDS
        for name, arr in zip(fields, book):
            flat['hb_%s_%s' % (key, name)] = np.asarray(arr)
    return flat


def unpack_books(batch) -> Optional[Dict[str, tuple]]:
    """Rebuild the nested {key: book} dict from 'hb_*' batch entries and
    decode the wire format.  None if the batch carries no books."""
    keys = {}
    for k in batch:
        if not k.startswith('hb_'):
            continue
        key, field = k[3:].rsplit('_', 1)
        keys.setdefault(key, {})[field] = batch[k]
    if not keys:
        return None
    books = {}
    for key, fields in keys.items():
        names = _SUBM_FIELDS if len(fields) == 2 else _STRIDED_FIELDS
        books[key] = _decode(tuple(fields[n] for n in names))
    return books


def _prefix_valid(mask_b: np.ndarray) -> bool:
    m = mask_b.astype(bool)
    return bool(np.all(m[:, :-1] >= m[:, 1:]))


def build_books_batch(coords_b: np.ndarray, mask_b: np.ndarray, sparse_shape,
                      spec) -> Dict[str, np.ndarray]:
    """Build all spec books for a batch (compact 'hb_*' arrays).

    Fast path: the native C++/OpenMP builders (host_books_native.cpp,
    two-pointer merges + one candidate sort — ~100x the numpy oracle).
    Falls back to the per-sample numpy walk when the library is missing or
    the masks aren't valid-prefix shaped.
    """
    coords_b = np.asarray(coords_b)
    mask_b = np.asarray(mask_b)
    if _prefix_valid(mask_b):
        flat = _build_books_batch_native(coords_b, mask_b, sparse_shape,
                                         spec)
        if flat is not None:
            return flat
    per = [pack_books(build_books_sample(coords_b[i], mask_b[i],
                                         sparse_shape, spec))
           for i in range(coords_b.shape[0])]
    return {k: np.stack([p[k] for p in per]) for k in per[0]}


def make_batch_transform(model, training: bool):
    """Loader `batch_transform` that adds host-built books for `model`.

    Returns None when the model has no sparse encoder (PointPillar) or the
    user disabled the path (PCDET_HOST_BOOKS=0).  Runs in the loader's
    producer thread; the native builders release the GIL (ctypes), so the
    build overlaps the device step like the rest of the host pipeline.
    """
    import os
    if os.environ.get('PCDET_HOST_BOOKS', '1') == '0':
        return None
    if not hasattr(model, 'host_book_spec'):
        return None
    sparse_shape = model.sparse_shape
    spec_cache = {}

    def transform(batch):
        cap = batch['coordinates'].shape[1]
        if cap not in spec_cache:
            spec_cache[cap] = model.host_book_spec(cap, training)
        batch.update(build_books_batch(batch['coordinates'],
                                       batch['voxel_mask'], sparse_shape,
                                       spec_cache[cap]))
        return batch

    return transform


def _build_books_batch_native(coords_b, mask_b, sparse_shape, spec):
    from .. import native
    if native.get_lib() is None:
        return None
    flat = {}
    shape = tuple(int(s) for s in sparse_shape)
    cur_coords = coords_b.astype(np.int32)
    n_valid = mask_b.sum(axis=1).astype(np.int32)
    for op in spec:
        if op[0] == 'subm':
            out = native.subm_books_batch(cur_coords, n_valid, shape,
                                          (3, 3, 3))
            flat['hb_%s_rows' % op[1]], flat['hb_%s_fnd' % op[1]] = out
        else:
            _, key, kernel, stride, padding, cap = op
            kernel = _triple(kernel)
            stride = _triple(stride)
            padding = _triple(padding)
            out_ids, out_coords, out_n, dropped, rows, fnd = \
                native.strided_books_batch(cur_coords, n_valid, shape,
                                           kernel, stride, padding, int(cap))
            flat['hb_%s_ids' % key] = out_ids
            flat['hb_%s_crd' % key] = out_coords
            flat['hb_%s_msk' % key] = out_ids < INT_MAX
            flat['hb_%s_drp' % key] = dropped
            flat['hb_%s_rows' % key] = rows
            flat['hb_%s_fnd' % key] = fnd
            cur_coords, n_valid = out_coords, out_n
            shape = tuple((shape[i] + 2 * padding[i] - kernel[i])
                          // stride[i] + 1 for i in range(3))
    return flat
