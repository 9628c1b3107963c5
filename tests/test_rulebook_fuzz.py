"""Property fuzz: EVERY rulebook geometry vs a dict brute force.

Round 3 found two rulebook bugs that the shape-specific unit tests missed
(unsorted host-voxelizer ids; a wrong geometric inverse-conv backward
builder).  This fuzz pins all live geometries — subm k1/k3/k5, strided
(incl. anisotropic conv_out), inverse, and the scatter-built transpose
books — against a coordinate-dict reference across random seeds/densities.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pcdet_tpu.ops import sparse


@pytest.fixture(params=['sort'])
def lookup_backend(request, monkeypatch):
    """Lookup backend under test.  'sort' is the only backend left after
    the round-5 chip microbenches (bitmap and window both lost and were
    deleted); the fixture stays parametrized so a future backend slots in
    as one extra param."""
    monkeypatch.setattr(sparse, 'LOOKUP_BACKEND', request.param)
    return request.param

SHAPE = (7, 12, 14)


def _level(seed, v=80, frac=0.6, shape=SHAPE):
    rng = np.random.RandomState(seed)
    n = int(v * frac)
    ids = np.sort(rng.choice(np.prod(shape), n, replace=False))
    buf = np.full((v,), sparse.INT_MAX, np.int64)
    buf[:n] = ids
    mask = np.zeros(v, bool)
    mask[:n] = True
    z = buf // (shape[1] * shape[2])
    rem = buf % (shape[1] * shape[2])
    coords = np.where(mask[:, None],
                      np.stack([z, rem // shape[2], rem % shape[2]], -1),
                      -1).astype(np.int32)
    return sparse.SparseLevel(
        jnp.asarray(rng.randn(v, 2).astype(np.float32) * mask[:, None]),
        jnp.asarray(buf.astype(np.int32)), jnp.asarray(coords),
        jnp.asarray(mask), shape)


def _lut(level):
    c, m = np.asarray(level.coords), np.asarray(level.mask)
    return {tuple(c[i]): i for i in range(len(c)) if m[i]}


def _check_book(rows, found, out_coords, out_mask, in_level, tap_to_in,
                kernel):
    """Every (out, tap) must point at exactly the brute-force input row."""
    offs = sparse._kernel_offsets(kernel)
    lut = _lut(in_level)
    rows, found = np.asarray(rows), np.asarray(found)
    oc, om = np.asarray(out_coords), np.asarray(out_mask)
    shape = in_level.shape
    for o in range(len(oc)):
        for t in range(offs.shape[0]):
            if not om[o]:
                assert not found[o, t]
                continue
            q = tap_to_in(oc[o], offs[t])
            exp = (lut.get(tuple(q))
                   if q is not None and (np.asarray(q) >= 0).all()
                   and (np.asarray(q) < np.array(shape)).all() else None)
            if exp is None:
                assert not found[o, t], (o, t, q)
            else:
                assert found[o, t] and rows[o, t] == exp, \
                    (o, t, q, rows[o, t], exp, found[o, t])


@pytest.mark.parametrize('seed', range(4))
@pytest.mark.parametrize('kernel', [(1, 1, 1), (3, 3, 3), (5, 5, 5),
                                    (1, 3, 3)])
def test_subm_rules_fuzz(seed, kernel, lookup_backend):
    lv = _level(seed)
    rows, found = sparse._rules_subm(lv, kernel)
    ctr = np.asarray(kernel) // 2

    def tap_to_in(out_c, off):
        return out_c + off - ctr
    _check_book(rows, found, lv.coords, lv.mask, lv, tap_to_in, kernel)


@pytest.mark.parametrize('seed', range(3))
@pytest.mark.parametrize('kernel,stride,padding', [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
    ((2, 2, 2), (2, 2, 2), (0, 0, 0)),
])
def test_strided_out_set_fuzz(seed, kernel, stride, padding, lookup_backend):
    lv = _level(seed)
    cap = 256
    out_ids, out_coords, out_mask, out_shape, dropped, rows, found = \
        sparse._strided_out_set(lv, kernel, stride, padding, cap)
    assert int(np.asarray(dropped)) == 0

    # expected active out set: every position whose field touches an input
    lut_in = _lut(lv)
    exp = set()
    for c in lut_in:
        for t in sparse._kernel_offsets(kernel):
            num = np.array(c) + np.array(padding) - t
            if (num % np.array(stride) == 0).all() and (num >= 0).all():
                o = num // np.array(stride)
                if (o < np.array(out_shape)).all():
                    exp.add(tuple(o))
    om = np.asarray(out_mask)
    got = {tuple(r) for r in np.asarray(out_coords)[om]}
    assert got == exp
    # ids ascending (SparseLevel invariant)
    oi = np.asarray(out_ids)[om]
    assert (np.diff(oi) > 0).all()

    def tap_to_in(out_c, off):
        return out_c * np.array(stride) - np.array(padding) + off
    _check_book(rows, found, out_coords, out_mask, lv, tap_to_in, kernel)

    # transpose book (training backward) vs brute force
    n_in = lv.ids.shape[0]
    tr = np.asarray(sparse._transpose_rules_from_fwd(
        jnp.where(found, rows, n_in), n_in, cap))
    lut_out = {tuple(np.asarray(out_coords)[i]): i
               for i in range(cap) if om[i]}
    offs = sparse._kernel_offsets(kernel)
    ic, im = np.asarray(lv.coords), np.asarray(lv.mask)
    for u in range(n_in):
        for t in range(offs.shape[0]):
            exp_row = cap
            if im[u]:
                num = ic[u] + np.array(padding) - offs[t]
                if (num % np.array(stride) == 0).all() and (num >= 0).all():
                    o = tuple(num // np.array(stride))
                    exp_row = lut_out.get(o, cap)
            assert tr[u, t] == exp_row, (u, t, tr[u, t], exp_row)


@pytest.mark.parametrize('seed', range(3))
@pytest.mark.parametrize('kernel,stride,padding', [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
    ((2, 2, 2), (2, 2, 2), (0, 0, 0)),      # generic-fallback geometry
])
def test_inverse_rules_fuzz(seed, kernel, stride, padding, lookup_backend):
    coarse_shape = sparse.conv_out_shape(SHAPE, kernel, stride, padding)
    fine = _level(seed)
    coarse = _level(seed + 100, v=48, shape=coarse_shape)
    rows, found = sparse._rules_inverse(coarse, fine.coords, fine.mask,
                                        kernel, stride, padding)

    def tap_to_in(out_c, off):
        num = out_c + np.array(padding) - off
        if (num % np.array(stride) != 0).any() or (num < 0).any():
            return None
        return num // np.array(stride)
    _check_book(rows, found, fine.coords, fine.mask, coarse, tap_to_in,
                kernel)

    # transpose book (inverse-conv backward) vs brute force
    n_in = coarse.ids.shape[0]
    n_out = fine.ids.shape[0]
    tr = np.asarray(sparse._transpose_rules_from_fwd(
        jnp.where(found, rows, n_in), n_in, n_out))
    lut_fine = _lut(fine)
    offs = sparse._kernel_offsets(kernel)
    cc, cm = np.asarray(coarse.coords), np.asarray(coarse.mask)
    for u in range(n_in):
        for t in range(offs.shape[0]):
            exp_row = n_out
            if cm[u]:
                f = cc[u] * np.array(stride) - np.array(padding) + offs[t]
                if (f >= 0).all() and (f < np.array(SHAPE)).all():
                    exp_row = lut_fine.get(tuple(f), n_out)
            assert tr[u, t] == exp_row, (u, t, tr[u, t], exp_row)
