"""The x-window property every kw=3 rulebook must satisfy: within each
(dz, dy) tap group, all FOUND rows lie in a 3-consecutive-row window of the
sorted table (`sparse._xwin_selectors` docstring).  The Pallas x-window
gather kernel is only correct under this invariant, so it is asserted here
on real rulebooks from every conv geometry the backbones use."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdet_tpu.ops import sparse


def _make_level(rng, v, shape, n_active, c=8):
    """Run-structured active set (x-runs) on a (D, H, W) grid."""
    n_seeds = max(n_active // 4, 1)
    z = rng.randint(0, shape[0], size=(n_seeds,))
    y = rng.randint(0, shape[1], size=(n_seeds,))
    x = rng.randint(0, max(shape[2] - 6, 1), size=(n_seeds,))
    run = rng.randint(1, 6, size=(n_seeds,))
    allz, ally, allx = [], [], []
    for i in range(6):
        keep = i < run
        allz.append(z[keep])
        ally.append(y[keep])
        allx.append(x[keep] + i)
    allz, ally, allx = (np.concatenate(a) for a in (allz, ally, allx))
    ids = np.unique((allz * shape[1] + ally) * shape[2] + allx)[:v]
    n = len(ids)
    buf = np.full((v,), sparse.INT_MAX, np.int64)
    buf[:n] = ids
    mask = np.zeros((v,), bool)
    mask[:n] = True
    cz = buf // (shape[1] * shape[2])
    rem = buf % (shape[1] * shape[2])
    coords = np.stack([cz, rem // shape[2], rem % shape[2]], -1)
    coords = np.where(mask[:, None], coords, -1).astype(np.int32)
    feats = rng.randn(v, c).astype(np.float32) * mask[:, None]
    return sparse.SparseLevel(jnp.asarray(feats), jnp.asarray(
        buf.astype(np.int32)), jnp.asarray(coords), jnp.asarray(mask), shape)


def _assert_xwin(rows, found):
    """found rows of every x-group lie within [base, base+2]."""
    rows, found = np.asarray(rows), np.asarray(found)
    v, k = rows.shape
    r3 = rows.reshape(v, k // 3, 3)
    f3 = found.reshape(v, k // 3, 3)
    big = np.where(f3, r3, np.iinfo(np.int32).max)
    base = big.min(axis=2)
    off = np.where(f3, r3 - base[:, :, None], 0)
    assert off.max() <= 2, 'x-window property violated: spread %d' % off.max()
    # and the selector derivation reproduces (rows, found) exactly
    n_in = rows.max() + 1
    rules = np.where(found, rows, n_in)
    b, sel = sparse._xwin_selectors(jnp.asarray(rules), n_in)
    b, sel = np.asarray(b), np.asarray(sel)
    for dx in range(3):
        o = (sel >> (2 * dx)) & 3
        re_found = o < 3
        re_rows = b + o
        np.testing.assert_array_equal(re_found, f3[:, :, dx])
        np.testing.assert_array_equal(re_rows[re_found],
                                      r3[:, :, dx][re_found])


SHAPE = (9, 40, 48)


@pytest.mark.parametrize('seed', [0, 1])
def test_subm_rulebook_xwin(seed):
    rng = np.random.RandomState(seed)
    lv = _make_level(rng, 512, SHAPE, 400)
    rows, found = jax.jit(
        lambda: sparse._rules_subm(lv, (3, 3, 3)))()
    _assert_xwin(rows, found)
    # mirrored book (subm backward) has the same group structure
    _assert_xwin(rows[:, ::-1], found[:, ::-1])


def test_strided_rulebook_xwin():
    rng = np.random.RandomState(2)
    lv = _make_level(rng, 512, SHAPE, 400)
    out = jax.jit(lambda: sparse._strided_out_set(
        lv, (3, 3, 3), (2, 2, 2), (1, 1, 1), 512))()
    _assert_xwin(out[5], out[6])


def test_inverse_rulebook_xwin():
    rng = np.random.RandomState(3)
    coarse_shape = tuple((s + 1) // 2 for s in SHAPE)
    coarse = _make_level(rng, 256, coarse_shape, 200)
    fine = _make_level(rng, 512, SHAPE, 400)
    rows, found = jax.jit(lambda: sparse._rules_inverse(
        coarse, fine.coords, fine.mask, (3, 3, 3), (2, 2, 2), (1, 1, 1)))()
    _assert_xwin(rows, found)


def test_affine_rulebook_xwin():
    rng = np.random.RandomState(4)
    coarse_shape = tuple((s + 1) // 2 for s in SHAPE)
    coarse = _make_level(rng, 256, coarse_shape, 200)
    fine = _make_level(rng, 512, SHAPE, 400)
    # inverse-conv transpose book: affine geometry onto the fine table
    rows, found = jax.jit(lambda: sparse._rules_affine(
        fine, coarse.coords, coarse.mask,
        coarse.coords * jnp.asarray((2, 2, 2), jnp.int32),
        (3, 3, 3), (-1, -1, -1)))()
    _assert_xwin(rows, found)
