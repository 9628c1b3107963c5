"""Window-rank lookup backend vs the merge-sort backend (bit parity).

`window_lookup.window_lookup_ext` must produce the EXACT packed encoding of
`sparse._merge_lookup_ext` for every int32 query — in-range, negative,
past-the-grid, sentinel (INT_MAX-8, INT_MAX//2 + c), and one-outside-with-
found-neighbour — so the rulebook builders can switch backend freely.
Kernels run in interpret mode on this CPU suite (the real-TPU lowering is
pinned by scripts/chip_smoke.py, queue step 0).
"""
import numpy as np
import pytest

from tests.test_sparse import _random_level


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from pcdet_tpu.ops.pallas import gather_gemm
    monkeypatch.setattr(gather_gemm, 'INTERPRET', True)


def _random_table(rng, grid_n, n_active, cap):
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    ids = rng.choice(grid_n, size=n_active, replace=False)
    ids.sort()
    buf = np.full((cap,), sparse.INT_MAX, np.int32)
    buf[:n_active] = ids
    return jnp.asarray(buf), ids


def test_packed_equality_fuzz():
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    from pcdet_tpu.ops.pallas import window_lookup
    rng = np.random.RandomState(0)
    for trial in range(8):
        grid_n = int(rng.randint(50, 5000))
        n_active = int(rng.randint(1, min(grid_n, 300)))
        table, ids = _random_table(rng, grid_n, n_active, n_active + 17)
        qs = [
            rng.randint(-5, grid_n + 5, size=200),          # around range
            ids + rng.randint(-2, 3, size=ids.shape),       # near hits
            np.asarray([-1, 0, grid_n - 1, grid_n,
                        sparse.INT_MAX - 8,
                        sparse.INT_MAX // 2 + 7]),          # sentinels/edges
        ]
        q = jnp.asarray(np.concatenate(qs).astype(np.int32))
        ref = np.asarray(sparse._merge_lookup_ext(table, q))
        got = np.asarray(window_lookup.window_lookup_ext(table, q))
        np.testing.assert_array_equal(got, ref, err_msg=f'trial {trial}')


def test_packed_equality_unsorted_queries():
    """The inverse-conv coarse queries are NOT sorted — exactness must not
    depend on query order (only efficiency does)."""
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    from pcdet_tpu.ops.pallas import window_lookup
    rng = np.random.RandomState(7)
    table, ids = _random_table(rng, 4000, 250, 288)
    q = rng.permutation(np.concatenate([
        rng.randint(-3, 4003, size=600),
        ids + rng.randint(-1, 2, size=ids.shape)])).astype(np.int32)
    q = jnp.asarray(q)
    ref = np.asarray(sparse._merge_lookup_ext(table, q))
    got = np.asarray(window_lookup.window_lookup_ext(table, q))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize('builder', ['subm', 'affine', 'inverse'])
def test_rules_bit_identical_across_backends(builder, monkeypatch):
    import jax
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(1)
    level, _ = _random_level(rng, shape=(5, 7, 9), n_active=60, cap=96)
    coarse, _ = _random_level(rng, shape=(3, 4, 5), n_active=25, cap=32)
    fine, _ = _random_level(rng, shape=(6, 8, 10), n_active=70, cap=96)

    def build():
        if builder == 'subm':
            return sparse._rules_subm(level, (3, 3, 3))
        if builder == 'affine':
            # strided-geometry affine book: base = out*stride - padding
            out = level.coords  # reuse the active set as a fake out set
            return sparse._rules_affine(level, out, level.mask,
                                        out * 2, (3, 3, 3), (-1, -1, -1))
        return sparse._rules_inverse(coarse, fine.coords, fine.mask,
                                     (3, 3, 3), (2, 2, 2), (1, 1, 1))

    monkeypatch.setattr(sparse, 'LOOKUP_BACKEND', 'sort')
    r_ref, f_ref = jax.tree_util.tree_map(np.asarray, build())
    monkeypatch.setattr(sparse, 'LOOKUP_BACKEND', 'window')
    r_w, f_w = jax.tree_util.tree_map(np.asarray, build())
    np.testing.assert_array_equal(f_w, f_ref)
    np.testing.assert_array_equal(np.where(f_ref, r_w, 0),
                                  np.where(f_ref, r_ref, 0))


def test_conv_outputs_identical_across_backends(monkeypatch):
    """End-to-end: subm + strided + inverse convs bit-identical."""
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(2)
    level, _ = _random_level(rng, shape=(6, 8, 8), n_active=40, cin=5)
    w3 = jnp.asarray(rng.randn(27, 5, 6).astype(np.float32))
    w_str = jnp.asarray(rng.randn(27, 6, 5).astype(np.float32))
    w_inv = jnp.asarray(rng.randn(27, 5, 4).astype(np.float32))

    def run():
        x = sparse.subm_conv3d(level, w3, 3)
        y = sparse.sparse_conv3d(x, w_str, 3, 2, 1, out_cap=48)
        z = sparse.inverse_conv3d(y, x, w_inv, 3, 2, 1)
        return (np.asarray(x.features), np.asarray(y.features),
                np.asarray(z.features), np.asarray(y.ids),
                np.asarray(y.coords), np.asarray(y.mask))

    monkeypatch.setattr(sparse, 'LOOKUP_BACKEND', 'sort')
    ref = run()
    monkeypatch.setattr(sparse, 'LOOKUP_BACKEND', 'window')
    got = run()
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(b, a)


def test_batched_convs_identical_across_backends(monkeypatch):
    """The chip path always runs under vmap — the windowed pallas_call must
    preserve the parity under batching too."""
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse
    rng = np.random.RandomState(5)
    levels = [_random_level(rng, shape=(6, 8, 8), n_active=30 + 8 * i,
                            cap=64, cin=6)[0] for i in range(3)]
    lv = sparse.SparseLevel(*[jnp.stack([getattr(l, f) for l in levels])
                              for f in ('features', 'ids', 'coords', 'mask')],
                            (6, 8, 8))
    w3 = jnp.asarray(rng.randn(27, 6, 6).astype(np.float32))

    def run():
        x = sparse.subm_conv3d_batched(lv, w3, 3)
        y = sparse.sparse_conv3d_batched(x, w3, 3, 2, 1, out_cap=48)
        return (np.asarray(x.features), np.asarray(y.features),
                np.asarray(y.ids), np.asarray(y.mask))

    monkeypatch.setattr(sparse, 'LOOKUP_BACKEND', 'sort')
    ref = run()
    monkeypatch.setattr(sparse, 'LOOKUP_BACKEND', 'window')
    got = run()
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(b, a)
