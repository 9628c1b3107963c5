"""The merge-based id lookup must agree with binary search exactly."""
import numpy as np


def test_lookup_merge_matches_searchsorted():
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse

    rng = np.random.RandomState(0)
    v, m = 500, 3000
    total = 10000
    ids = np.sort(rng.choice(total, v - 37, replace=False)).astype(np.int32)
    ids = np.concatenate([ids, np.full(37, sparse.INT_MAX, np.int32)])
    # queries: mix of hits, misses, and invalid sentinels
    q = np.concatenate([
        rng.choice(ids[:v - 37], m // 2),
        rng.randint(0, total, m // 2).astype(np.int32),
    ])
    rng.shuffle(q)
    valid = rng.rand(m) > 0.1
    q = np.where(valid, q, sparse.INT_MAX - 1).astype(np.int32)

    tj, qj, vj = jnp.asarray(ids), jnp.asarray(q), jnp.asarray(valid)
    row_a, found_a = sparse._lookup_merge(tj, qj, vj)
    # reference: plain binary search
    idx = np.searchsorted(ids, q)
    idx_c = np.clip(idx, 0, v - 1)
    found_b = (ids[idx_c] == q) & valid & (idx < v)
    np.testing.assert_array_equal(np.asarray(found_a), found_b)
    np.testing.assert_array_equal(np.asarray(row_a)[found_b], idx_c[found_b])


def test_merge_lookup_ext_bits():
    """Packed pos_right + presence bits for q-1/q/q+1 match brute force,
    including negative raw queries and INT_MAX table padding."""
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse

    rng = np.random.RandomState(1)
    for trial in range(4):
        v_real = rng.randint(3, 200)
        ids = np.sort(rng.choice(5000, v_real, replace=False)).astype(np.int32)
        ids = np.concatenate([ids, np.full(17, sparse.INT_MAX, np.int32)])
        q = rng.randint(-100, 5100, size=400).astype(np.int32)
        packed = np.asarray(sparse._merge_lookup_ext(
            jnp.asarray(ids), jnp.asarray(q)))
        table = set(ids[:v_real].tolist())
        for j, qq in enumerate(q.tolist()):
            pos_right = int((ids[:v_real] <= qq).sum())
            f0 = qq in table
            fp1 = (qq + 1) in table
            fm1 = (qq - 1) in table
            expect = pos_right * 8 + f0 * 4 + fp1 * 2 + fm1
            assert packed[j] == expect, (trial, j, qq)


def test_rules_subm_matches_affine():
    """The antisymmetry-based subm rulebook (half the groups sorted, the
    rest transposed/shifted) must equal the full affine lookup bit-for-bit
    on every supported kernel."""
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse

    rng = np.random.RandomState(11)
    for kernel in [(3, 3, 3), (1, 1, 1), (3, 1, 1), (1, 1, 3), (1, 3, 3)]:
        for trial in range(3):
            shape = (5, 13, 11)
            v = 96
            n = int(rng.randint(10, 80))
            total = shape[0] * shape[1] * shape[2]
            ids = np.sort(rng.choice(total, n, replace=False)).astype(np.int32)
            ids = np.concatenate([ids, np.full(v - n, sparse.INT_MAX,
                                               np.int32)])
            mask = np.zeros(v, bool)
            mask[:n] = True
            z = ids[:n] // (shape[1] * shape[2])
            rem = ids[:n] % (shape[1] * shape[2])
            coords = np.full((v, 3), -1, np.int32)
            coords[:n] = np.stack([z, rem // shape[2], rem % shape[2]], -1)
            level = sparse.SparseLevel(
                jnp.zeros((v, 2)), jnp.asarray(ids), jnp.asarray(coords),
                jnp.asarray(mask), shape)
            pad = tuple(-(kk // 2) for kk in kernel)
            rows_a, found_a = sparse._rules_affine(
                level, level.coords, level.mask, level.coords, kernel, pad)
            rows_s, found_s = sparse._rules_subm(level, kernel)
            fa, fs = np.asarray(found_a), np.asarray(found_s)
            np.testing.assert_array_equal(fs, fa,
                                          err_msg=str((kernel, trial)))
            np.testing.assert_array_equal(np.asarray(rows_s)[fa],
                                          np.asarray(rows_a)[fa],
                                          err_msg=str((kernel, trial)))
