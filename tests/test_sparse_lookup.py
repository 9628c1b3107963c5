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
