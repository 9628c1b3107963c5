"""Top-k-compacted RoI-aware pooling == exact all-pairs path whenever every
roi holds <= K in-box points (the production regime; see roiaware_pool3d)."""
import numpy as np
import pytest
import jax.numpy as jnp

from pcdet_tpu.ops.roiaware_pool import roiaware_pool3d

# XLA-compile-heavy on a 1-core host; run with -m slow (CI) or full suite
pytestmark = pytest.mark.slow


def _random_problem(seed, n_roi=16, p=2000):
    rng = np.random.RandomState(seed)
    rois = np.concatenate([
        rng.uniform(-20, 20, (n_roi, 2)), rng.uniform(-2, 0, (n_roi, 1)),
        rng.uniform(2, 6, (n_roi, 3)), rng.uniform(-np.pi, np.pi, (n_roi, 1)),
    ], axis=1).astype(np.float32)
    pts = np.concatenate([
        rng.uniform(-25, 25, (p, 2)), rng.uniform(-2, 4, (p, 1)),
    ], axis=1).astype(np.float32)
    feats = rng.randn(p, 5).astype(np.float32)
    mask = rng.rand(p) > 0.1
    return rois, pts, feats, mask


def test_compacted_matches_exact():
    for seed in range(3):
        rois, pts, feats, mask = _random_problem(seed)
        for method in ['max', 'avg']:
            exact = np.asarray(roiaware_pool3d(
                jnp.asarray(rois), jnp.asarray(pts), jnp.asarray(feats),
                jnp.asarray(mask), out_size=6, pool_method=method))
            fast = np.asarray(roiaware_pool3d(
                jnp.asarray(rois), jnp.asarray(pts), jnp.asarray(feats),
                jnp.asarray(mask), out_size=6, pool_method=method,
                max_pts_per_roi=2000))  # K = P: lossless
            np.testing.assert_allclose(fast, exact, atol=1e-5, err_msg=method)


def test_compacted_capped_subset():
    """With K < points-in-roi the result pools the first K in-box points —
    still finite, masked correctly, right shape."""
    rois, pts, feats, mask = _random_problem(7)
    out = np.asarray(roiaware_pool3d(
        jnp.asarray(rois), jnp.asarray(pts), jnp.asarray(feats),
        jnp.asarray(mask), out_size=6, pool_method='avg', max_pts_per_roi=8))
    assert out.shape == (16, 6, 6, 6, 5)
    assert np.all(np.isfinite(out))


def test_compacted_grad_flows():
    import jax
    rois, pts, feats, mask = _random_problem(1)

    def s(f):
        return jnp.sum(roiaware_pool3d(
            jnp.asarray(rois), jnp.asarray(pts), f, jnp.asarray(mask),
            out_size=6, pool_method='avg', max_pts_per_roi=256))

    g = jax.grad(s)(jnp.asarray(feats))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_batched_matches_per_sample():
    """roiaware_pool3d_multi_batched == per-sample roiaware_pool3d_multi."""
    from pcdet_tpu.ops.roiaware_pool import (roiaware_pool3d_multi,
                                             roiaware_pool3d_multi_batched)
    b = 3
    probs = [_random_problem(10 + i, n_roi=8, p=500) for i in range(b)]
    rois = jnp.asarray(np.stack([p[0] for p in probs]))
    pts = jnp.asarray(np.stack([p[1] for p in probs]))
    feats = jnp.asarray(np.stack([p[2] for p in probs]))
    mask = jnp.asarray(np.stack([p[3] for p in probs]))
    f2 = feats[..., :2]

    got = roiaware_pool3d_multi_batched(
        rois, pts, [(feats, 'avg'), (f2, 'max')], mask,
        out_size=5, max_pts_per_roi=64)
    for i in range(b):
        want = roiaware_pool3d_multi(
            rois[i], pts[i], [(feats[i], 'avg'), (f2[i], 'max')], mask[i],
            out_size=5, max_pts_per_roi=64)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g[i]), np.asarray(w),
                                       atol=1e-5)
