"""Pallas rotated-overlap kernel vs the jnp reference (interpret mode on CPU)."""
import numpy as np
import pytest


def _rand_boxes5(rng, n, scale=6.0):
    cx = rng.uniform(-scale, scale, n)
    cy = rng.uniform(-scale, scale, n)
    dx = rng.uniform(0.5, 5.0, n)
    dy = rng.uniform(0.5, 5.0, n)
    ang = rng.uniform(-np.pi, np.pi, n)
    return np.stack([cx - dx / 2, cy - dy / 2, cx + dx / 2, cy + dy / 2, ang],
                    axis=1).astype(np.float32)


def test_pallas_overlap_matches_jnp():
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pcdet_tpu.ops import rotated_iou
    from pcdet_tpu.ops.pallas import rotated_overlap

    rng = np.random.RandomState(0)
    a = _rand_boxes5(rng, 24)
    b = _rand_boxes5(rng, 140)    # force padding of both tile dims
    want = np.asarray(rotated_iou.boxes_overlap_bev(jnp.asarray(a),
                                                    jnp.asarray(b)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rotated_overlap.boxes5_pair_overlap(
            jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_pallas_overlap_identical_boxes():
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pcdet_tpu.ops.pallas import rotated_overlap

    box = np.array([[0, 0, 2, 4, 0.7]] * 8, dtype=np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rotated_overlap.boxes5_pair_overlap(
            jnp.asarray(box), jnp.asarray(box)))
    np.testing.assert_allclose(got, np.full((8, 8), 8.0), rtol=1e-3)


def test_pallas_overlap_touching_and_contained():
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pcdet_tpu.ops.pallas import rotated_overlap

    a = np.array([[-5, -5, 5, 5, 0.0]], dtype=np.float32)
    b = np.array([
        [-1, -1, 1, 1, 0.9],     # contained (rotated)
        [5, -1, 7, 1, 0.0],      # shares an edge -> 0 area
        [100, 100, 102, 102, 0.3],  # disjoint
        [-5, -5, 5, 5, np.pi / 2],  # same square rotated 90°
    ], dtype=np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rotated_overlap.boxes5_pair_overlap(
            jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got[0, 0], 4.0, rtol=1e-3)
    assert got[0, 1] < 1e-3
    assert got[0, 2] == 0.0
    np.testing.assert_allclose(got[0, 3], 100.0, rtol=1e-3)
