"""Batched NMS == per-sample NMS, exactly.

nms_bev_batched advances every sample's greedy frontier per round in one
kernel call; these tests pin its per-sample results to nms_bev (itself
tested against a python greedy reference in test_rotated_iou.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdet_tpu.ops import nms as nms_ops


def _random_boxes5(rng, n, spread=40.0):
    cx = rng.uniform(-spread, spread, n)
    cy = rng.uniform(-spread, spread, n)
    w = rng.uniform(1.0, 5.0, n)
    l = rng.uniform(1.0, 7.0, n)
    ang = rng.uniform(-np.pi, np.pi, n)
    return np.stack([cx - w / 2, cy - l / 2, cx + w / 2, cy + l / 2, ang],
                    axis=1).astype(np.float32)


@pytest.mark.parametrize('rotated', [True, False])
def test_batched_matches_per_sample(rotated):
    rng = np.random.RandomState(0)
    g, a, pre, post = 5, 256, 128, 32
    boxes = np.stack([_random_boxes5(rng, a, spread=15.0) for _ in range(g)])
    scores = rng.randn(g, a).astype(np.float32)
    valid = rng.rand(g, a) > 0.2

    sel_b, num_b = nms_ops.nms_bev_batched(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1,
        pre_max=pre, post_max=post, valid_mask=jnp.asarray(valid),
        rotated=rotated)
    sel_b, num_b = np.asarray(sel_b), np.asarray(num_b)

    for i in range(g):
        sel_s, num_s = nms_ops.nms_bev(
            jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.1,
            pre_max=pre, post_max=post, valid_mask=jnp.asarray(valid[i]),
            rotated=rotated)
        np.testing.assert_array_equal(sel_b[i], np.asarray(sel_s))
        assert num_b[i] == int(num_s)


def test_batched_post_max_truncation():
    # dense overlapping cluster forces long suppression chains and exercises
    # the per-sample n >= post_max stop
    rng = np.random.RandomState(1)
    g, a, pre, post = 3, 200, 200, 8
    boxes = np.stack([_random_boxes5(rng, a, spread=6.0) for _ in range(g)])
    scores = rng.randn(g, a).astype(np.float32)

    sel_b, num_b = nms_ops.nms_bev_batched(
        jnp.asarray(boxes), jnp.asarray(scores), 0.3,
        pre_max=pre, post_max=post)
    for i in range(g):
        sel_s, num_s = nms_ops.nms_bev(
            jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.3,
            pre_max=pre, post_max=post)
        np.testing.assert_array_equal(np.asarray(sel_b)[i], np.asarray(sel_s))
        assert np.asarray(num_b)[i] == int(num_s)


def test_batched_empty_sample():
    # one sample has zero valid boxes; must return all -1 and not hang
    rng = np.random.RandomState(2)
    g, a = 2, 64
    boxes = np.stack([_random_boxes5(rng, a) for _ in range(g)])
    scores = rng.randn(g, a).astype(np.float32)
    valid = np.ones((g, a), bool)
    valid[1] = False
    sel, num = nms_ops.nms_bev_batched(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1,
        pre_max=64, post_max=16, valid_mask=jnp.asarray(valid))
    assert int(np.asarray(num)[1]) == 0
    assert (np.asarray(sel)[1] == -1).all()
    assert int(np.asarray(num)[0]) > 0
