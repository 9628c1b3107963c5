"""Geometry/codec core unit tests (golden values + invariants + np/jnp parity)."""
import numpy as np
import pytest

from pcdet_tpu.utils import box_np_ops, common
from pcdet_tpu.utils.box_coder import ResidualCoder
from pcdet_tpu.utils.edict import EDict


def test_edict():
    d = EDict({'a': {'b': 1}, 'c': [{'d': 2}]})
    assert d.a.b == 1
    assert d.c[0].d == 2
    d.x = {'y': 3}
    assert d.x.y == 3
    import copy
    d2 = copy.deepcopy(d)
    d2.a.b = 9
    assert d.a.b == 1


def test_limit_period():
    vals = np.array([0.0, np.pi, -np.pi, 3 * np.pi, 0.1, -0.1, 7.0])
    out = common.limit_period(vals, offset=0.5, period=2 * np.pi)
    assert np.all(out >= -np.pi) and np.all(out < np.pi)
    # exact identity inside the window
    np.testing.assert_allclose(common.limit_period(np.array([0.3]), 0.5, 2 * np.pi),
                               [0.3], atol=1e-12)

    import jax.numpy as jnp
    from pcdet_tpu.utils import jnp_common
    out_j = jnp_common.limit_period(jnp.asarray(vals, jnp.float32), 0.5, 2 * np.pi)
    np.testing.assert_allclose(np.asarray(out_j), out, rtol=1e-5, atol=1e-5)


def test_rotate_pc_along_z_convention():
    # rotating the +x unit vector by +pi/2 under the reference's row-vector
    # convention pc @ [[c,-s],[s,c]] gives (0, -1)
    pc = np.array([[1.0, 0.0, 0.0]])
    out = common.rotate_pc_along_z(pc.copy(), np.pi / 2)
    np.testing.assert_allclose(out[0, :2], [0.0, -1.0], atol=1e-7)


def test_corners3d_unrotated():
    boxes = np.array([[10.0, 5.0, -1.0, 2.0, 4.0, 1.5, 0.0]])
    corners = box_np_ops.boxes3d_to_corners3d_lidar(boxes)
    assert corners.shape == (1, 8, 3)
    # x extent = w, y extent = l, z from bottom
    assert np.isclose(corners[0, :, 0].max() - corners[0, :, 0].min(), 2.0)
    assert np.isclose(corners[0, :, 1].max() - corners[0, :, 1].min(), 4.0)
    assert np.isclose(corners[0, :, 2].min(), -1.0)
    assert np.isclose(corners[0, :, 2].max(), 0.5)
    assert np.allclose(corners[0, :, :2].mean(axis=0), [10.0, 5.0])


def test_corners3d_rotation_invariants():
    rng = np.random.RandomState(0)
    boxes = np.concatenate([
        rng.uniform(-20, 20, (16, 3)),
        rng.uniform(1, 5, (16, 3)),
        rng.uniform(-np.pi, np.pi, (16, 1)),
    ], axis=1).astype(np.float32)
    corners = box_np_ops.boxes3d_to_corners3d_lidar(boxes)
    # centroid xy = box center; diagonal lengths preserved
    np.testing.assert_allclose(corners[:, :, :2].mean(axis=1), boxes[:, :2],
                               atol=1e-4)
    d = np.linalg.norm(corners[:, 0, :2] - corners[:, 2, :2], axis=1)
    np.testing.assert_allclose(d, np.hypot(boxes[:, 3], boxes[:, 4]), rtol=1e-4)

    from pcdet_tpu.utils import jnp_common
    import jax.numpy as jnp
    corners_j = np.asarray(jnp_common.boxes3d_to_corners3d_lidar(jnp.asarray(boxes)))
    np.testing.assert_allclose(corners_j, corners, atol=1e-3)


def test_points_in_boxes_mask():
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 2.0, np.pi / 2]])
    # box rotated 90deg: w(x-extent)=2 now along y, l=4 along x
    pts = np.array([
        [1.9, 0.0, 1.0],   # inside (|x| <= l/2 after rotation)
        [0.0, 0.9, 1.0],   # inside
        [0.0, 1.5, 1.0],   # outside (y beyond w/2)
        [0.0, 0.0, 2.5],   # outside (above)
        [0.0, 0.0, -0.1],  # outside (below bottom)
    ])
    mask = box_np_ops.points_in_boxes_mask(pts, boxes)
    assert mask.shape == (1, 5)
    np.testing.assert_array_equal(mask[0], [True, True, False, False, False])

    import jax.numpy as jnp
    from pcdet_tpu.utils import jnp_common
    mask_j = np.asarray(jnp_common.points_in_boxes(
        jnp.asarray(pts, jnp.float32), jnp.asarray(boxes, jnp.float32)))
    np.testing.assert_array_equal(mask_j, mask)


def test_mask_boxes_outside_range():
    boxes = np.array([
        [10.0, 0.0, -1.0, 2.0, 4.0, 1.5, 0.3],     # inside
        [69.0, 0.0, -1.0, 4.0, 4.0, 1.5, 0.0],     # corner crosses x=70.4? no: 69+2=71 -> out
    ])
    mask = box_np_ops.mask_boxes_outside_range(boxes, [0, -40, -3, 70.4, 40, 3])
    np.testing.assert_array_equal(mask, [True, False])


def test_nearest_iou_similarity_identity():
    boxes = np.array([[0.0, 0.0, 2.0, 4.0, 0.0],
                      [0.0, 0.0, 2.0, 4.0, np.pi / 2]])
    sim = box_np_ops.nearest_iou_similarity(boxes, boxes)
    assert np.isclose(sim[0, 0], 1.0)
    # the pi/2-rotated twin maps to the swapped-extent axis-aligned box
    expect = (2 * 2) / (2 * 4 + 2 * 4 - 2 * 2)
    assert np.isclose(sim[0, 1], expect)


def test_residual_coder_roundtrip_np():
    rng = np.random.RandomState(1)
    coder = ResidualCoder()
    anchors = np.concatenate([
        rng.uniform(-10, 10, (32, 3)),
        rng.uniform(1, 4, (32, 3)),
        rng.uniform(-np.pi, np.pi, (32, 1)),
    ], axis=1).astype(np.float64)
    boxes = anchors + rng.uniform(-0.3, 0.3, anchors.shape)
    enc = coder.encode_np(boxes, anchors)
    dec = coder.decode_np(enc, anchors)
    np.testing.assert_allclose(dec, boxes, rtol=1e-6, atol=1e-6)


def test_residual_coder_golden():
    # hand-computed golden value
    anchor = np.array([[0.0, 0.0, -1.78, 1.6, 3.9, 1.56, 0.0]])
    box = np.array([[1.0, 2.0, -1.0, 1.8, 4.2, 1.7, 0.5]])
    enc = ResidualCoder.encode_np(box, anchor)
    diag = np.sqrt(1.6 ** 2 + 3.9 ** 2)
    expect = [1.0 / diag, 2.0 / diag,
              ((-1.0 + 1.7 / 2) - (-1.78 + 1.56 / 2)) / 1.56,
              np.log(1.8 / 1.6), np.log(4.2 / 3.9), np.log(1.7 / 1.56), 0.5]
    np.testing.assert_allclose(enc[0], expect, rtol=1e-6)


def test_residual_coder_jnp_matches_np():
    import jax.numpy as jnp
    rng = np.random.RandomState(2)
    coder = ResidualCoder()
    anchors = np.concatenate([
        rng.uniform(-10, 10, (8, 3)),
        rng.uniform(1, 4, (8, 3)),
        rng.uniform(-1, 1, (8, 1)),
    ], axis=1).astype(np.float32)
    boxes = (anchors + rng.uniform(-0.2, 0.2, anchors.shape)).astype(np.float32)
    enc_np = coder.encode_np(boxes, anchors)
    enc_j = np.asarray(coder.encode_jnp(jnp.asarray(boxes), jnp.asarray(anchors)))
    np.testing.assert_allclose(enc_j, enc_np, rtol=1e-4, atol=1e-5)
    dec_np = coder.decode_np(enc_np, anchors)
    dec_j = np.asarray(coder.decode_jnp(jnp.asarray(enc_np), jnp.asarray(anchors)))
    np.testing.assert_allclose(dec_j, dec_np, rtol=1e-4, atol=1e-4)
