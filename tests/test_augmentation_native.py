"""Native C++ noise_per_box vs the pure-numpy twin (same semantics)."""
import numpy as np
import pytest


def _random_scene(rng, n=12):
    # well-separated boxes so float32-vs-float64 rounding at exact-touch
    # boundaries cannot flip a collision verdict
    xs = rng.uniform(0, 60, n)
    ys = rng.uniform(-25, 25, n)
    boxes = np.stack([
        xs, ys, rng.uniform(1.5, 4.0, n), rng.uniform(1.5, 4.0, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)
    return boxes


def test_native_matches_numpy_selected():
    from pcdet_tpu import native
    from pcdet_tpu.datasets.augmentation.augmentation_utils import (
        _noise_per_box_numpy)

    if native.get_lib() is None:
        pytest.skip('native library unavailable (no compiler)')

    rng = np.random.RandomState(0)
    for trial in range(5):
        boxes = _random_scene(rng)
        n = boxes.shape[0]
        valid = rng.rand(n) > 0.2
        loc = rng.normal(scale=1.0, size=(n, 20, 3)).astype(np.float32)
        rot = rng.uniform(-0.8, 0.8, size=(n, 20)).astype(np.float32)
        sel_native = native.noise_per_box(boxes, valid, loc, rot)
        sel_numpy = _noise_per_box_numpy(boxes.copy(), valid, loc, rot)
        np.testing.assert_array_equal(sel_native, sel_numpy,
                                      err_msg=f'trial {trial}')


def test_noise_per_object_end_to_end():
    """noise_per_object_v3_ still perturbs boxes and keeps points finite."""
    from pcdet_tpu.datasets.augmentation.augmentation_utils import (
        noise_per_object_v3_)
    rng = np.random.RandomState(1)
    boxes = np.concatenate([
        _random_scene(rng, 8)[:, :2],
        rng.uniform(-1.5, -0.5, (8, 1)).astype(np.float32),  # z
        rng.uniform(1.5, 4.0, (8, 3)).astype(np.float32),    # dx dy dz
        rng.uniform(-np.pi, np.pi, (8, 1)).astype(np.float32)], axis=1)
    points = rng.uniform(-5, 65, (2000, 4)).astype(np.float32)
    out_boxes, out_points = noise_per_object_v3_(
        boxes.copy(), points.copy(), num_try=20)
    assert np.isfinite(out_boxes).all()
    assert np.isfinite(out_points).all()
    assert not np.allclose(out_boxes, boxes)  # something moved
