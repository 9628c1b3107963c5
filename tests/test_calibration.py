"""Calibration: numpy transforms roundtrip + differentiable jnp twin parity
(mirrors the reference's calibration.py __main__ closeness asserts)."""
import numpy as np
import pytest

from pcdet_tpu.utils.calibration import Calibration, CalibrationJnp

CALIB = {
    'P2': np.array([[720., 0., 610., 45.], [0., 720., 172., -0.3],
                    [0., 0., 1., 0.005]], dtype=np.float32),
    'R0': np.array([[0.9999, 0.01, -0.008], [-0.0101, 0.9999, -0.006],
                    [0.0079, 0.0061, 0.9999]], dtype=np.float32),
    'Tr_velo2cam': np.array([[0.007, -1.0, -0.002, -0.004],
                             [0.01, 0.002, -1.0, -0.07],
                             [1.0, 0.007, 0.01, -0.27]], dtype=np.float32),
}


@pytest.fixture(scope='module')
def calib():
    return Calibration(dict(CALIB))


def test_lidar_rect_roundtrip(calib):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-30, 30, (100, 3)).astype(np.float32)
    rect = calib.lidar_to_rect(pts)
    back = calib.rect_to_lidar(rect)
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_img_projection_consistency(calib):
    rng = np.random.RandomState(1)
    pts_rect = np.stack([rng.uniform(-10, 10, 50), rng.uniform(-2, 2, 50),
                         rng.uniform(5, 60, 50)], axis=1).astype(np.float32)
    img, depth = calib.rect_to_img(pts_rect)
    # recover rect points from pixels + depth
    rec = calib.img_to_rect(img[:, 0], img[:, 1], depth)
    np.testing.assert_allclose(rec, pts_rect, atol=1e-2)


def test_jnp_twin_matches_numpy(calib):
    import jax
    import jax.numpy as jnp
    cj = CalibrationJnp(calib)
    rng = np.random.RandomState(2)
    pts = rng.uniform(-30, 30, (64, 3)).astype(np.float32)

    np.testing.assert_allclose(np.asarray(cj.lidar_to_rect(jnp.asarray(pts))),
                               calib.lidar_to_rect(pts), atol=1e-4)
    rect = calib.lidar_to_rect(pts)
    np.testing.assert_allclose(np.asarray(cj.rect_to_lidar(jnp.asarray(rect))),
                               calib.rect_to_lidar(rect), atol=1e-3)
    img_j, d_j = cj.rect_to_img(jnp.asarray(rect))
    img_n, d_n = calib.rect_to_img(rect)
    np.testing.assert_allclose(np.asarray(img_j), img_n, atol=1e-2)
    np.testing.assert_allclose(np.asarray(d_j), d_n, atol=1e-4)

    # differentiability: grads flow through the depth -> lidar lift
    def depth_to_x(depth):
        p = cj.img_to_rect(jnp.asarray([600.0]), jnp.asarray([180.0]), depth)
        return cj.rect_to_lidar(p)[0, 0]

    g = jax.grad(lambda d: depth_to_x(jnp.asarray([d]).reshape(1)))(20.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0.1
