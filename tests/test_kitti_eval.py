"""KITTI evaluator tests: native lib vs fallbacks, AP sanity on synthetic annos."""
import numpy as np
import pytest

from pcdet_tpu import native
from pcdet_tpu.datasets.kitti.kitti_eval import eval as kitti_eval


def _make_anno(boxes_cam, names, scores=None, bbox_h=50.0):
    """Minimal anno dict: camera boxes (N, 7)[x,y,z,l,h,w,ry]."""
    n = len(names)
    anno = {
        'name': np.array(names),
        'truncated': np.zeros(n),
        'occluded': np.zeros(n, dtype=np.int64),
        'alpha': np.zeros(n),
        'bbox': np.tile(np.array([[100., 100., 200., 100. + bbox_h]]), (n, 1)),
        'dimensions': boxes_cam[:, 3:6].reshape(-1, 3),
        'location': boxes_cam[:, 0:3].reshape(-1, 3),
        'rotation_y': boxes_cam[:, 6].reshape(-1),
    }
    if scores is not None:
        anno['score'] = np.asarray(scores, dtype=np.float64)
    else:
        anno['score'] = np.zeros(n)
    return anno


def _random_cam_boxes(rng, n):
    return np.concatenate([
        rng.uniform(-20, 20, (n, 1)),    # x
        rng.uniform(0, 3, (n, 1)),       # y (down)
        rng.uniform(5, 60, (n, 1)),      # z (forward)
        rng.uniform(3, 5, (n, 1)),       # l
        rng.uniform(1.4, 1.8, (n, 1)),   # h
        rng.uniform(1.5, 2.0, (n, 1)),   # w
        rng.uniform(-np.pi, np.pi, (n, 1)),
    ], axis=1)


def test_native_lib_builds():
    assert native.get_lib() is not None, 'native kitti_eval lib failed to build'


def test_rotate_iou_native_identity_and_symmetry():
    boxes = np.array([[0., 0., 2., 4., 0.3], [1., 1., 3., 2., -0.5]])
    iou = native.rotate_iou_eval(boxes, boxes, -1)
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(iou, iou.T, atol=1e-9)


def test_rotate_iou_native_matches_jnp():
    import jax.numpy as jnp
    from pcdet_tpu.ops import rotated_iou as ri
    rng = np.random.RandomState(0)
    a = np.concatenate([rng.uniform(-5, 5, (16, 2)),
                        rng.uniform(1, 5, (16, 2)),
                        rng.uniform(-np.pi, np.pi, (16, 1))], axis=1)
    b = np.concatenate([rng.uniform(-5, 5, (12, 2)),
                        rng.uniform(1, 5, (12, 2)),
                        rng.uniform(-np.pi, np.pi, (12, 1))], axis=1)
    got = native.rotate_iou_eval(a, b, -1)
    want = np.asarray(ri.rotate_iou_eval(jnp.asarray(a, jnp.float32),
                                         jnp.asarray(b, jnp.float32), -1))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_compute_statistics_native_matches_python():
    rng = np.random.RandomState(1)
    gt, dt = 6, 10
    overlaps = rng.uniform(0, 1, (dt, gt))
    gt_datas = rng.uniform(0, 300, (gt, 5))
    dt_datas = np.concatenate([rng.uniform(0, 300, (dt, 5)),
                               rng.uniform(0, 1, (dt, 1))], axis=1)
    ignored_gt = rng.choice([-1, 0, 1], gt).astype(np.int64)
    ignored_det = rng.choice([-1, 0, 1], dt).astype(np.int64)
    dc = np.zeros((0, 4))
    for compute_fp in [False, True]:
        got = native.compute_statistics(
            overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc,
            metric=1, min_overlap=0.5, thresh=0.3, compute_fp=compute_fp,
            compute_aos=True)
        want = native._compute_statistics_py(
            overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc,
            metric=1, min_overlap=0.5, thresh=0.3, compute_fp=compute_fp,
            compute_aos=True)
        assert got[:3] == want[:3]
        assert abs(got[3] - want[3]) < 1e-9
        np.testing.assert_allclose(got[4], want[4])


def test_perfect_detections_give_100_ap():
    rng = np.random.RandomState(2)
    gt_annos, dt_annos = [], []
    for i in range(20):
        boxes = _random_cam_boxes(rng, 5)
        names = ['Car'] * 5
        gt_annos.append(_make_anno(boxes, names))
        dt = _make_anno(boxes, names, scores=rng.uniform(0.5, 1.0, 5))
        dt['alpha'] = gt_annos[-1]['alpha'].copy()
        dt_annos.append(dt)
    result, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos,
                                                      ['Car'])
    assert ret['Car_3d_easy'] > 99.9, result
    assert ret['Car_bev_moderate'] > 99.9
    assert ret['Car_image_hard'] > 99.9


def test_missing_detections_reduce_ap():
    rng = np.random.RandomState(3)
    gt_annos, dt_annos = [], []
    for i in range(20):
        boxes = _random_cam_boxes(rng, 4)
        names = ['Car'] * 4
        gt_annos.append(_make_anno(boxes, names))
        # detect only half the objects
        dt = _make_anno(boxes[:2], names[:2], scores=rng.uniform(0.5, 1.0, 2))
        dt_annos.append(dt)
    result, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos,
                                                      ['Car'])
    assert 20.0 < ret['Car_3d_easy'] < 80.0, result


def test_get_thresholds_41pt():
    scores = np.linspace(0, 1, 100)
    th = kitti_eval.get_thresholds(scores.copy(), num_gt=100)
    assert len(th) <= 41
    assert all(th[i] >= th[i + 1] for i in range(len(th) - 1))
