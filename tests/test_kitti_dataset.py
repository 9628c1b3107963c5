"""KITTI dataset layer end-to-end on a fabricated mini-KITTI tree."""
import os
import pickle

import numpy as np
import pytest

from tiny_config import tiny_pointpillar_cfg

# identity-ish calibration: camera at lidar origin, x_cam = -y_l, y_cam = -z_l,
# z_cam = x_l  (the standard KITTI velodyne->camera axis permutation)
V2C = np.array([[0., -1., 0., 0.],
                [0., 0., -1., 0.],
                [1., 0., 0., 0.]], dtype=np.float32)
P2 = np.array([[700., 0., 600., 0.],
               [0., 700., 180., 0.],
               [0., 0., 1., 0.]], dtype=np.float32)
R0 = np.eye(3, dtype=np.float32)


def _write_calib(path):
    lines = [
        'P0: ' + ' '.join(['0'] * 12),
        'P1: ' + ' '.join(['0'] * 12),
        'P2: ' + ' '.join('%.6f' % v for v in P2.reshape(-1)),
        'P3: ' + ' '.join('%.6f' % v for v in P2.reshape(-1)),
        'R0_rect: ' + ' '.join('%.6f' % v for v in R0.reshape(-1)),
        'Tr_velo_to_cam: ' + ' '.join('%.6f' % v for v in V2C.reshape(-1)),
        'Tr_imu_to_velo: ' + ' '.join(['0'] * 12),
    ]
    with open(path, 'w') as f:
        f.write('\n'.join(lines) + '\n')


def _make_kitti_tree(root, n_frames=3, seed=0):
    from pcdet_tpu.utils.calibration import Calibration
    from pcdet_tpu.utils import box_np_ops
    from PIL import Image

    for sub in ['velodyne', 'image_2', 'calib', 'label_2', 'planes']:
        os.makedirs(os.path.join(root, 'training', sub), exist_ok=True)
    os.makedirs(os.path.join(root, 'ImageSets'), exist_ok=True)

    ids = ['%06d' % i for i in range(n_frames)]
    with open(os.path.join(root, 'ImageSets', 'train.txt'), 'w') as f:
        f.write('\n'.join(ids[:2]) + '\n')
    with open(os.path.join(root, 'ImageSets', 'val.txt'), 'w') as f:
        f.write(ids[2] + '\n')

    rng = np.random.RandomState(seed)
    calib_path = os.path.join(root, 'training', 'calib')
    for i, sid in enumerate(ids):
        _write_calib(os.path.join(calib_path, sid + '.txt'))
        calib = Calibration(os.path.join(calib_path, sid + '.txt'))

        # one car per frame in front of the sensor
        x, y = 15.0 + 3 * i, (-2.0 + i)
        w, l, h, ry_lidar = 1.7, 4.0, 1.5, 0.3
        box_lidar = np.array([[x, y, -1.0, w, l, h, ry_lidar]],
                             dtype=np.float32)

        # points: cluster in the box + ground
        n_obj = 400
        local = np.stack([rng.uniform(-w / 2, w / 2, n_obj),
                          rng.uniform(-l / 2, l / 2, n_obj),
                          rng.uniform(0, h, n_obj)], axis=1)
        c, s = np.cos(ry_lidar), np.sin(ry_lidar)
        gx = local[:, 0] * c + local[:, 1] * s + x
        gy = -local[:, 0] * s + local[:, 1] * c + y
        gz = local[:, 2] - 1.0
        ground = np.stack([rng.uniform(3, 40, 2000),
                           rng.uniform(-12, 12, 2000),
                           rng.normal(-1.7, 0.05, 2000)], axis=1)
        pts = np.concatenate([np.stack([gx, gy, gz], 1), ground], 0)
        refl = rng.uniform(0, 1, len(pts))[:, None]
        pts4 = np.concatenate([pts, refl], 1).astype(np.float32)
        pts4.tofile(os.path.join(root, 'training', 'velodyne', sid + '.bin'))

        Image.new('RGB', (1242, 375)).save(
            os.path.join(root, 'training', 'image_2', sid + '.png'))

        # label in camera frame
        box_cam = box_np_ops.boxes3d_lidar_to_camera(box_lidar, calib)[0]
        xc, yc, zc, lc, hc, wc, ry = box_cam
        bbox_img = box_np_ops.boxes3d_camera_to_imageboxes(
            box_cam[None], calib, image_shape=np.array([375, 1242]))[0]
        with open(os.path.join(root, 'training', 'label_2', sid + '.txt'),
                  'w') as f:
            f.write('Car 0.00 0 %.2f %.2f %.2f %.2f %.2f '
                    '%.2f %.2f %.2f %.2f %.2f %.2f %.2f\n'
                    % (ry, bbox_img[0], bbox_img[1], bbox_img[2], bbox_img[3],
                       hc, wc, lc, xc, yc, zc, ry))
        with open(os.path.join(root, 'training', 'planes', sid + '.txt'),
                  'w') as f:
            f.write('# plane\nWidth 4\nHeight 1\n0 -1 0 1.7\n')
    return ids


@pytest.fixture(scope='module')
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('kitti'))
    ids = _make_kitti_tree(root)
    return root, ids


def _kitti_cfg(root):
    cfg = tiny_pointpillar_cfg(num_class=3)
    cfg.ROOT_DIR = '/'
    cfg.DATA_CONFIG.DATASET = 'KittiDataset'
    cfg.DATA_CONFIG.DATA_DIR = root.lstrip('/')
    cfg.DATA_CONFIG.FOV_POINTS_ONLY = True
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [0, -39.68, -3, 69.12, 39.68, 1]
    cfg.DATA_CONFIG.VOXEL_GENERATOR.VOXEL_SIZE = [0.16, 0.16, 4]
    cfg.DATA_CONFIG.TRAIN.INFO_PATH = [
        os.path.join(root, 'kitti_infos_train.pkl').lstrip('/')]
    cfg.DATA_CONFIG.TEST.INFO_PATH = [
        os.path.join(root, 'kitti_infos_val.pkl').lstrip('/')]
    cfg.DATA_CONFIG.AUGMENTATION.DB_SAMPLER.ENABLED = True
    cfg.DATA_CONFIG.AUGMENTATION.DB_SAMPLER.DB_INFO_PATH = [
        os.path.join(root, 'kitti_dbinfos_train.pkl').lstrip('/')]
    cfg.DATA_CONFIG.AUGMENTATION.DB_SAMPLER.PREPARE = {
        'filter_by_difficulty': [-1],
        'filter_by_min_points': ['Car:5'],
    }
    cfg.DATA_CONFIG.AUGMENTATION.DB_SAMPLER.RATE = 1.0
    cfg.DATA_CONFIG.AUGMENTATION.DB_SAMPLER.SAMPLE_GROUPS = ['Car:3']
    cfg.DATA_CONFIG.AUGMENTATION.DB_SAMPLER.USE_ROAD_PLANE = True
    cfg.DATA_CONFIG.AUGMENTATION.NOISE_PER_OBJECT.ENABLED = True
    cfg.DATA_CONFIG.AUGMENTATION.NOISE_GLOBAL_SCENE.ENABLED = True
    cfg.MODEL.TRAIN.SPLIT = 'train'
    cfg.MODEL.TEST.SPLIT = 'val'
    return cfg


def test_create_infos_and_gt_db(kitti_root):
    root, ids = kitti_root
    from pcdet_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    cfg = _kitti_cfg(root)
    create_kitti_infos(cfg, data_path=root, save_path=root, workers=2)
    with open(os.path.join(root, 'kitti_infos_train.pkl'), 'rb') as f:
        infos = pickle.load(f)
    assert len(infos) == 2
    anno = infos[0]['annos']
    assert anno['name'][0] == 'Car'
    assert anno['gt_boxes_lidar'].shape == (1, 7)
    # lidar box reconstructed from the camera label must match the original
    np.testing.assert_allclose(anno['gt_boxes_lidar'][0][:3], [15.0, -2.0, -1.0],
                               atol=0.05)
    assert anno['num_points_in_gt'][0] > 300
    with open(os.path.join(root, 'kitti_dbinfos_train.pkl'), 'rb') as f:
        db = pickle.load(f)
    assert 'Car' in db and len(db['Car']) == 2


def test_getitem_and_eval_roundtrip(kitti_root):
    root, ids = kitti_root
    cfg = _kitti_cfg(root)
    from pcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from pcdet_tpu.datasets.dataset import collate_batch
    from pcdet_tpu.models.anchors import AnchorHeadTargets

    train_ds = KittiDataset(cfg, training=True)
    at = AnchorHeadTargets(cfg.MODEL.RPN.RPN_HEAD.TARGET_CONFIG,
                           train_ds.grid_size, cfg.CLASS_NAMES)
    train_ds.set_anchor_targets(at)
    ex = train_ds[0]
    assert ex['voxels'].shape[0] == 2000
    assert (ex['box_cls_labels'] > 0).sum() > 0, 'no positive anchors'

    # eval path: perfect predictions from GT must give ~100 AP
    val_ds = KittiDataset(cfg, training=False)
    batch = collate_batch([val_ds[0]])
    info = val_ds.kitti_infos[0]
    gt = info['annos']['gt_boxes_lidar']
    preds = {
        'boxes': np.tile(gt[None], (1, 1, 1)).astype(np.float32),
        'scores': np.full((1, 1), 0.9, np.float32),
        'labels': np.ones((1, 1), np.int32),
        'valid': np.ones((1, 1), bool),
    }
    annos = val_ds.generate_annotations(batch, preds, cfg.CLASS_NAMES)
    assert annos[0]['name'][0] == 'Car'
    result_str, result = val_ds.evaluation(annos, cfg.CLASS_NAMES)
    # 1 GT + 1 perfect detection: the 41-pt curve has a single recall sample,
    # so 11-pt AP is exactly 100/11 (KITTI semantics); all metrics agree.
    assert result['Car_3d_easy'] == pytest.approx(100 / 11, abs=0.01), result_str
    assert result['Car_bev_easy'] == pytest.approx(result['Car_3d_easy'], abs=1e-6)
    assert result['Car_image_easy'] == pytest.approx(result['Car_3d_easy'], abs=1e-6)
