"""Tiny PointPillar config for CPU tests: small grid, few voxels/anchors."""
import numpy as np

from pcdet_tpu.config import get_default_cfg, cfg_preprocess
from pcdet_tpu.utils.edict import EDict


def tiny_pointpillar_cfg(num_class=1):
    cfg = get_default_cfg()
    class_names = ['Car', 'Pedestrian', 'Cyclist'][:num_class]
    anchor_cfgs = [
        {'anchor_range': [0, -16.0, -1.78, 32.0, 16.0, -1.78],
         'sizes': [[1.6, 3.9, 1.56]], 'rotations': [0, 1.57],
         'matched_threshold': 0.6, 'unmatched_threshold': 0.45,
         'class_name': 'Car'},
        {'anchor_range': [0, -16.0, -0.6, 32.0, 16.0, -0.6],
         'sizes': [[0.6, 0.8, 1.73]], 'rotations': [0, 1.57],
         'matched_threshold': 0.5, 'unmatched_threshold': 0.35,
         'class_name': 'Pedestrian'},
        {'anchor_range': [0, -16.0, -0.6, 32.0, 16.0, -0.6],
         'sizes': [[0.6, 1.76, 1.73]], 'rotations': [0, 1.57],
         'matched_threshold': 0.5, 'unmatched_threshold': 0.35,
         'class_name': 'Cyclist'},
    ][:num_class]

    cfg.update(EDict({
        'CLASS_NAMES': class_names,
        'DATA_CONFIG': {
            'DATASET': 'SyntheticDataset',
            'FOV_POINTS_ONLY': False,
            'NUM_POINT_FEATURES': {'total': 4, 'use': 4},
            'POINT_CLOUD_RANGE': [0, -16.0, -3, 32.0, 16.0, 1],
            'MASK_POINTS_BY_RANGE': True,
            'MAX_GT_BOXES': 16,
            'MAX_POINTS': 8192,
            'TRAIN': {'SHUFFLE_POINTS': True, 'MAX_NUMBER_OF_VOXELS': 2000,
                      'INFO_PATH': []},
            'TEST': {'SHUFFLE_POINTS': False, 'MAX_NUMBER_OF_VOXELS': 2000,
                     'INFO_PATH': []},
            'AUGMENTATION': {
                'NOISE_PER_OBJECT': {'ENABLED': False,
                                     'GT_LOC_NOISE_STD': [1.0, 1.0, 0.1],
                                     'GT_ROT_UNIFORM_NOISE': [-0.785, 0.785]},
                'NOISE_GLOBAL_SCENE': {'ENABLED': False,
                                       'GLOBAL_ROT_UNIFORM_NOISE': [-0.785, 0.785],
                                       'GLOBAL_SCALING_UNIFORM_NOISE': [0.95, 1.05]},
                'DB_SAMPLER': {'ENABLED': False, 'USE_ROAD_PLANE': False},
            },
            'VOXEL_GENERATOR': {'MAX_POINTS_PER_VOXEL': 16,
                                'VOXEL_SIZE': [0.5, 0.5, 4]},
            'SYNTHETIC': {'NUM_SAMPLES': 4, 'NUM_OBJECTS': 4},
        },
        'MODEL': {
            'NAME': 'PointPillar',
            'VFE': {'NAME': 'PillarFeatureNetOld2',
                    'ARGS': {'use_norm': True, 'num_filters': [32],
                             'with_distance': False}},
            'RPN': {
                'PARAMS_FIXED': False,
                'BACKBONE': {'NAME': 'PointPillarsScatter', 'ARGS': {}},
                'RPN_HEAD': {
                    'NAME': 'RPNV2',
                    'ARGS': {
                        'use_norm': True, 'concat_input': False,
                        'num_input_features': 32,
                        'layer_nums': [1, 1], 'layer_strides': [2, 2],
                        'num_filters': [32, 64], 'upsample_strides': [1, 2],
                        'num_upsample_filters': [32, 32],
                        'encode_background_as_zeros': True,
                        'use_direction_classifier': True,
                        'num_direction_bins': 2, 'dir_offset': 0.78539,
                        'dir_limit_offset': 0.0,
                        'use_binary_dir_classifier': False,
                    },
                    'TARGET_CONFIG': {
                        'DOWNSAMPLED_FACTOR': 2,
                        'BOX_CODER': 'ResidualCoder',
                        'REGION_SIMILARITY_FN': 'nearest_iou_similarity',
                        'SAMPLE_POS_FRACTION': -1.0,
                        'SAMPLE_SIZE': 512,
                        'ANCHOR_GENERATOR': anchor_cfgs,
                    },
                },
            },
            'RCNN': {'ENABLED': False},
            'LOSSES': {
                'RPN_REG_LOSS': 'smooth-l1',
                'LOSS_WEIGHTS': {'rpn_cls_weight': 1.0, 'rpn_loc_weight': 2.0,
                                 'rpn_dir_weight': 0.2,
                                 'code_weights': [1.0] * 7},
            },
            'TRAIN': {
                'SPLIT': 'train',
                'OPTIMIZATION': {
                    'OPTIMIZER': 'adam_onecycle', 'LR': 0.003,
                    'WEIGHT_DECAY': 0.01, 'MOMENTUM': 0.9,
                    'MOMS': [0.95, 0.85], 'PCT_START': 0.4, 'DIV_FACTOR': 10,
                    'DECAY_STEP_LIST': [35, 45], 'LR_DECAY': 0.1,
                    'LR_CLIP': 0.0000001, 'LR_WARMUP': False,
                    'WARMUP_EPOCH': 1, 'GRAD_NORM_CLIP': 10,
                },
            },
            'TEST': {
                'SPLIT': 'val', 'NMS_TYPE': 'nms_gpu',
                'MULTI_CLASSES_NMS': False, 'NMS_THRESH': 0.01,
                'SCORE_THRESH': 0.1, 'USE_RAW_SCORE': True,
                'NMS_PRE_MAXSIZE_LAST': 512, 'NMS_POST_MAXSIZE_LAST': 64,
                'RECALL_THRESH_LIST': [0.5, 0.7], 'EVAL_METRIC': 'kitti',
                'BOX_FILTER': {'USE_IMAGE_AREA_FILTER': False,
                               'LIMIT_RANGE': [0, -16.0, -3.0, 32.0, 16.0, 3.0]},
            },
        },
    }))
    cfg_preprocess(cfg)
    return cfg


def tiny_second_cfg(num_class=1):
    """Tiny SECOND: 3D voxels (z-resolved), sparse backbone, small grid."""
    cfg = tiny_pointpillar_cfg(num_class)
    cfg.DATA_CONFIG.VOXEL_GENERATOR = EDict({
        'MAX_POINTS_PER_VOXEL': 5,
        'VOXEL_SIZE': [0.25, 0.25, 0.25],   # grid 128 x 128 x 16
    })
    cfg.DATA_CONFIG.TRAIN.MAX_NUMBER_OF_VOXELS = 3000
    cfg.DATA_CONFIG.TEST.MAX_NUMBER_OF_VOXELS = 3000
    cfg.MODEL.NAME = 'second_net'
    cfg.MODEL.VFE = EDict({'NAME': 'MeanVoxelFeatureExtractor', 'ARGS': {}})
    cfg.MODEL.RPN.BACKBONE = EDict({'NAME': 'BackBone8x', 'ARGS': {}})
    cfg.MODEL.RPN.RPN_HEAD.ARGS.update({
        'num_input_features': 256,
        'layer_nums': [1, 1], 'layer_strides': [1, 2],
        'num_filters': [32, 64], 'upsample_strides': [1, 2],
        'num_upsample_filters': [32, 32],
    })
    cfg.MODEL.RPN.RPN_HEAD.TARGET_CONFIG.DOWNSAMPLED_FACTOR = 8
    return cfg


def tiny_parta2_cfg(num_class=1):
    cfg = tiny_second_cfg(num_class)
    cfg.MODEL.NAME = 'PartA2_net'
    cfg.MODEL.RPN.BACKBONE = EDict({
        'NAME': 'UNetV2',
        'SEG_MASK_SCORE_THRESH': 0.3,
        'ARGS': {},
        'TARGET_CONFIG': {
            'GENERATED_ON': 'dataset',
            'GT_EXTEND_WIDTH': 0.2,
            'MEAN_SIZE': {'Car': [1.6, 3.9, 1.56],
                          'Pedestrian': [0.6, 0.8, 1.73],
                          'Cyclist': [0.6, 1.76, 1.73]},
        },
    })
    cfg.MODEL.RCNN = EDict({
        'NAME': 'SpConvRCNN',
        'ENABLED': True,
        'NUM_POINT_FEATURES': 16,
        'ROI_AWARE_POOL_SIZE': 14,
        'SHARED_FC': [64, 128, 128],
        'CLS_FC': [64], 'REG_FC': [64],
        'DP_RATIO': 0.3,
        'TARGET_CONFIG': {
            'BOX_CODER': 'ResidualCoder',
            'ROI_PER_IMAGE': 32, 'FG_RATIO': 0.5, 'HARD_BG_RATIO': 0.8,
            'CLS_SCORE_TYPE': 'roi_iou',
            'CLS_FG_THRESH': 0.75, 'CLS_BG_THRESH': 0.25,
            'CLS_BG_THRESH_LO': 0.1, 'REG_FG_THRESH': 0.55,
        },
    })
    cfg.MODEL.LOSSES.update({
        'RCNN_CLS_LOSS': 'BinaryCrossEntropy',
        'RCNN_REG_LOSS': 'smooth-l1',
        'CORNER_LOSS_REGULARIZATION': True,
    })
    cfg.MODEL.LOSSES.LOSS_WEIGHTS.update({
        'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
        'rcnn_corner_weight': 1.0,
    })
    cfg.MODEL.TRAIN.update({
        'NMS_PRE_MAXSIZE': 256, 'NMS_POST_MAXSIZE': 64,
        'RPN_NMS_THRESH': 0.8, 'RPN_NMS_TYPE': 'nms_gpu',
    })
    cfg.MODEL.TEST.update({
        'NMS_PRE_MAXSIZE': 256, 'NMS_POST_MAXSIZE': 32,
        'RPN_NMS_THRESH': 0.7, 'RPN_NMS_TYPE': 'nms_gpu',
    })
    return cfg
