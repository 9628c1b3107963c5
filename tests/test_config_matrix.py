"""Every shipped yaml config must parse and construct its model + anchors."""
import glob
import os

import numpy as np
import pytest

CFG_DIR = os.path.join(os.path.dirname(__file__), '..', 'tools', 'cfgs')
CFGS = sorted(
    p for p in glob.glob(os.path.join(CFG_DIR, '**', '*.yaml'), recursive=True)
    if not p.endswith('docs.yaml'))


@pytest.mark.parametrize('cfg_file', CFGS, ids=lambda p: os.path.relpath(
    p, CFG_DIR))
def test_config_builds_model(cfg_file):
    from pcdet_tpu.config import cfg_from_yaml_file
    from pcdet_tpu.models.build import build_network
    from pcdet_tpu.ops.voxelizer import VoxelGenerator

    cfg = cfg_from_yaml_file(cfg_file)
    vg = VoxelGenerator(cfg.DATA_CONFIG.VOXEL_GENERATOR.VOXEL_SIZE,
                        cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
                        cfg.DATA_CONFIG.VOXEL_GENERATOR.MAX_POINTS_PER_VOXEL,
                        cfg.DATA_CONFIG.TRAIN.MAX_NUMBER_OF_VOXELS)
    model = build_network(cfg, vg.grid_size)
    assert model.anchor_targets.num_anchors > 0
    assert model.module is not None
    # anchor grid must tile the configured feature map exactly
    df = cfg.MODEL.RPN.RPN_HEAD.TARGET_CONFIG.get('DOWNSAMPLED_FACTOR', 8)
    fm = (np.asarray(vg.grid_size[:2]) // df)
    per_loc = model.anchor_targets.num_anchors_per_location
    assert model.anchor_targets.num_anchors == fm[0] * fm[1] * per_loc


def test_cfg_set_override_grammar():
    from pcdet_tpu.config import cfg_from_yaml_file, cfg_from_list
    cfg = cfg_from_yaml_file(os.path.join(CFG_DIR, 'pointpillar.yaml'))
    cfg_from_list(['MODEL.TEST.SCORE_THRESH', '0.5',
                   'DATA_CONFIG.TRAIN.MAX_NUMBER_OF_VOXELS', '12000',
                   'CLASS_NAMES', 'Car,Pedestrian'], cfg)
    assert cfg.MODEL.TEST.SCORE_THRESH == 0.5
    assert cfg.DATA_CONFIG.TRAIN.MAX_NUMBER_OF_VOXELS == 12000
    assert cfg.CLASS_NAMES == ['Car', 'Pedestrian']
    with pytest.raises(AssertionError):
        cfg_from_list(['MODEL.NO_SUCH_KEY', '1'], cfg)
