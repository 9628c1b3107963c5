"""Candidate-window anchor assignment must be bit-identical to the full
(A, M) similarity path (anchors.create_target_np `grid` fast path): anchors
outside the per-GT near-bbox windows have overlap exactly 0 and therefore
identical labels/targets.
"""
import numpy as np

from tiny_config import tiny_pointpillar_cfg


def test_fast_path_equals_full_path():
    from pcdet_tpu.config import cfg_from_yaml_file
    from pcdet_tpu.models.anchors import AnchorHeadTargets

    cfg = cfg_from_yaml_file('tools/cfgs/pointpillar.yaml')
    tc = cfg.MODEL.RPN.RPN_HEAD.TARGET_CONFIG
    at = AnchorHeadTargets(tc, np.array([432, 496, 1]),
                           list(cfg.CLASS_NAMES))
    rng = np.random.RandomState(0)
    for trial in range(6):
        m = rng.randint(1, 50)
        gt = np.zeros((m, 8), np.float32)
        gt[:, 0] = rng.uniform(-5, 75, m)       # incl. out-of-range boxes
        gt[:, 1] = rng.uniform(-45, 45, m)
        gt[:, 2] = -1.0
        gt[:, 3] = rng.uniform(0.4, 2.0, m)
        gt[:, 4] = rng.uniform(0.5, 4.5, m)
        gt[:, 5] = 1.5
        gt[:, 6] = rng.uniform(-np.pi, np.pi, m)
        gt[:, 7] = rng.randint(1, 4, m)

        fast = at.assign(gt)
        for d in at.anchors_dict.values():
            d['grid'] = None                     # force the full path
        slow = at.assign(gt)
        for d in at.anchors_dict.values():
            d.pop('grid', None)
        for k in fast:
            np.testing.assert_array_equal(fast[k], slow[k],
                                          err_msg='%s trial %d' % (k, trial))


def test_empty_gt():
    from pcdet_tpu.config import cfg_from_yaml_file
    from pcdet_tpu.models.anchors import AnchorHeadTargets
    cfg = cfg_from_yaml_file('tools/cfgs/pointpillar.yaml')
    tc = cfg.MODEL.RPN.RPN_HEAD.TARGET_CONFIG
    at = AnchorHeadTargets(tc, np.array([432, 496, 1]),
                           list(cfg.CLASS_NAMES))
    r = at.assign(np.zeros((1, 8), np.float32))
    assert (r['labels'] == 0).all()
    assert r['bbox_outside_weights'].sum() == 0
