"""Measure the overfit-to-AP values the test_train_to_ap bars band around.

Runs the exact fixtures of tests/test_train_to_ap.py (same seeds, steps,
lr) and prints each model's official-AP + recall so the regression bands
can sit at ~2/3 of measured instead of a token floor (VERDICT r4 #7).

Usage: JAX_PLATFORMS=cpu python scripts/measure_overfit_bars.py [model...]
"""
import os
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / 'tests'))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ.setdefault('PCDET_PLATFORM', 'cpu')

import jax

jax.config.update('jax_platforms', 'cpu')


def main():
    import test_train_to_ap as t
    from tiny_config import tiny_second_cfg, tiny_parta2_cfg
    from pcdet_tpu.models.build import build_network

    which = sys.argv[1:] or ['second', 'parta2']
    for name in which:
        if name == 'second':
            cfg = tiny_second_cfg(num_class=1)
            steps, lr, thresh = 500, 3e-3, 0.3
        else:
            cfg = tiny_parta2_cfg(num_class=1)
            steps, lr, thresh = 250, 3e-3, 0.1
        cfg.DATA_CONFIG.SYNTHETIC.NUM_SAMPLES = 4
        cfg.DATA_CONFIG.SYNTHETIC.NUM_OBJECTS = 6
        cfg.MODEL.TEST.SCORE_THRESH = thresh
        with tempfile.TemporaryDirectory() as td:
            result = t._overfit_and_eval(cfg, build_network, steps=steps,
                                         lr=lr, tmp_path=td)
        recall = result['recall/rcnn_0.5'] / max(result['recall/gt'], 1)
        print('%s: Car_3d_easy=%.2f recall0.5=%.3f (steps=%d)'
              % (name, result['Car_3d_easy'], recall, steps), flush=True)


if __name__ == '__main__':
    main()
