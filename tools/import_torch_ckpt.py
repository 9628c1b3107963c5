"""Convert a reference torch checkpoint (.pth) into a pcdet_tpu checkpoint.

The reference saves {'model_state': state_dict, 'optimizer_state': ...,
'epoch': N} (reference tools/train_utils/train_utils.py:128-143 /
pcdet/models/detectors/detector3d.py:325-351).  This CLI maps the torch
state_dict onto this framework's flax trees (pcdet_tpu/train/torch_import.py)
and writes an epoch-tagged orbax checkpoint that tools/test.py --ckpt and
tools/train.py --pretrained_model consume directly.

Usage:
  python tools/import_torch_ckpt.py --cfg_file tools/cfgs/pointpillar.yaml \
      --torch_ckpt /path/checkpoint_epoch_80.pth --out_dir out_ckpts/

Weights land under <out_dir>/checkpoint_epoch_<N>; optimizer state is NOT
converted (torch Adam moments don't transfer to optax OneCycle) — importing
is for evaluation / fine-tune warm starts.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from pcdet_tpu.config import cfg, cfg_from_yaml_file, cfg_from_list  # noqa: E402
from pcdet_tpu.models.build import build_network  # noqa: E402
from pcdet_tpu.train import torch_import  # noqa: E402


def grid_size_from_cfg(cfg):
    pc = np.asarray(cfg.DATA_CONFIG.POINT_CLOUD_RANGE, np.float64)
    vs = np.asarray(cfg.DATA_CONFIG.VOXEL_GENERATOR.VOXEL_SIZE, np.float64)
    return np.round((pc[3:6] - pc[0:3]) / vs).astype(np.int64)


def load_torch_state_dict(path):
    """Read the .pth with torch (CPU) and hand back numpy arrays."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('model_state', ckpt)       # bare state_dicts also accepted
    np_sd = {k: v.detach().cpu().numpy() for k, v in sd.items()
             if hasattr(v, 'detach')}
    return np_sd, int(ckpt.get('epoch', 0)), ckpt.get('version', '?')


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', required=True)
    parser.add_argument('--torch_ckpt', required=True)
    parser.add_argument('--out_dir', required=True)
    parser.add_argument('--epoch', type=int, default=None,
                        help='override the epoch tag (default: from ckpt)')
    parser.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                        default=None)
    args = parser.parse_args(argv)

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)

    model = build_network(cfg, grid_size_from_cfg(cfg))
    sd, ckpt_epoch, version = load_torch_state_dict(args.torch_ckpt)
    print('==> loaded %d torch tensors (reference version %s)'
          % (len(sd), version))

    variables, unused = torch_import.convert_state_dict(sd, model)
    if unused:
        print('==> %d torch keys not mapped:' % len(unused))
        for k in unused:
            print('    ', k)

    # validate against a fresh init (shapes + tree structure)
    import jax
    template = model.init_variables(jax.random.PRNGKey(0),
                                    _dummy_batch(model, cfg))
    torch_import.validate_against(variables, template)
    print('==> all paths/shapes validated against model init')

    epoch = args.epoch if args.epoch is not None else ckpt_epoch
    import orbax.checkpoint as ocp
    payload = {
        'epoch': epoch,
        'it': 0,
        'model_state': {
            'params': variables['params'],
            'batch_stats': variables['batch_stats'],
        },
        'optimizer_state': {},
        'version': 'imported+%s' % version,
    }
    path = os.path.join(os.path.abspath(args.out_dir),
                        'checkpoint_epoch_%d' % epoch)
    ocp.PyTreeCheckpointer().save(path, payload, force=True)
    print('==> wrote', path)


def _dummy_batch(model, cfg):
    """Tiny fixed-shape batch just to init the param tree."""
    p = int(cfg.DATA_CONFIG.VOXEL_GENERATOR.MAX_POINTS_PER_VOXEL)
    c = int(cfg.DATA_CONFIG.NUM_POINT_FEATURES['use'])
    v = 32
    return {
        'voxels': np.zeros((1, v, p, c), np.float32),
        'num_points': np.ones((1, v), np.int32),
        'coordinates': np.zeros((1, v, 3), np.int32),
        'voxel_mask': np.ones((1, v), bool),
    }


if __name__ == '__main__':
    main()
