"""Cross-backend loss check: evaluate the TRAINING loss of a checkpoint on
the current backend (chip by default, PCDET_PLATFORM=cpu for the control).

Round-4 debugging tool: a model that overfits to near-zero loss on chip but
evals poorly on BOTH backends either (a) trained against a wrong chip
forward (loss here will disagree across backends), or (b) trained fine and
the train->eval gap is elsewhere (losses agree).  Prints one JSON line.
"""
import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', str(ROOT / '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
if os.environ.get('PCDET_PLATFORM'):
    os.environ['JAX_PLATFORMS'] = os.environ['PCDET_PLATFORM']

import numpy as np


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--cfg_file', default='tools/cfgs/synthetic_smoke_second.yaml')
    p.add_argument('--ckpt', required=True)
    p.add_argument('--batch_size', type=int, default=2)
    args = p.parse_args()

    import jax
    from pcdet_tpu.config import cfg_from_yaml_file, cfg_preprocess
    from pcdet_tpu.datasets import build_dataset
    from pcdet_tpu.datasets.dataset import collate_batch
    from pcdet_tpu.models.build import build_network
    from pcdet_tpu.train.checkpoint import load_checkpoint
    from pcdet_tpu.train.train_state import make_train_step, create_train_state
    from pcdet_tpu.train.optimization import build_optimizer

    cfg = cfg_from_yaml_file(args.cfg_file)
    cfg_preprocess(cfg)
    ds = build_dataset(cfg, training=True)
    model = build_network(cfg, ds.grid_size)
    if hasattr(model, 'anchor_targets'):
        ds.set_anchor_targets(model.anchor_targets)
    batch_np = collate_batch([ds[i] for i in range(args.batch_size)])
    batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray) and v.dtype != object}

    state = load_checkpoint(args.ckpt)
    variables = {'params': state['params'], 'batch_stats': state['batch_stats']}

    def loss_only(variables, batch):
        out, _ = model.apply(variables, batch, training=True,
                             mutable=['batch_stats'],
                             rngs={'dropout': jax.random.PRNGKey(0),
                                   'sampling': jax.random.PRNGKey(0)})
        return out

    out = jax.jit(loss_only)(variables, batch)
    loss = out['loss'] if isinstance(out, dict) and 'loss' in out else out
    leaves = {k: float(np.asarray(v).ravel().mean())
              for k, v in (loss.items() if isinstance(loss, dict) else
                           {'loss': loss}.items())}
    print(json.dumps({'backend': jax.default_backend(), **leaves}))


if __name__ == '__main__':
    main()
