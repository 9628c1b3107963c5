"""Eval CLI: evaluate one checkpoint, or watch a ckpt dir and eval all.

Same CLI surface as reference tools/test.py (--cfg_file, --ckpt, --eval_all,
--ckpt_dir, --max_waiting_mins, --start_epoch, --set).
"""
import argparse
import datetime
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pcdet_tpu.utils.platform import apply_platform_env
apply_platform_env()


def parse_config():
    parser = argparse.ArgumentParser(description='pcdet_tpu evaluator')
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=4)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--worker_mode', choices=['thread', 'process'],
                        default='thread')
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--eval_all', action='store_true', default=False)
    parser.add_argument('--ckpt_dir', type=str, default=None)
    parser.add_argument('--max_waiting_mins', type=int, default=30)
    parser.add_argument('--start_epoch', type=int, default=0)
    parser.add_argument('--save_to_file', action='store_true', default=False)
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from pcdet_tpu.config import (cfg, cfg_from_yaml_file, cfg_from_list,
                                  cfg_preprocess)
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
        cfg_preprocess(cfg)    # re-derive TORCH_VOXEL_GENERATOR after --set
    return args, cfg


def _epoch_from_path(path):
    nums = re.findall(r'checkpoint_epoch_(\d+)', str(path))
    return int(nums[-1]) if nums else 'no_number'


def eval_single_ckpt(model, variables, dataloader, args, cfg, eval_dir,
                     logger, epoch_id):
    from pcdet_tpu.train.eval_loop import eval_one_epoch
    return eval_one_epoch(
        model, variables['params'], variables['batch_stats'], dataloader, cfg,
        result_dir=str(eval_dir), logger=logger,
        save_to_file=args.save_to_file, epoch_id=epoch_id)


def main():
    args, cfg = parse_config()

    import jax
    from pcdet_tpu.datasets import build_dataloader
    from pcdet_tpu.models.build import build_network
    from pcdet_tpu.train.checkpoint import (list_checkpoints,
                                            load_params_partial)
    from pcdet_tpu.utils import common

    root_dir = Path(cfg.ROOT_DIR)
    output_dir = root_dir / 'output' / cfg.TAG / args.extra_tag
    eval_root = output_dir / 'eval'
    eval_root.mkdir(parents=True, exist_ok=True)
    log_file = eval_root / ('log_eval_%s.txt'
                            % datetime.datetime.now().strftime('%Y%m%d-%H%M%S'))
    logger = common.create_logger(str(log_file), rank=0)

    dataset, dataloader = build_dataloader(
        cfg, args.batch_size, training=False, logger=logger,
        num_workers=args.workers, worker_mode=args.worker_mode)
    model = build_network(cfg, dataset.grid_size)
    # host-built sparse rulebooks in the loader workers (overlapped with
    # the device step; PCDET_HOST_BOOKS=0 to disable)
    from pcdet_tpu.ops import host_books
    dataloader.batch_transform = host_books.make_batch_transform(
        model, training=False)

    from pcdet_tpu.datasets.dataset import collate_batch
    example = collate_batch([dataset[i % len(dataset)]
                             for i in range(args.batch_size)])
    example_dev = {k: jax.numpy.asarray(v) for k, v in example.items()
                   if isinstance(v, np.ndarray) and v.dtype.kind in 'biufc'}
    variables = model.init_variables(jax.random.PRNGKey(0), example_dev)

    if not args.eval_all:
        assert args.ckpt is not None, 'provide --ckpt or --eval_all'
        epoch_id = _epoch_from_path(args.ckpt)
        variables, _, _ = load_params_partial(args.ckpt, variables, logger)
        eval_dir = eval_root / ('epoch_%s' % epoch_id) / cfg.MODEL.TEST.SPLIT
        eval_dir.mkdir(parents=True, exist_ok=True)
        eval_single_ckpt(model, variables, dataloader, args, cfg, eval_dir,
                         logger, epoch_id)
        return

    # ---- eval-all watcher (reference repeat_eval_ckpt:82-131)
    ckpt_dir = Path(args.ckpt_dir or (output_dir / 'ckpt'))
    record_file = eval_root / ('eval_list_%s.txt' % cfg.MODEL.TEST.SPLIT)
    evaluated = set()
    if record_file.exists():
        evaluated = set(record_file.read_text().split())
    wait_seconds = 0
    tb_log = None
    try:
        from tensorboardX import SummaryWriter
        tb_log = SummaryWriter(log_dir=str(eval_root / 'tensorboard'))
    except ImportError:
        pass
    while True:
        todo = [c for c in list_checkpoints(str(ckpt_dir))
                if str(_epoch_from_path(c)) not in evaluated
                and isinstance(_epoch_from_path(c), int)
                and _epoch_from_path(c) >= args.start_epoch]
        if not todo:
            if wait_seconds > args.max_waiting_mins * 60:
                break
            time.sleep(30)
            wait_seconds += 30
            continue
        wait_seconds = 0
        for ckpt in todo:
            epoch_id = _epoch_from_path(ckpt)
            variables, _, _ = load_params_partial(ckpt, variables, logger)
            eval_dir = eval_root / ('epoch_%s' % epoch_id) / cfg.MODEL.TEST.SPLIT
            eval_dir.mkdir(parents=True, exist_ok=True)
            result = eval_single_ckpt(model, variables, dataloader, args, cfg,
                                      eval_dir, logger, epoch_id)
            if tb_log is not None:
                for k, v in result.items():
                    if isinstance(v, (int, float)):
                        tb_log.add_scalar(k, v, int(epoch_id))
            evaluated.add(str(epoch_id))
            with open(record_file, 'a') as f:
                f.write('%s\n' % epoch_id)


if __name__ == '__main__':
    main()
