"""Train CLI.

Same argparse surface as the reference tools/train.py (--cfg_file,
--batch_size, --epochs, --extra_tag, --ckpt, --pretrained_model, --set, ...),
same output layout output/<TAG>/<extra_tag>/{ckpt,tensorboard,log_*.txt}.
Distribution: one process per host over a jax data mesh (no --launcher
zoo; multi-host via jax.distributed.initialize when JAX coordinator env is
set).
"""
import argparse
import datetime
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pcdet_tpu.utils.platform import apply_platform_env
apply_platform_env()


def parse_config():
    parser = argparse.ArgumentParser(description='pcdet_tpu trainer')
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=4,
                        help='global batch size (split over devices)')
    parser.add_argument('--epochs', type=int, default=80)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--worker_mode', choices=['thread', 'process'],
                        default='thread',
                        help='process = fork pool; scales past the GIL on '
                             'many-core TPU hosts (batches are bit-identical '
                             'across modes)')
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--pretrained_model', type=str, default=None)
    parser.add_argument('--ckpt_save_interval', type=int, default=2)
    parser.add_argument('--max_ckpt_save_num', type=int, default=30)
    parser.add_argument('--fix_random_seed', action='store_true', default=False)
    parser.add_argument('--sync_bn', action='store_true', default=False,
                        help='BatchNorm stats over the global batch '
                             '(reference --sync_bn; default matches the '
                             'reference: per-device statistics)')
    parser.add_argument('--multi_host', action='store_true', default=False,
                        help='call jax.distributed.initialize() first')
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER,
                        help='set extra config keys')
    args = parser.parse_args()

    from pcdet_tpu.config import (cfg, cfg_from_yaml_file, cfg_from_list,
                                  cfg_preprocess)
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
        cfg_preprocess(cfg)    # re-derive TORCH_VOXEL_GENERATOR after --set
    return args, cfg


def main():
    args, cfg = parse_config()

    import jax
    if args.multi_host:
        jax.distributed.initialize()

    if not args.sync_bn:
        # reference default: per-GPU BatchNorm statistics (tools/train.py:94)
        from pcdet_tpu.models import layers as layer_lib
        layer_lib.set_bn_groups(jax.device_count())

    from pcdet_tpu.config import log_config_to_file
    from pcdet_tpu.datasets import build_dataloader
    from pcdet_tpu.models.build import build_network
    from pcdet_tpu.parallel import mesh as mesh_lib
    from pcdet_tpu.train.checkpoint import (latest_checkpoint,
                                            load_params_partial,
                                            restore_train_state)
    from pcdet_tpu.train.optimization import build_optimizer_and_schedule
    from pcdet_tpu.train.train_loop import train_model
    from pcdet_tpu.train.train_state import create_train_state
    from pcdet_tpu.utils import common

    if args.fix_random_seed:
        common.set_random_seed(666)

    root_dir = Path(cfg.ROOT_DIR)
    output_dir = root_dir / 'output' / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / 'ckpt'
    output_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    host_id = jax.process_index()
    num_hosts = jax.process_count()
    log_file = output_dir / ('log_train_%s.txt'
                             % datetime.datetime.now().strftime('%Y%m%d-%H%M%S'))
    logger = common.create_logger(str(log_file), rank=host_id)
    logger.info('**********************Start logging**********************')
    for key, val in vars(args).items():
        logger.info('{:16} {}'.format(key, val))
    log_config_to_file(cfg, logger=logger)

    n_devices = jax.device_count()
    assert args.batch_size % n_devices == 0, \
        'batch_size %d must divide over %d devices' % (args.batch_size, n_devices)
    per_host_batch = args.batch_size // num_hosts

    dataset, train_loader = build_dataloader(
        cfg, per_host_batch, training=True, logger=logger,
        num_workers=args.workers, host_id=host_id, num_hosts=num_hosts,
        seed=666 if args.fix_random_seed else 0,
        worker_mode=args.worker_mode)

    model = build_network(cfg, dataset.grid_size)
    if hasattr(model, 'anchor_targets'):
        dataset.set_anchor_targets(model.anchor_targets)
    # host-built sparse rulebooks in the loader workers (overlapped with
    # the device step; PCDET_HOST_BOOKS=0 to disable)
    from pcdet_tpu.ops import host_books
    train_loader.batch_transform = host_books.make_batch_transform(
        model, training=True)

    # init from one example batch
    from pcdet_tpu.datasets.dataset import collate_batch
    example = collate_batch([dataset[i % len(dataset)]
                             for i in range(args.batch_size)])
    example_dev = {k: jax.numpy.asarray(v) for k, v in example.items()
                   if isinstance(v, np.ndarray) and v.dtype.kind in 'biufc'}
    variables = model.init_variables(jax.random.PRNGKey(0), example_dev)

    if args.pretrained_model is not None:
        variables, _, _ = load_params_partial(args.pretrained_model, variables,
                                              logger=logger)

    iters_each_epoch = max(len(train_loader), 1)
    from pcdet_tpu.experiments import training_before_epoch
    frozen = training_before_epoch(cfg)
    if frozen:
        logger.info('Freezing param prefixes: %s' % (frozen,))
    tx, lr_schedule = build_optimizer_and_schedule(
        cfg.MODEL.TRAIN.OPTIMIZATION, iters_each_epoch, args.epochs,
        frozen_prefixes=frozen)
    state = create_train_state(variables, tx)

    start_epoch = 0
    ckpt_to_resume = args.ckpt or latest_checkpoint(str(ckpt_dir))
    if ckpt_to_resume:
        logger.info('Resuming from %s' % ckpt_to_resume)
        state, start_epoch = restore_train_state(ckpt_to_resume, state)

    mesh = mesh_lib.make_mesh()
    logger.info('devices: %s mesh: %s' % (jax.devices(), mesh))

    tb_log = None
    if host_id == 0:
        try:
            from tensorboardX import SummaryWriter
            tb_log = SummaryWriter(log_dir=str(output_dir / 'tensorboard'))
        except ImportError:
            pass

    logger.info('**********************Start training**********************')
    train_model(model, state, tx, train_loader, total_epochs=args.epochs,
                start_epoch=start_epoch, ckpt_save_dir=str(ckpt_dir),
                ckpt_save_interval=args.ckpt_save_interval,
                max_ckpt_save_num=args.max_ckpt_save_num, logger=logger,
                mesh=mesh, lr_schedule=lr_schedule, tb_log=tb_log)
    logger.info('**********************End training**********************')


if __name__ == '__main__':
    main()
