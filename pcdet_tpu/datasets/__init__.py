from .dataset import DatasetTemplate, collate_batch  # noqa: F401


def build_dataloader(cfg, batch_size, dist=False, training=True,
                     logger=None, num_workers=4, host_id=0, num_hosts=1,
                     seed=0, worker_mode='thread'):
    """Dataset + prefetching loader factory.

    Mirrors reference pcdet/datasets/__init__.py:16-33; per-host sharding
    replaces torch's DistributedSampler (each host reads a strided subset).
    """
    from .loader import DataLoader
    dataset_name = cfg.DATA_CONFIG.DATASET
    if dataset_name == 'KittiDataset':
        from .kitti.kitti_dataset import KittiDataset
        dataset = KittiDataset(cfg=cfg, training=training, logger=logger)
    elif dataset_name == 'SyntheticDataset':
        from .synthetic import SyntheticDataset
        dataset = SyntheticDataset(cfg=cfg, training=training)
    else:
        raise NotImplementedError(dataset_name)

    loader = DataLoader(dataset, batch_size=batch_size,
                        shuffle=training, num_workers=num_workers,
                        host_id=host_id, num_hosts=num_hosts,
                        drop_last=training, seed=seed,
                        worker_mode=worker_mode)
    return dataset, loader
