"""Dataset preprocessing CLI: build info pkls + GT database.

Equivalent of the reference's `python pcdet/datasets/kitti/kitti_dataset.py
create_kitti_infos` entry (kitti_dataset.py:801-838).

Usage:
    python tools/create_data.py kitti --cfg_file tools/cfgs/pointpillar.yaml
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('dataset', choices=['kitti'])
    parser.add_argument('--cfg_file', type=str,
                        default='tools/cfgs/pointpillar.yaml')
    parser.add_argument('--data_path', type=str, default=None)
    parser.add_argument('--save_path', type=str, default=None)
    parser.add_argument('--workers', type=int, default=4)
    args = parser.parse_args()

    from pcdet_tpu.config import cfg, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)

    if args.dataset == 'kitti':
        from pcdet_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
        create_kitti_infos(cfg, data_path=args.data_path,
                           save_path=args.save_path, workers=args.workers)


if __name__ == '__main__':
    main()
