"""Convert Argoverse / nuScenes raw data into a KITTI-format tree.

The reference fork trains on externally-produced "*-kitti-format" trees with
pinned splits (reference argoverse-splits.py, nuscenes-splits.py); here the
conversion is a first-class CLI.  After converting, build the info/gt-db
pickles with tools/create_data.py.

Usage:
    python tools/convert_to_kitti.py argoverse \
        --src /data/argoverse-tracking --dst data/argo
    python tools/convert_to_kitti.py nuscenes \
        --src /data/nuscenes --version v1.0-trainval --dst data/nuscenes
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('dataset', choices=['argoverse', 'nuscenes'])
    ap.add_argument('--src', required=True, help='raw dataset root')
    ap.add_argument('--dst', required=True, help='KITTI-format output root')
    ap.add_argument('--splits_dir', default=None,
                    help='override the pinned split lists '
                         '(default: converters/splits/)')
    ap.add_argument('--every_n', type=int, default=1,
                    help='keep every n-th sweep')
    ap.add_argument('--max_frames', type=int, default=0,
                    help='cap frames per log/scene (0 = all)')
    ap.add_argument('--version', default='v1.0-trainval',
                    help='nuscenes table version')
    args = ap.parse_args()

    if args.dataset == 'argoverse':
        from pcdet_tpu.datasets.converters import argoverse as conv
        kw = dict(splits_dir=args.splits_dir or conv.SPLITS_DIR,
                  every_n=args.every_n, max_frames_per_log=args.max_frames)
        conv.convert(args.src, args.dst, **kw)
    else:
        from pcdet_tpu.datasets.converters import nuscenes as conv
        conv.convert(args.src, args.dst, version=args.version,
                     splits_dir=args.splits_dir or conv.SPLITS_DIR,
                     every_n=args.every_n,
                     max_frames_per_scene=args.max_frames)


if __name__ == '__main__':
    main()
