"""Dataset -> KITTI-format converters (Argoverse, nuScenes).

The reference fork trains its argo/nuscenes configs on externally-converted
"*-kitti-format" trees and pins the train/val log lists in code
(reference argoverse-splits.py:1-96, nuscenes-splits.py:1-173).  Here the
conversion itself is part of the framework (tools/convert_to_kitti.py) and
the pinned splits ship as data files under converters/splits/.
"""
from . import argoverse, nuscenes  # noqa: F401
