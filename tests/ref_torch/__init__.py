"""Harness for importing the REFERENCE torch implementation on CPU.

The reference at /root/reference is torch + CUDA-extension code with several
dependencies absent from this image (spconv, easydict, numba, wandb, cv2,
compiled iou3d/roiaware kernels).  This package installs faithful stand-ins
into sys.modules so `pcdet` (the reference package) can be imported and its
models EXECUTED on CPU — the ground truth for pcdet_tpu's forward-parity and
checkpoint-import tests.

Only test code imports this; nothing in pcdet_tpu depends on the reference.
"""
import sys
import types
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path('/root/reference')


class EasyDict(dict):
    """Minimal easydict.EasyDict: attribute access + recursive wrapping
    (the subset reference pcdet/config.py uses)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            v = EasyDict(v)
        elif isinstance(v, (list, tuple)):
            v = type(v)(EasyDict(x) if isinstance(x, dict) and
                        not isinstance(x, EasyDict) else x for x in v)
        super().__setitem__(k, v)
        super().__setattr__(k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def update(self, other=None, **kwargs):
        for k, v in dict(other or {}, **kwargs).items():
            self[k] = v


def _passthrough_jit(*args, **kwargs):
    """numba.jit both as @jit and @jit(sig, nopython=True)."""
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(fn):
        return fn
    return deco


def install_stubs():
    """Idempotently install import stand-ins for the reference's deps."""
    if 'easydict' not in sys.modules:
        m = types.ModuleType('easydict')
        m.EasyDict = EasyDict
        sys.modules['easydict'] = m

    if 'numba' not in sys.modules:
        m = types.ModuleType('numba')
        m.jit = _passthrough_jit
        m.njit = _passthrough_jit
        m.prange = range
        cuda = types.ModuleType('numba.cuda')
        cuda.jit = _passthrough_jit
        m.cuda = cuda
        sys.modules['numba'] = m
        sys.modules['numba.cuda'] = cuda

    if 'wandb' not in sys.modules:
        m = types.ModuleType('wandb')
        m.init = lambda *a, **k: None
        m.log = lambda *a, **k: None
        m.config = types.SimpleNamespace(update=lambda *a, **k: None)
        sys.modules['wandb'] = m

    if 'cv2' not in sys.modules:
        sys.modules['cv2'] = types.ModuleType('cv2')

    if 'skimage' not in sys.modules:
        m = types.ModuleType('skimage')
        io_m = types.ModuleType('skimage.io')
        io_m.imread = None    # only used when reading real KITTI images
        m.io = io_m
        sys.modules['skimage'] = m
        sys.modules['skimage.io'] = io_m

    if 'segmentation_models_pytorch' not in sys.modules:
        # the fork's PointPillar unconditionally builds an smp.Unet BEV-seg
        # head (reference pointpillar.py:64-66); it is not on the detection
        # path, so a parameter-less shell is enough for parity tests
        import torch.nn as _nn

        class _Encoder(_nn.Module):
            pass

        class _Unet(_nn.Module):
            def __init__(self, *a, **k):
                super().__init__()
                self.encoder = _Encoder()

        m = types.ModuleType('segmentation_models_pytorch')
        m.Unet = _Unet
        sys.modules['segmentation_models_pytorch'] = m

    if 'spconv' not in sys.modules:
        from . import spconv_stub
        sys.modules['spconv'] = spconv_stub

    # the reference hard-codes .cuda() on tensors/modules (it assumes GPU
    # hosts); keep everything on CPU for the parity harness
    import torch
    if not getattr(torch, '_ref_harness_cpu_cuda', False):
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self
        torch._ref_harness_cpu_cuda = True

    # the reference's generated version module + compiled CUDA extensions
    if 'pcdet.version' not in sys.modules:
        m = types.ModuleType('pcdet.version')
        m.__version__ = '0.0.reference'
        sys.modules['pcdet.version'] = m
    for ext in ('pcdet.ops.iou3d_nms.iou3d_nms_cuda',
                'pcdet.ops.roiaware_pool3d.roiaware_pool3d_cuda'):
        if ext not in sys.modules:
            sys.modules[ext] = types.ModuleType(ext)


class _NumpyCompat(types.ModuleType):
    """numpy proxy restoring numpy-1.x behaviours the 2020-era reference
    relies on (meshgrid returning a mutable list; np.float/int/bool
    aliases)."""

    def __init__(self):
        super().__init__('numpy')

    def __getattr__(self, name):
        if name == 'meshgrid':
            return lambda *a, **k: list(np.meshgrid(*a, **k))
        if name == 'float':
            return float
        if name == 'int':
            return int
        if name == 'bool':
            return bool
        return getattr(np, name)


def load_pcdet():
    """Import the reference `pcdet` package (models + config) with stubs."""
    install_stubs()
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import pcdet.config as ref_config            # noqa: F401
    import pcdet.models                          # noqa: F401
    import pcdet
    import pcdet.models.bbox_heads.anchor_target_assigner as ata
    if not isinstance(ata.np, _NumpyCompat):
        ata.np = _NumpyCompat()
    return pcdet


def load_ref_cfg(yaml_name):
    """Load a reference yaml into the reference's GLOBAL cfg (their modules
    read `from ...config import cfg`).  Returns that cfg."""
    pcdet = load_pcdet()
    from pcdet.config import cfg, cfg_from_yaml_file
    # reset model-relevant keys from the previous test's yaml
    for k in ('MODEL', 'DATA_CONFIG', 'CLASS_NAMES'):
        cfg.pop(k, None)
    cfg_from_yaml_file(str(REFERENCE_ROOT / 'tools' / 'cfgs' / yaml_name), cfg)
    return cfg


def fake_dataset(grid_size):
    """Minimal dataset object for Detector3D.__init__ (needs only
    .voxel_generator.grid_size; reference detector3d.py:21)."""
    vg = types.SimpleNamespace(grid_size=np.asarray(grid_size))
    return types.SimpleNamespace(voxel_generator=vg)


def grid_size_from_cfg(cfg):
    pc = np.asarray(cfg.DATA_CONFIG.POINT_CLOUD_RANGE, np.float64)
    vs = np.asarray(cfg.DATA_CONFIG.VOXEL_GENERATOR.VOXEL_SIZE, np.float64)
    return np.round((pc[3:6] - pc[0:3]) / vs).astype(np.int64)
