"""Model factory (registry keyed by cfg.MODEL.NAME).

Parity target: reference pcdet/models/__init__.py:11-21 (`all_models`).
"""


def build_network(cfg, grid_size):
    name = cfg.MODEL.NAME
    if name == 'PointPillar':
        from .pointpillar import PointPillar
        return PointPillar(cfg, grid_size)
    if name in ('SECOND', 'second_net'):
        from .second import SECONDNet
        return SECONDNet(cfg, grid_size)
    if name in ('PartA2', 'PartA2_net'):
        from .parta2 import PartA2Net
        return PartA2Net(cfg, grid_size)
    raise NotImplementedError(name)
