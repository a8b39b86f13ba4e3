"""Arch registry auto-population: importing this package imports every
``*_arch.py`` module so ARCH_REGISTRY is filled (mirrors the reference's
directory-scan plugin mechanism, BasicSR/basicsr/archs/__init__.py:13-16)."""

import importlib
import pkgutil

from bsvd_tpu.utils.registry import ARCH_REGISTRY


def build_network(opt):
    """Instantiate a registered arch from an options dict ({'type': Name, ...})."""
    opt = dict(opt)
    network_type = opt.pop('type')
    net = ARCH_REGISTRY.get(network_type)(**opt)
    return net


for _m in pkgutil.iter_modules(__path__):
    if _m.name.endswith(('_arch', '_archs')) or _m.name == 'streaming':
        importlib.import_module(f'bsvd_tpu.archs.{_m.name}')
