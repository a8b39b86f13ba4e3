"""Helpers to load the UNTRUSTED read-only reference implementation
(/root/reference) for numerical parity testing. Tests using this module skip
when the reference tree is unavailable.

The reference imports torchvision and a generated basicsr.version module;
neither exists here, so minimal stubs are installed first.
"""

import sys
import types

import pytest

REFERENCE_ROOT = '/root/reference'


def _stub(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_loaded = None


def load_reference():
    """Import the reference torch modules (CPU). Returns a namespace with the
    pieces parity tests need, or skips the calling test."""
    global _loaded
    if _loaded is not None:
        return _loaded
    import os
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip('reference tree not available')
    sys.path.insert(0, REFERENCE_ROOT)
    sys.path.insert(0, REFERENCE_ROOT + '/BasicSR')

    tv = _stub('torchvision')
    tv.__path__ = []
    _stub('torchvision.utils', make_grid=lambda *a, **k: None)
    _stub('torchvision.models', vgg=types.SimpleNamespace(vgg19=None))
    _stub('torchvision.models.vgg', VGG=object, vgg19=None)
    tvt = _stub('torchvision.transforms')
    tvt.__path__ = []
    _stub('torchvision.transforms.functional', normalize=lambda *a, **k: None)
    _stub('torchvision.transforms.functional_tensor',
          rgb_to_grayscale=lambda *a, **k: None)
    _stub('basicsr.version', __gitsha__='none', __version__='1.3.4.2')

    from Experimental_root.archs.archs_2d import wnet_models
    from Experimental_root.archs import tsm_arch
    from Experimental_root.archs.temporal_shift_ops import temporal_shift
    from Experimental_root.models import global_queue_buffer

    ns = types.SimpleNamespace(
        wnet_models=wnet_models,
        tsm_arch=tsm_arch,
        temporal_shift=temporal_shift,
        global_queue_buffer=global_queue_buffer,
    )
    _loaded = ns
    return ns


SMALL_NET2D_OPT = dict(chns=[16, 32, 64], mid_ch=16, shift_input=False,
                       stage_num=2, in_ch=4, out_ch=3, norm='none',
                       act='relu6', interm_ch=16, blind=False)
