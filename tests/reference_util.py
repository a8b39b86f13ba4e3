"""Helpers to load the UNTRUSTED read-only reference implementation
(/root/reference) for numerical parity testing. Tests using this module skip
when the reference tree is unavailable.

The reference imports torchvision and a generated basicsr.version module;
neither exists here, so minimal stubs are installed first.
"""

import os
import sys
import types

import pytest

# Overridable so CI can prove the golden-fixture path works without the
# reference tree (point it at a non-existent dir).
REFERENCE_ROOT = os.environ.get('BSVD_TPU_REFERENCE_ROOT', '/root/reference')


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

    import torch
    import torch.nn.functional as F

    def deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                      padding=(1, 1), dilation=(1, 1), mask=None):
        """torch-native modulated deform conv (torchvision.ops.deform_conv2d
        semantics) so the reference's DCNv2Pack runs on CPU."""
        if isinstance(stride, int):
            stride = (stride, stride)
        if isinstance(padding, int):
            padding = (padding, padding)
        if isinstance(dilation, int):
            dilation = (dilation, dilation)
        n, c, h, w = input.shape
        cout, _, kh, kw = weight.shape
        k = kh * kw
        ho, wo = offset.shape[2:]
        dg = offset.shape[1] // (2 * k)
        cg = c // dg
        off = offset.view(n, dg, k, 2, ho, wo)
        msk = None if mask is None else mask.view(n, dg, k, ho, wo)
        ys = torch.arange(ho, dtype=input.dtype) * stride[0] - padding[0]
        xs = torch.arange(wo, dtype=input.dtype) * stride[1] - padding[1]
        base_y, base_x = torch.meshgrid(ys, xs, indexing='ij')
        cols = []
        for ki in range(kh):
            for kj in range(kw):
                t = ki * kw + kj
                per_g = []
                for g in range(dg):
                    yy = base_y + ki * dilation[0] + off[:, g, t, 0]
                    xx = base_x + kj * dilation[1] + off[:, g, t, 1]
                    gx = 2 * xx / max(w - 1, 1) - 1
                    gy = 2 * yy / max(h - 1, 1) - 1
                    grid = torch.stack([gx, gy], dim=-1)
                    s = F.grid_sample(input[:, g * cg:(g + 1) * cg], grid,
                                      mode='bilinear', padding_mode='zeros',
                                      align_corners=True)
                    if msk is not None:
                        s = s * msk[:, g, t].unsqueeze(1)
                    per_g.append(s)
                cols.append(torch.cat(per_g, dim=1))
        col = torch.stack(cols, dim=1)              # (n, k, c, ho, wo)
        # torch weight (cout, cin, kh, kw) flattens cin-major: index ci*k + t
        w_mat = weight.view(cout, c * k)
        col = col.permute(0, 3, 4, 2, 1).reshape(n, ho * wo, c * k)
        out = col @ w_mat.t()
        out = out.view(n, ho, wo, cout).permute(0, 3, 1, 2)
        if bias is not None:
            out = out + bias.view(1, -1, 1, 1)
        return out

    # NOTE: the reference compares versions as strings, so use '0.9.0'+
    # lexicographically ('0.15.0' would compare BELOW '0.9.0')
    tv = _stub('torchvision', __version__='0.9.9')
    tv.__path__ = []
    tv.ops = _stub('torchvision.ops', deform_conv2d=deform_conv2d)
    _stub('torchvision.utils', make_grid=lambda *a, **k: None)
    _stub('torchvision.models', vgg=types.SimpleNamespace(vgg19=None))
    _stub('torchvision.models.vgg', VGG=object, vgg19=None)

    # class-definition-only bases so basicsr.archs.inception (and through
    # it basicsr.metrics.fid) imports; instantiating the FID blocks still
    # requires real torchvision and is not done in tests
    class _NoInit:
        def __init__(self, *a, **k):
            raise RuntimeError('torchvision is stubbed; cannot instantiate')

    inc = _stub('torchvision.models.inception',
                InceptionA=_NoInit, InceptionB=_NoInit, InceptionC=_NoInit,
                InceptionD=_NoInit, InceptionE=_NoInit)
    sys.modules['torchvision.models'].inception = inc
    sys.modules['torchvision.models'].inception_v3 = _NoInit
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
