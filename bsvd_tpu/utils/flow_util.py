"""Optical-flow IO and visualization (reference: BasicSR/basicsr/utils/flow_util.py
.flo read/write, quantized flow, flow -> color wheel RGB)."""

import os

import cv2
import numpy as np


def flowread(flow_path, quantize=False, concat_axis=0, *args, **kwargs):
    """Read a .flo file (or a quantized dx/dy image pair) -> (H, W, 2)."""
    if quantize:
        assert concat_axis in (0, 1)
        cat_flow = cv2.imread(str(flow_path), cv2.IMREAD_UNCHANGED)
        if cat_flow.ndim != 2:
            raise IOError(f'{flow_path} is not a valid quantized flow image')
        assert cat_flow.shape[concat_axis] % 2 == 0
        dx, dy = np.split(cat_flow, 2, axis=concat_axis)
        return dequantize_flow(dx, dy, *args, **kwargs)
    with open(str(flow_path), 'rb') as f:
        header = f.read(4).decode('utf-8')
        if header != 'PIEH':
            raise IOError(f'Invalid flow file: {flow_path}, header does not '
                          'contain PIEH')
        w = np.fromfile(f, np.int32, 1).squeeze()
        h = np.fromfile(f, np.int32, 1).squeeze()
        flow = np.fromfile(f, np.float32, int(w) * int(h) * 2)
        return flow.reshape((int(h), int(w), 2))


def flowwrite(flow, filename, quantize=False, concat_axis=0, *args, **kwargs):
    """Write (H, W, 2) float flow as .flo (or quantized uint8 image)."""
    if not quantize:
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        with open(filename, 'wb') as f:
            f.write('PIEH'.encode('utf-8'))
            np.array([flow.shape[1], flow.shape[0]], dtype=np.int32).tofile(f)
            flow = flow.astype(np.float32)
            flow.tofile(f)
            f.flush()
    else:
        assert concat_axis in (0, 1)
        dx, dy = quantize_flow(flow, *args, **kwargs)
        dxdy = np.concatenate((dx, dy), axis=concat_axis)
        cv2.imwrite(filename, dxdy)


def quantize_flow(flow, max_val=0.02, norm=True):
    """Quantize flow to [0, 255] uint8 (normalized by image size if norm)."""
    h, w, _ = flow.shape
    dx = flow[..., 0]
    dy = flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    flow_comps = [_quantize(d, -max_val, max_val, 255, np.uint8) for d in (dx, dy)]
    return tuple(flow_comps)


def dequantize_flow(dx, dy, max_val=0.02, denorm=True):
    assert dx.shape == dy.shape
    dx = _dequantize(dx, -max_val, max_val, 255)
    dy = _dequantize(dy, -max_val, max_val, 255)
    if denorm:
        dx *= dx.shape[1]
        dy *= dx.shape[0]
    return np.dstack((dx, dy))


def _quantize(arr, min_val, max_val, levels, dtype=np.int64):
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f'levels must be a positive integer, but got {levels}')
    if min_val >= max_val:
        raise ValueError(f'min_val ({min_val}) must be smaller than max_val ({max_val})')
    arr = np.clip(arr, min_val, max_val) - min_val
    return np.minimum(np.floor(levels * arr / (max_val - min_val)).astype(dtype),
                      levels - 1)


def _dequantize(arr, min_val, max_val, levels):
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f'levels must be a positive integer, but got {levels}')
    if min_val >= max_val:
        raise ValueError(f'min_val ({min_val}) must be smaller than max_val ({max_val})')
    return (arr + 0.5) * (max_val - min_val) / levels + min_val


def _make_color_wheel():
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    ncols = ry + yg + gc + cb + bm + mr
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:ry, 0] = 255
    wheel[0:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    wheel[col:col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col:col + yg, 1] = 255
    col += yg
    wheel[col:col + gc, 1] = 255
    wheel[col:col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    wheel[col:col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col:col + cb, 2] = 255
    col += cb
    wheel[col:col + bm, 2] = 255
    wheel[col:col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    wheel[col:col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col:col + mr, 0] = 255
    return wheel / 255.


def flow2rgb(flow, max_flow=None):
    """(H, W, 2) flow -> (H, W, 3) float RGB visualization (color wheel)."""
    u, v = flow[..., 0], flow[..., 1]
    mag = np.sqrt(u**2 + v**2)
    if max_flow is None:
        max_flow = max(np.max(mag), 1e-8)
    u, v = u / max_flow, v / max_flow
    mag = np.sqrt(u**2 + v**2)
    ang = np.arctan2(-v, -u) / np.pi
    wheel = _make_color_wheel()
    ncols = wheel.shape[0]
    fk = (ang + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = (fk - k0)[..., None]
    col = (1 - f) * wheel[k0] + f * wheel[k1]
    small = (mag <= 1)[..., None]
    col = np.where(small, 1 - mag[..., None] * (1 - col), col * 0.75)
    return col.astype(np.float32)
