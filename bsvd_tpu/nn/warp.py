"""Flow warping / grid sampling in pure jnp, NHWC
(replaces torch F.grid_sample + flow_warp, reference:
BasicSR/basicsr/archs/arch_util.py:116-186). Gather-based bilinear sampling —
XLA lowers the gathers efficiently on TPU."""

import jax.numpy as jnp


def _gather_2d(img, iy, ix):
    """img (N, H, W, C); iy/ix (N, Ho, Wo) int32 -> (N, Ho, Wo, C)."""
    n = img.shape[0]
    batch_idx = jnp.arange(n).reshape(n, 1, 1)
    return img[batch_idx, iy, ix]


def grid_sample(img, coords, interp_mode='bilinear', padding_mode='zeros'):
    """Sample img at absolute pixel coordinates.

    Args:
        img: (N, H, W, C).
        coords: (N, Ho, Wo, 2) with (x, y) pixel coordinates (not normalized).
        padding_mode: 'zeros' | 'border' | 'reflection'.
    Returns:
        (N, Ho, Wo, C).
    """
    h, w = img.shape[1:3]
    x = coords[..., 0]
    y = coords[..., 1]

    def reflect(v, vmax):
        # torch 'reflection' with align_corners=True: reflect around 0, vmax
        period = 2 * vmax if vmax > 0 else 1
        v = jnp.abs(v) % period
        return jnp.where(v > vmax, period - v, v)

    if padding_mode == 'reflection':
        x = reflect(x, w - 1)
        y = reflect(y, h - 1)

    if interp_mode == 'nearest':
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        if padding_mode == 'zeros':
            valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
            out = _gather_2d(img, jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1))
            return out * valid[..., None].astype(img.dtype)
        return _gather_2d(img, jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1))

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1
    wx1 = (x - x0).astype(img.dtype)
    wy1 = (y - y0).astype(img.dtype)
    wx0 = 1 - wx1
    wy0 = 1 - wy1

    def corner(yc, xc):
        iy = jnp.clip(yc.astype(jnp.int32), 0, h - 1)
        ix = jnp.clip(xc.astype(jnp.int32), 0, w - 1)
        val = _gather_2d(img, iy, ix)
        if padding_mode == 'zeros':
            valid = ((xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1))
            val = val * valid[..., None].astype(img.dtype)
        return val

    out = (corner(y0, x0) * (wy0 * wx0)[..., None]
           + corner(y0, x1) * (wy0 * wx1)[..., None]
           + corner(y1, x0) * (wy1 * wx0)[..., None]
           + corner(y1, x1) * (wy1 * wx1)[..., None])
    return out


def flow_warp(x, flow, interp_mode='bilinear', padding_mode='zeros'):
    """Warp (N, H, W, C) by flow (N, H, W, 2) in pixel units
    (grid + flow sampling, torch align_corners=True convention)."""
    h, w = x.shape[1:3]
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=x.dtype),
                          jnp.arange(w, dtype=x.dtype), indexing='ij')
    grid = jnp.stack([gx, gy], axis=-1)          # (H, W, 2) as (x, y)
    coords = grid[None] + flow.astype(x.dtype)
    return grid_sample(x, coords, interp_mode, padding_mode)


def interpolate_bilinear(x, out_h, out_w, align_corners=False):
    """torch F.interpolate(mode='bilinear') on NHWC for both corner modes."""
    n, h, w, c = x.shape
    if align_corners:
        ys = jnp.linspace(0, h - 1, out_h, dtype=jnp.float32)
        xs = jnp.linspace(0, w - 1, out_w, dtype=jnp.float32)
    else:
        ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
        xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing='ij')
    coords = jnp.broadcast_to(jnp.stack([gx, gy], axis=-1),
                              (n, out_h, out_w, 2))
    return grid_sample(x, coords, 'bilinear', 'border')


def resize_flow(flow, size_type, sizes, interp_mode='bilinear',
                align_corners=False):
    """Resize (N, H, W, 2) flow and rescale its magnitudes
    (reference arch_util.py:150-186)."""
    h, w = flow.shape[1:3]
    if size_type == 'ratio':
        out_h, out_w = int(h * sizes[0]), int(w * sizes[1])
    elif size_type == 'shape':
        out_h, out_w = sizes[0], sizes[1]
    else:
        raise ValueError(f'Size type should be ratio or shape, but got {size_type}.')
    ratio_h = out_h / h
    ratio_w = out_w / w
    flow = flow * jnp.asarray([ratio_w, ratio_h], flow.dtype)
    del interp_mode
    return interpolate_bilinear(flow, out_h, out_w, align_corners)
