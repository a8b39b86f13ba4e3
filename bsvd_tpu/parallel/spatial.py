"""Spatially-sharded WNet forward that KEEPS the fused Pallas kernels.

GSPMD cannot partition Pallas custom calls (no sharding rules), so a
spatially sharded tensor reaching a fused kernel would be replicated —
round-3 therefore fell back to the slower XLA conv path on any mesh with a
'spatial' axis. This module replaces that fallback with an explicit
shard_map program (the conv-net analogue of sequence parallelism; the
reference counterpart is the torch DP scatter over full frames,
BasicSR/basicsr/models/base_model.py:62-76 — which cannot split one frame
at all):

- H is sharded over the 'spatial' mesh axis. Each device computes its row
  block per stage on a HALO-EXTENDED block: the stage input (3-4 channels —
  the cheapest point in the net) is all-gathered over ICI, each device
  slices its rows ± the stage's receptive field (stage_halo, ~40 rows), the
  ENTIRE fused stage runs per-shard exactly as on one chip, and the halo is
  cropped. Inter-device traffic is two small all-gathers per forward.
- Global-edge exactness: rows outside the global image are fictitious
  (zero-filled) on the edge shards; convolving through them would bleed
  act(bias) garbage inward, so a row-validity mask (zero rows outside the
  global image at the current resolution) is applied after every conv site
  (the ``mask`` hook in archs/wnet_arch). On interior shards the mask is
  the identity. This reproduces per-conv zero padding bit-exactly.
- The only kernels bypassed under a mask are the in-VMEM conv CHAINS
  (inc/outc pairs) — a chain cannot mask its intermediate — which unbundle
  into the single-conv Pallas kernels.

Validity/alignment: H must divide by 4 * n_spatial (two stride-2 levels x
even shard offsets keep every stride phase and the halo arithmetic
aligned). ``spatial_ok`` gates callers.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from bsvd_tpu.parallel.mesh import get_shard_map


def stage_halo(cfg):
    """Rows of halo one DenBlock stage needs at its input resolution.

    Forward-simulates garbage growth through the stage's conv topology
    (each 3x3 conv corrupts one more edge row; stride-2 maps g -> ceil((g+1)/2);
    r=2 pixel shuffle doubles), then rounds up to a multiple of 4 so shard
    offsets stay aligned with both stride-2 grids."""
    g = 2                    # inc: two 3x3 convs at full res
    g = (g + 2) // 2         # down0 stride-2 conv -> level 2
    g += 2                   # down0 cvblock
    g1 = g                   # skip x1 garbage (level 2)
    g = (g + 2) // 2         # down1 stride-2 conv -> level 4
    g += 2                   # down1 cvblock
    g += 2                   # up2 cvblock
    g += 1                   # up2 conv
    g *= 2                   # pixel shuffle -> level 2
    g = max(g, g1)           # + skip x1
    g += 2                   # up1 cvblock
    g += 1                   # up1 conv
    g *= 2                   # pixel shuffle -> level 1
    g = max(g, 2)            # + skip x0
    g += 2                   # outc
    return -(-g // 4) * 4


def spatial_ok(cfg, h, mesh):
    """True when the shard_map spatial forward handles (cfg, H, mesh)."""
    if mesh is None:
        return False
    n_sp = dict(mesh.shape).get('spatial', 1)
    if n_sp <= 1:
        return False
    return cfg.norm == 'none' and h % (4 * n_sp) == 0


def _local_forward(params, x_local, cfg, h_global, axis_name):
    """Per-shard stage loop; runs INSIDE shard_map.

    Args:
        x_local: (N, T, H_local, W, C) — this shard's row block.
        h_global: full image height (static).
    Returns the shard's (N, T, H_local, W, out_ch) output block.
    """
    from bsvd_tpu.archs.wnet_arch import (_folded_stems_ok, _stage_apply,
                                          _stage_apply_folded)
    from bsvd_tpu.nn.layers import get_act

    act = get_act(cfg.act)
    h_local = x_local.shape[2]
    halo = stage_halo(cfg)
    d = jax.lax.axis_index(axis_name)
    s_ext = d * h_local - halo   # global row of the extended block's row 0

    def mask(v, level):
        # zero rows outside the global image at this resolution — restores
        # per-conv zero-padding semantics on the global-edge shards; the
        # identity on interior shards (all their rows are in-image)
        rows = jax.lax.broadcasted_iota(jnp.int32, (v.shape[2], 1, 1), 0)
        gidx = rows + s_ext // level
        valid = (gidx >= 0) & (gidx < h_global // level)
        return jnp.where(valid, v, jnp.zeros((), v.dtype))

    for i in range(cfg.stage_num):
        # stage input is the narrow-channel point (C=3/4): gather it whole,
        # slice this shard's halo-extended block (zero-filled past the
        # global edges — the mask keeps those rows zero through the stage)
        full = jax.lax.all_gather(x_local, axis_name, axis=2, tiled=True)
        padded = jnp.pad(full, ((0, 0), (0, 0), (halo, halo), (0, 0), (0, 0)))
        x_ext = jax.lax.dynamic_slice_in_dim(
            padded, d * h_local, h_local + 2 * halo, axis=2)
        p = params[f'stage{i}']
        if _folded_stems_ok(x_ext, cfg):
            y = _stage_apply_folded(p, x_ext, cfg, act, mask=mask)
        else:
            y = _stage_apply(p, x_ext, cfg, act, mask=mask)
        x_local = y[:, :, halo:halo + h_local]
    return x_local


# ---------------------------------------------------------------------------
# spatially-sharded SINGLE-STREAM streaming (StreamDenoiser on a spatial mesh)
# ---------------------------------------------------------------------------
#
# Same halo-recompute design as the MIMO path above, applied to the carried
# streaming state: each device holds the HALO-EXTENDED row block of every
# buffer/ring (h_local + 2*halo rows — garbage grows inward through a stage
# exactly as in the extended MIMO block, so the center h_local rows stay
# exact frame after frame), and each stage gathers its cheap narrow-channel
# input over ICI, slices its extended block, runs the full fused stage step
# per shard with the row-validity mask, and crops. The reference has no
# single-stream multi-GPU streaming at all (its DP scatters whole frames:
# BasicSR/basicsr/models/base_model.py:62-76).


def _stream_row_mask(s_ext, h_global):
    """Row-validity hook for the extended streaming block (same protocol as
    _local_forward's mask): zero rows outside the global image at each
    resolution level; identity on interior shards. Works for any (..., H,
    W, C) rank (H at axis -3)."""
    def mask(v, level):
        rows = jax.lax.broadcasted_iota(jnp.int32, (v.shape[-3], 1, 1), 0)
        gidx = rows + s_ext // level
        valid = (gidx >= 0) & (gidx < h_global // level)
        return jnp.where(valid, v, jnp.zeros((), v.dtype))
    return mask


def stream_spatial_ok(cfg, h, mesh):
    """True when spatially-sharded streaming handles (cfg, H, mesh): the
    mask protocol needs norm-free convs and both stride-2 grids aligned
    per shard (H % (4 * n_spatial) == 0; halo is a multiple of 4)."""
    return spatial_ok(cfg, h, mesh)


def stream_local_step(params, state, x_local, cfg, h_global, axis_name,
                      valid=True, assume_filled=False):
    """One streaming frame, per-shard (runs INSIDE shard_map).

    Args:
        x_local: (N, h_local, W, C_in) — this shard's rows of the frame.
        state: per-shard HALO-EXTENDED streaming state
            (stream_init at h_local + 2*halo rows).
    Returns (new_state, out_local (N, h_local, W, out_ch), out_valid).
    """
    from bsvd_tpu.archs.streaming import (_fold2s, _stage_stream_step,
                                          _unfold2s)
    from bsvd_tpu.archs.wnet_arch import fold_gate
    from bsvd_tpu.nn.layers import get_act

    act = get_act(cfg.act)
    if not isinstance(valid, bool):
        valid = jnp.asarray(valid, jnp.bool_)
    n, h_local, w_, _ = x_local.shape
    halo = stage_halo(cfg)
    d = jax.lax.axis_index(axis_name)
    mask = _stream_row_mask(d * h_local - halo, h_global)
    fold_io = fold_gate(cfg, w_)
    if fold_io:
        x_local = _fold2s(x_local)
    new_state = []
    for i in range(cfg.stage_num):
        # stage input is the narrow-channel point: gather it whole over
        # ICI, slice this shard's halo-extended block (zero rows past the
        # global edges; the mask keeps them zero through the stage)
        full = jax.lax.all_gather(x_local, axis_name, axis=1, tiled=True)
        padded = jnp.pad(full, ((0, 0), (halo, halo), (0, 0), (0, 0)))
        x_ext = jax.lax.dynamic_slice_in_dim(
            padded, d * h_local, h_local + 2 * halo, axis=1)
        st, y_ext, valid = _stage_stream_step(
            params[f'stage{i}'], state[i], x_ext, valid, cfg, act,
            assume_filled, fold_io=fold_io, mask=mask)
        new_state.append(st)
        x_local = y_ext[:, halo:halo + h_local]
    if fold_io:
        x_local = _unfold2s(x_local)
    return new_state, x_local, valid


def stream_local_step_block(params, state, xs_local, cfg, h_global,
                            axis_name):
    """F-frame steady-state streaming block, per-shard (INSIDE shard_map).
    xs_local: (F, N, h_local, W, C_in). Mirrors stream_local_step with the
    multi-frame block step (archs/streaming.stream_step_block)."""
    from bsvd_tpu.archs.streaming import _stage_stream_step_block
    from bsvd_tpu.archs.wnet_arch import fold_gate
    from bsvd_tpu.nn.layers import get_act

    act = get_act(cfg.act)
    f, n, h_local, w_, c = xs_local.shape
    halo = stage_halo(cfg)
    d = jax.lax.axis_index(axis_name)
    mask = _stream_row_mask(d * h_local - halo, h_global)
    fold_io = fold_gate(cfg, w_)
    if fold_io:
        xs_local = xs_local.reshape(f, n, h_local, w_ // 2, 2 * c)
    new_state = []
    for i in range(cfg.stage_num):
        full = jax.lax.all_gather(xs_local, axis_name, axis=2, tiled=True)
        padded = jnp.pad(full, ((0, 0),) * 2 + ((halo, halo),) + ((0, 0),) * 2)
        x_ext = jax.lax.dynamic_slice_in_dim(
            padded, d * h_local, h_local + 2 * halo, axis=2)
        st, y_ext = _stage_stream_step_block(
            params[f'stage{i}'], state[i], x_ext, cfg, act,
            fold_io=fold_io, mask=mask)
        new_state.append(st)
        xs_local = y_ext[:, :, halo:halo + h_local]
    if fold_io:
        fb, nb, hb, wb, cb = xs_local.shape
        xs_local = xs_local.reshape(fb, nb, hb, wb * 2, cb // 2)
    return new_state, xs_local


def wnet_apply_spatial(params, x, cfg, mesh):
    """MIMO forward with H sharded over the mesh's 'spatial' axis, fused
    kernels kept per-shard. x: (N, T, H, W, C) -> (N, T, H, W, out_ch).

    N rides the 'data' axis when it divides; N=1 inference replicates over
    'data' (each data row computes identically)."""
    shard_map, relax = get_shard_map()
    n = x.shape[0]
    n_data = mesh.shape['data']
    batch = 'data' if (n_data > 1 and n % n_data == 0) else None
    spec = P(batch, None, 'spatial')

    @functools.partial(shard_map, mesh=mesh, in_specs=(P(), spec),
                       out_specs=spec, **relax)
    def fwd(p, xl):
        return _local_forward(p, xl, cfg, x.shape[2], 'spatial')

    return fwd(params, x)
