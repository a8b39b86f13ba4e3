"""Sharded-train-step dry run, shared by the driver entry
(__graft_entry__.dryrun_multichip) and the multi-host bring-up test.

Jits the FULL training step (fwd+loss+grad+adam+EMA) of the flagship
BSVD-c64 config over a ('data','spatial') mesh and runs one step on tiny
shapes. The batch is generated INSIDE jit with explicit out_shardings, so
the same code works on a single-process virtual mesh and on a multi-process
(DCN-spanning) global mesh, where host-side global arrays would need
per-process assembly.
"""

import jax
import jax.numpy as jnp
import numpy as np


def run_sharded_train_step(mesh, seed=0, cfg=None):
    """One sharded train step over ``mesh``; returns the scalar pixel loss.
    ``cfg`` defaults to the flagship BSVD-c64 config."""
    import optax
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init
    from bsvd_tpu.models.denoising_model import make_train_step
    from bsvd_tpu.models.lr_scheduler import multi_step_restart_lr
    from bsvd_tpu.losses import MSELoss
    from bsvd_tpu.parallel.mesh import batch_sharding, replicated_sharding

    if cfg is None:
        cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                         norm='none', act='relu6', shift_mode='TSM')
    params = wnet_init(jax.random.PRNGKey(seed), cfg)
    schedule = multi_step_restart_lr(1e-3, [50_000], 0.7)
    tx = optax.adam(schedule, b1=0.9, b2=0.99)
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.array, params)

    step = make_train_step(cfg, tx, MSELoss())
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh, 5, batch_axis=0, spatial_axis=2)
    jstep = jax.jit(step,
                    in_shardings=(repl, repl, repl,
                                  {'lq': bsh, 'gt': bsh}, None, None),
                    out_shardings=(repl, repl, repl, repl))

    n, t, h, w = mesh.shape['data'], 3, 16 * mesh.shape['spatial'], 16

    @jax.jit
    def make_batch(key):
        k1, k2 = jax.random.split(key)
        batch = {
            'lq': jax.random.normal(k1, (n, t, h, w, 4), jnp.float32),
            'gt': jax.random.normal(k2, (n, t, h, w, 3), jnp.float32),
        }
        return jax.lax.with_sharding_constraint(batch,
                                                {'lq': bsh, 'gt': bsh})

    batch = make_batch(jax.random.PRNGKey(seed + 1))
    params, opt_state, ema, loss_dict = jstep(params, opt_state, ema, batch,
                                              0, 0.999)
    jax.block_until_ready(loss_dict)
    loss = float(loss_dict['l_pix'])
    assert np.isfinite(loss)
    return loss


def run_sharded_stream_step(mesh, seed=0, cfg=None):
    """Spatially-sharded SINGLE-STREAM streaming (StreamDenoiser with the
    frame rows sharded over the mesh's 'spatial' axis — parallel/spatial.py
    stream_local_step; the reference has no single-stream multi-GPU
    streaming at all, its DP scatters whole frames,
    BasicSR/basicsr/models/base_model.py:62-76). Pushes a clip through
    fill + steady per-frame + steady block + drain and returns the max abs
    deviation from the single-device client (must be fp-noise)."""
    from bsvd_tpu.archs.streaming import StreamDenoiser
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init

    if cfg is None:
        cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                         norm='none', act='relu6', shift_mode='TSM')
    params = wnet_init(jax.random.PRNGKey(seed), cfg)
    n_sp = dict(mesh.shape).get('spatial', 1)
    n, h, w = 1, max(16, 4 * n_sp), 16
    rng = np.random.default_rng(seed)
    sd_ref = StreamDenoiser(params, cfg, batch=n, height=h, width=w)
    sd_sp = StreamDenoiser(params, cfg, batch=n, height=h, width=w,
                           mesh=mesh)
    assert sd_sp.mesh is not None, 'spatial streaming gate rejected the mesh'
    t = sd_ref.latency + 4
    x = jnp.asarray(rng.uniform(0, 1, (t, n, h, w, cfg.effective_in_ch)),
                    jnp.float32)
    outs_ref, outs_sp = [], []
    for i in range(t - 2):
        a, b = sd_ref.push(x[i]), sd_sp.push(x[i])
        if a is not None:
            outs_ref.append(np.asarray(a))
        if b is not None:
            outs_sp.append(np.asarray(b))
    for o in sd_ref.push_block(x[t - 2:]):
        if o is not None:
            outs_ref.append(np.asarray(o))
    for o in sd_sp.push_block(x[t - 2:]):
        if o is not None:
            outs_sp.append(np.asarray(o))
    outs_ref.extend(np.asarray(o) for o in sd_ref.flush())
    outs_sp.extend(np.asarray(o) for o in sd_sp.flush())
    assert len(outs_ref) == len(outs_sp) == t
    dev = float(np.abs(np.stack(outs_sp) - np.stack(outs_ref)).max())
    assert dev < 1e-4, f'sharded streaming deviates from single-device: {dev}'
    return dev


def run_sharded_eval(mesh, seed=0, cfg=None):
    """Spatially-sharded whole-clip denoise_seq over ``mesh`` (the shard_map
    + halo-exchange path that keeps the Pallas kernels per-shard,
    parallel/spatial.py), checked against the single-device protocol.
    Returns the max abs deviation (must be fp-noise)."""
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init
    from bsvd_tpu.models.seq_inference import denoise_seq

    if cfg is None:
        cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                         norm='none', act='relu6', shift_mode='TSM')
    params = wnet_init(jax.random.PRNGKey(seed), cfg)
    n_sp = dict(mesh.shape).get('spatial', 1)
    h = 4 * n_sp if (4 * n_sp) % 16 == 0 else 16 * n_sp
    rng = np.random.default_rng(seed)
    seq = rng.uniform(0, 1, (3, 3, h, 8)).astype(np.float32)
    ref = denoise_seq(params, cfg, seq, noise_sigma=0.1, temp_psz=-1)
    got = denoise_seq(params, cfg, seq, noise_sigma=0.1, temp_psz=-1,
                      mesh=mesh)
    dev = float(np.abs(got - ref).max())
    assert dev < 1e-4, f'sharded eval deviates from single-device: {dev}'
    return dev
