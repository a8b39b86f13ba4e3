"""HiFaceGAN — SPADE-based face renovation generator with a LIP encoder,
plus the pix2pixHD-style multiscale discriminator, functional
(reference: BasicSR/basicsr/archs/hifacegan_arch.py + hifacegan_util.py).

Spectral norm on the conv weights (norm_d='spectralinstance', reference
hifacegan_util SpectralNorm) is applied two ways, matching how the params
were produced:

- training from scratch: discriminator convs carry a persistent power-
  iteration vector ``u`` and every forward normalizes ``w / sigma`` with one
  power iteration (the reference's train-mode behavior); the updated ``u``
  is returned as aux for the engine to fold back after the optimizer step;
- converted checkpoints: sigma is folded into the weight at conversion
  (exact at eval, where torch freezes u/v), so params have no ``u`` and the
  conv runs plain.

Param trees mirror torch names.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bsvd_tpu.archs.sr_archs import nearest_up
from bsvd_tpu.nn.layers import conv2d, conv_init
from bsvd_tpu.utils.registry import ARCH_REGISTRY


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def nearest_resize(x, oh, ow):
    """torch F.interpolate(mode='nearest') on NHWC."""
    n, h, w, c = x.shape
    iy = (jnp.arange(oh) * h // oh).astype(jnp.int32)
    ix = (jnp.arange(ow) * w // ow).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def _instance_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def _instance_norm_affine(p, x, eps=1e-5):
    return _instance_norm(x, eps) * p['w'] + p['b']


# ---------------------------------------------------------------------------
# SPADE
# ---------------------------------------------------------------------------

def spade_init(key, norm_nc, label_nc, ks=3):
    k1, k2, k3 = jax.random.split(key, 3)
    nhidden = 128 if norm_nc > 128 else norm_nc
    return {'mlp_shared': {'0': conv_init(k1, label_nc, nhidden, ks, True)},
            'mlp_gamma': conv_init(k2, nhidden, norm_nc, ks, False),
            'mlp_beta': conv_init(k3, nhidden, norm_nc, ks, False)}


def spade_apply(p, x, segmap):
    normalized = _instance_norm(x)
    seg = nearest_resize(segmap, x.shape[1], x.shape[2])
    actv = jnp.maximum(conv2d(p['mlp_shared']['0'], seg), 0)
    gamma = conv2d(p['mlp_gamma'], actv)
    beta = conv2d(p['mlp_beta'], actv)
    return normalized * gamma + beta


def spade_resblock_init(key, fin, fout, semantic_nc=3):
    keys = jax.random.split(key, 6)
    fmiddle = min(fin, fout)
    p = {'conv_0': conv_init(keys[0], fin, fmiddle, 3, True),
         'conv_1': conv_init(keys[1], fmiddle, fout, 3, True),
         'norm_0': spade_init(keys[2], fin, semantic_nc),
         'norm_1': spade_init(keys[3], fmiddle, semantic_nc)}
    if fin != fout:
        p['conv_s'] = conv_init(keys[4], fin, fout, 1, False)
        p['norm_s'] = spade_init(keys[5], fin, semantic_nc)
    return p


def spade_resblock_apply(p, x, seg):
    if 'conv_s' in p:
        x_s = conv2d(p['conv_s'], spade_apply(p['norm_s'], x, seg), padding=0)
    else:
        x_s = x
    dx = conv2d(p['conv_0'], _lrelu(spade_apply(p['norm_0'], x, seg)))
    dx = conv2d(p['conv_1'], _lrelu(spade_apply(p['norm_1'], dx, seg)))
    return x_s + dx


# ---------------------------------------------------------------------------
# LIP encoder
# ---------------------------------------------------------------------------

def _avg_pool_excl(x, k=3, s=2, p=1):
    """avg_pool2d(count_include_pad=False) on NHWC."""
    ssum = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
                             [(0, 0), (p, p), (p, p), (0, 0)])
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = lax.reduce_window(ones, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
                            [(0, 0), (p, p), (p, p), (0, 0)])
    return ssum / cnt


def lip2d(x, logit, k=3, s=2, p=1):
    weight = jnp.exp(logit)
    return _avg_pool_excl(x * weight, k, s, p) / _avg_pool_excl(weight, k, s, p)


def lip_encoder_init(key, input_nc, ngf, n_2xdown):
    keys = iter(jax.random.split(key, 4 * n_2xdown + 4))
    # Sequential layout: conv(0), InstanceNorm affine=False (1, paramless),
    # ReLU(2), then per block: LIP(3+4i), conv(4+4i), paramless norm(5+4i),
    # ReLU(6+4i, absent after the last block)
    model = {'0': conv_init(next(keys), input_nc, ngf, 3, False)}
    cur = 1
    for i in range(n_2xdown):
        nxt = min(cur * 2, 16)
        # SimplifiedLIP: logit = conv(bias=False) InstanceNorm(affine) SoftGate
        model[str(3 + 4 * i)] = {'logit': {
            '0': conv_init(next(keys), ngf * cur, ngf * cur, 3, False),
            '1': {'w': jnp.ones((ngf * cur,)), 'b': jnp.zeros((ngf * cur,))}}}
        model[str(4 + 4 * i)] = conv_init(next(keys), ngf * cur, ngf * nxt, 3, True)
        cur = nxt
    return {'model': model}


def lip_encoder_apply(p, x, n_2xdown):
    m = p['model']
    x = jnp.maximum(_instance_norm(conv2d(m['0'], x)), 0)
    for i in range(n_2xdown):
        lg = m[str(3 + 4 * i)]['logit']
        logit = 12.0 * jax.nn.sigmoid(
            _instance_norm_affine(lg['1'], conv2d(lg['0'], x)))
        x = lip2d(x, logit)
        x = _instance_norm(conv2d(m[str(4 + 4 * i)], x))
        if i < n_2xdown - 1:
            x = jnp.maximum(x, 0)
    return x


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

def hifacegan_init(key, num_in_ch=3, num_feat=64, scale_ratio=5):
    keys = iter(jax.random.split(key, 16))
    nf = num_feat
    return {
        'lip_encoder': lip_encoder_init(next(keys), num_in_ch, nf, scale_ratio),
        'head_0': spade_resblock_init(next(keys), 16 * nf, 16 * nf, num_in_ch),
        'g_middle_0': spade_resblock_init(next(keys), 16 * nf, 16 * nf, num_in_ch),
        'g_middle_1': spade_resblock_init(next(keys), 16 * nf, 16 * nf, num_in_ch),
        'ups': {'0': spade_resblock_init(next(keys), 16 * nf, 8 * nf, num_in_ch),
                '1': spade_resblock_init(next(keys), 8 * nf, 4 * nf, num_in_ch),
                '2': spade_resblock_init(next(keys), 4 * nf, 2 * nf, num_in_ch),
                '3': spade_resblock_init(next(keys), 2 * nf, nf, num_in_ch)},
        'to_rgbs': {str(i): conv_init(next(keys), (8 >> i) * nf, 3, 3, True)
                    for i in range(4)},
    }


def hifacegan_apply(p, x, scale_ratio=5, phase=4):
    """x (N, H, W, C) in [0,1]-ish -> (N, H, W, 3) tanh output."""
    seg = x
    h = lip_encoder_apply(p['lip_encoder'], x, scale_ratio)
    h = spade_resblock_apply(p['head_0'], h, seg)
    h = nearest_up(h, 2)
    h = spade_resblock_apply(p['g_middle_0'], h, seg)
    h = spade_resblock_apply(p['g_middle_1'], h, seg)
    for i in range(phase):
        h = nearest_up(h, 2)
        h = spade_resblock_apply(p['ups'][str(i)], h, seg)
    out = conv2d(p['to_rgbs'][str(phase - 1)], _lrelu(h))
    return jnp.tanh(out)


# ---------------------------------------------------------------------------
# multiscale discriminator
# ---------------------------------------------------------------------------

def nlayer_discriminator_init(key, input_nc, n_layers_d=4, num_feat=64,
                              spectral_norm=True):
    from bsvd_tpu.archs.discriminator_arch import _sn_conv_init
    mk = _sn_conv_init if spectral_norm else conv_init
    keys = iter(jax.random.split(key, n_layers_d + 2))
    p = {'model0': {'0': mk(next(keys), input_nc, num_feat, 4, True)}}
    nf = num_feat
    for n in range(1, n_layers_d):
        nf_prev, nf = nf, min(nf * 2, 512)
        # norm_layer(conv) => Sequential(conv(bias removed), InstanceNorm)
        p[f'model{n}'] = {'0': {'0': mk(next(keys), nf_prev, nf, 4, False)}}
    p[f'model{n_layers_d}'] = {'0': mk(next(keys), nf, 1, 4, True)}
    return p


def _nl_conv(p, x, stride, padding, aux, path):
    """Conv that is spectral-normalized when params carry a power-iteration
    'u' (training-from-scratch trees); the updated u lands in ``aux``."""
    if 'u' in p:
        from bsvd_tpu.archs.discriminator_arch import _sn_conv_apply
        y, u = _sn_conv_apply(p, x, stride=stride, padding=padding)
        aux[path] = u
        return y
    return conv2d(p, x, stride=stride, padding=padding)


def nlayer_discriminator_apply(p, x, n_layers_d=4, keep_features=True,
                               aux=None, path=''):
    aux = {} if aux is None else aux
    results = []
    h = _nl_conv(p['model0']['0'], x, 2, 2, aux, f'{path}model0.0')
    h = _lrelu(h)
    results.append(h)
    for n in range(1, n_layers_d):
        stride = 1 if n == n_layers_d - 1 else 2
        h = _nl_conv(p[f'model{n}']['0']['0'], h, stride, 2, aux,
                     f'{path}model{n}.0.0')
        h = _lrelu(_instance_norm(h))
        results.append(h)
    h = _nl_conv(p[f'model{n_layers_d}']['0'], h, 1, 2, aux,
                 f'{path}model{n_layers_d}.0')
    results.append(h)
    return results if keep_features else results[-1]


def hifacegan_discriminator_init(key, num_in_ch=3, num_out_ch=3,
                                 conditional_d=True, num_d=2, n_layers_d=4,
                                 num_feat=64):
    input_nc = num_in_ch + (num_out_ch if conditional_d else 0)
    keys = jax.random.split(key, num_d)
    return {f'discriminator_{i}': nlayer_discriminator_init(
        keys[i], input_nc, n_layers_d, num_feat) for i in range(num_d)}


def hifacegan_discriminator_apply(p, x, num_d=2, n_layers_d=4,
                                  keep_features=True, aux=None):
    result = []
    for i in range(num_d):
        result.append(nlayer_discriminator_apply(
            p[f'discriminator_{i}'], x, n_layers_d, keep_features,
            aux=aux, path=f'discriminator_{i}.'))
        x = _avg_pool_excl(x)
    return result


def sn_aux_fold(params, aux):
    """Store updated power-iteration vectors back into the param tree
    (dot-separated paths produced by the apply fns above). Pure: rebuilds
    only the dicts along each path, so it is jit-safe."""
    def upd(node, parts, u):
        if not parts:
            return dict(node, u=u)
        return dict(node, **{parts[0]: upd(node[parts[0]], parts[1:], u)})

    for path, u in aux.items():
        params = upd(params, path.split('.'), u)
    return params


# ---------------------------------------------------------------------------
# registered wrappers
# ---------------------------------------------------------------------------

@ARCH_REGISTRY.register()
class HiFaceGAN:
    def __init__(self, num_in_ch=3, num_feat=64, use_vae=False, z_dim=256,
                 crop_size=512, norm_g='spectralspadesyncbatch3x3',
                 is_train=True, init_train_phase=3, seed=0,
                 param_dtype=jnp.float32):
        del use_vae, z_dim, crop_size, norm_g
        self.scale_ratio = 5
        self.phase = (init_train_phase + 1) if is_train else 4
        self.params = jax.tree.map(
            lambda a: a.astype(param_dtype),
            hifacegan_init(jax.random.PRNGKey(seed), num_in_ch, num_feat,
                           self.scale_ratio))

    def apply(self, params, x_nchw):
        x = jnp.transpose(jnp.asarray(x_nchw), (0, 2, 3, 1))
        y = hifacegan_apply(params, x, self.scale_ratio, self.phase)
        return jnp.transpose(y, (0, 3, 1, 2))

    def __call__(self, x):
        return self.apply(self.params, x)

    def load(self, path, param_key='params'):
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        self.params = load_torch_generic(path, self.params, param_key)
        return self


@ARCH_REGISTRY.register()
class HiFaceGANDiscriminator:
    def __init__(self, num_in_ch=3, num_out_ch=3, conditional_d=True, num_d=2,
                 n_layers_d=4, num_feat=64, norm_d='spectralinstance',
                 keep_features=True, seed=0):
        del norm_d
        self.num_d = num_d
        self.n_layers_d = n_layers_d
        self.keep_features = keep_features
        self.params = hifacegan_discriminator_init(
            jax.random.PRNGKey(seed), num_in_ch, num_out_ch, conditional_d,
            num_d, n_layers_d, num_feat)

    def apply(self, params, x_nchw, train=False):
        x = jnp.transpose(jnp.asarray(x_nchw), (0, 2, 3, 1))
        aux = {}
        outs = hifacegan_discriminator_apply(params, x, self.num_d,
                                             self.n_layers_d,
                                             self.keep_features, aux=aux)
        to_nchw = lambda t: jnp.transpose(t, (0, 3, 1, 2))  # noqa: E731
        return [[to_nchw(t) for t in d] if isinstance(d, list) else to_nchw(d)
                for d in outs], (aux if train else {})

    def __call__(self, x):
        return self.apply(self.params, x)[0]

    def load(self, path, param_key='params'):
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        self.params = load_torch_generic(path, self.params, param_key)
        return self
