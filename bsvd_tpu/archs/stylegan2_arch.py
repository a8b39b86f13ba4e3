"""StyleGAN2 generator + discriminator, functional
(reference: BasicSR/basicsr/archs/stylegan2_arch.py:12-800; the CUDA
upfirdn2d / fused_act extensions are replaced by the XLA-native ops in
bsvd_tpu/ops/stylegan_ops.py).

Per-sample modulated convolutions vmap over the batch (the reference's
groups=b trick is a CUDA-ism; vmap compiles to the same batched contraction
on the MXU). Param trees mirror torch names; the modulated-conv weight keeps
the torch (1, cout, cin, k, k) layout so released checkpoints convert
untouched.
"""

import math

import jax
import jax.numpy as jnp
from jax import lax

from bsvd_tpu.ops.stylegan_ops import fused_leaky_relu, make_resample_kernel, upfirdn2d
from bsvd_tpu.utils.registry import ARCH_REGISTRY

_CHANNELS = lambda mult, narrow: {  # noqa: E731
    '4': int(512 * narrow), '8': int(512 * narrow), '16': int(512 * narrow),
    '32': int(512 * narrow), '64': int(256 * mult * narrow),
    '128': int(128 * mult * narrow), '256': int(64 * mult * narrow),
    '512': int(32 * mult * narrow), '1024': int(16 * mult * narrow)}


def norm_style_code(x):
    return x * lax.rsqrt(jnp.mean(x**2, axis=1, keepdims=True) + 1e-8)


# ---------------------------------------------------------------------------
# equalized layers
# ---------------------------------------------------------------------------

def equal_linear_init(key, cin, cout, bias=True, bias_init_val=0., lr_mul=1.):
    # (in, out) layout — what the generic torch converter produces
    p = {'w': jax.random.normal(key, (cin, cout)) / lr_mul}
    if bias:
        p['b'] = jnp.full((cout,), float(bias_init_val))
    return p


def equal_linear(p, x, lr_mul=1., activation=None):
    cin = p['w'].shape[0]
    scale = (1 / math.sqrt(cin)) * lr_mul
    bias = p.get('b')
    bias = bias * lr_mul if bias is not None else None
    out = x @ (p['w'] * scale)
    if activation == 'fused_lrelu':
        return fused_leaky_relu(out, bias)
    if bias is not None:
        out = out + bias
    return out


def equal_conv2d(p, x, stride=1, padding=0):
    """x NHWC; p['w'] HWIO (the layout the torch converter produces)."""
    w = p['w']
    k, _, cin, cout = w.shape
    scale = 1 / math.sqrt(cin * k * k)
    wh = w * scale
    y = lax.conv_general_dilated(x, wh, (stride, stride),
                                 [(padding, padding), (padding, padding)],
                                 dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if 'b' in p:
        y = y + p['b']
    return y


def _smooth_pad(resample_kernel, up, down, kernel_size):
    k = make_resample_kernel(resample_kernel)
    if up > 1:
        k = k * (up ** 2)
        pad = (k.shape[0] - up) - (kernel_size - 1)
        return k, ((pad + 1) // 2 + up - 1, pad // 2 + 1)
    pad = (k.shape[0] - down) + (kernel_size - 1)
    return k, ((pad + 1) // 2, pad // 2)


# ---------------------------------------------------------------------------
# modulated conv
# ---------------------------------------------------------------------------

def modulated_conv2d(p, x, style, demodulate=True, sample_mode=None,
                     resample_kernel=(1, 3, 3, 1), eps=1e-8):
    """x (B, H, W, Cin); style (B, num_style_feat);
    p: {'w': (1, cout, cin, k, k) torch layout, 'modulation': linear}."""
    b, h, w_, cin = x.shape
    weight = p['w']
    _, cout, _, k, _ = weight.shape
    scale = 1 / math.sqrt(cin * k * k)

    s = equal_linear(p['modulation'], style).reshape(b, 1, cin, 1, 1)
    wgt = scale * weight * s                               # (b, cout, cin, k, k)
    if demodulate:
        demod = lax.rsqrt(jnp.sum(wgt**2, axis=(2, 3, 4)) + eps)
        wgt = wgt * demod.reshape(b, cout, 1, 1, 1)
    if sample_mode == 'upsample':
        # torch conv_transpose2d(w (in,out,k,k)) == lax.conv_transpose with
        # rhs (k, k, OUT, IN) + transpose_kernel=True (verified vs torch)
        wgt_t = jnp.transpose(wgt, (0, 3, 4, 1, 2))        # (b, k, k, cout, cin)

        def one(xi, wi):
            return lax.conv_transpose(xi[None], wi, (2, 2), 'VALID',
                                      dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                      transpose_kernel=True)[0]
        out = jax.vmap(one)(x, wgt_t)
        kern, pad = _smooth_pad(resample_kernel, 2, 1, k)
        return upfirdn2d(out, kern, up=1, down=1, pad=pad)

    wgt = jnp.transpose(wgt, (0, 3, 4, 2, 1))              # (b, k, k, cin, cout)
    if sample_mode == 'downsample':
        kern, pad = _smooth_pad(resample_kernel, 1, 2, k)
        x = upfirdn2d(x, kern, up=1, down=1, pad=pad)

        def one(xi, wi):
            return lax.conv_general_dilated(
                xi[None], wi, (2, 2), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]
        return jax.vmap(one)(x, wgt)

    def one(xi, wi):
        return lax.conv_general_dilated(
            xi[None], wi, (1, 1), [(k // 2, k // 2), (k // 2, k // 2)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]
    return jax.vmap(one)(x, wgt)


def _mod_conv_init(key, cin, cout, k, num_style_feat):
    k1, k2 = jax.random.split(key)
    return {'w': jax.random.normal(k1, (1, cout, cin, k, k)),
            'modulation': equal_linear_init(k2, num_style_feat, cin, True, 1.)}


def style_conv_init(key, cin, cout, k, num_style_feat):
    km, _ = jax.random.split(key)
    return {'modulated_conv': _mod_conv_init(km, cin, cout, k, num_style_feat),
            'w': jnp.zeros((1,)),                    # noise strength
            'activate': {'b': jnp.zeros((cout,))}}


def style_conv(p, x, style, noise, sample_mode, resample_kernel):
    out = modulated_conv2d(p['modulated_conv'], x, style, True, sample_mode,
                           resample_kernel)
    if noise is None:
        raise ValueError('pass explicit noise (use make_noise / stored noises)')
    out = out + p['w'] * noise
    return fused_leaky_relu(out, p['activate']['b'])


def to_rgb_init(key, cin, num_style_feat):
    return {'modulated_conv': _mod_conv_init(key, cin, 3, 1, num_style_feat),
            'b': jnp.zeros((1, 1, 1, 3))}


def to_rgb(p, x, style, skip=None, upsample=True, resample_kernel=(1, 3, 3, 1)):
    out = modulated_conv2d(p['modulated_conv'], x, style, demodulate=False)
    out = out + p['b']
    if skip is not None:
        if upsample:
            kern = make_resample_kernel(resample_kernel) * 4
            pad = kern.shape[0] - 2
            skip = upfirdn2d(skip, kern, up=2, down=1,
                             pad=((pad + 1) // 2 + 1, pad // 2))
        out = out + skip
    return out


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

def stylegan2_generator_init(key, out_size, num_style_feat=512, num_mlp=8,
                             channel_multiplier=2, narrow=1):
    channels = _CHANNELS(channel_multiplier, narrow)
    log_size = int(math.log2(out_size))
    num_layers = (log_size - 2) * 2 + 1
    keys = iter(jax.random.split(key, num_mlp + 3 * num_layers + 16))

    p = {'style_mlp': {str(i + 1): equal_linear_init(next(keys), num_style_feat,
                                                     num_style_feat)
                       for i in range(num_mlp)},
         'constant_input': {'w': jax.random.normal(next(keys),
                                                   (1, 4, 4, channels['4']))},
         'style_conv1': style_conv_init(next(keys), channels['4'],
                                        channels['4'], 3, num_style_feat),
         'to_rgb1': to_rgb_init(next(keys), channels['4'], num_style_feat),
         'style_convs': {}, 'to_rgbs': {}, 'noises': {}}
    for layer_idx in range(num_layers):
        res = 2 ** ((layer_idx + 5) // 2)
        p['noises'][f'noise{layer_idx}'] = jax.random.normal(
            next(keys), (1, res, res, 1))
    cin = channels['4']
    idx = 0
    for i in range(3, log_size + 1):
        cout = channels[f'{2**i}']
        p['style_convs'][str(idx)] = style_conv_init(next(keys), cin, cout, 3,
                                                     num_style_feat)
        p['style_convs'][str(idx + 1)] = style_conv_init(next(keys), cout,
                                                         cout, 3, num_style_feat)
        p['to_rgbs'][str(i - 3)] = to_rgb_init(next(keys), cout, num_style_feat)
        cin = cout
        idx += 2
    return p


def style_mlp_apply(p, x, lr_mlp=0.01):
    x = norm_style_code(x)
    for i in range(len(p)):
        x = equal_linear(p[str(i + 1)], x, lr_mul=lr_mlp,
                         activation='fused_lrelu')
    return x


def stylegan2_generator_apply(p, styles, out_size, input_is_latent=False,
                              noise=None, randomize_noise=True, noise_key=None,
                              truncation=1, truncation_latent=None,
                              inject_index=None, lr_mlp=0.01,
                              resample_kernel=(1, 3, 3, 1)):
    """styles: list of (B, num_style_feat) codes. Returns (image NHWC, latent).

    ``randomize_noise`` draws per-layer noise from ``noise_key``; otherwise
    the stored buffers in p['noises'] are used (reference semantics)."""
    log_size = int(math.log2(out_size))
    num_layers = (log_size - 2) * 2 + 1
    num_latent = log_size * 2 - 2

    if not input_is_latent:
        styles = [style_mlp_apply(p['style_mlp'], s, lr_mlp) for s in styles]

    b = styles[0].shape[0]
    if noise is None:
        if randomize_noise:
            if noise_key is None:
                raise ValueError('randomize_noise=True needs noise_key')
            keys = jax.random.split(noise_key, num_layers)
            noise = []
            for layer_idx in range(num_layers):
                res = 2 ** ((layer_idx + 5) // 2)
                noise.append(jax.random.normal(keys[layer_idx],
                                               (b, res, res, 1)))
        else:
            noise = [p['noises'][f'noise{i}'] for i in range(num_layers)]

    if truncation < 1:
        styles = [truncation_latent + truncation * (s - truncation_latent)
                  for s in styles]

    if len(styles) == 1:
        inject_index = num_latent
        if styles[0].ndim < 3:
            latent = jnp.repeat(styles[0][:, None], inject_index, axis=1)
        else:
            latent = styles[0]
    else:
        if inject_index is None:
            inject_index = num_latent // 2
        latent1 = jnp.repeat(styles[0][:, None], inject_index, axis=1)
        latent2 = jnp.repeat(styles[1][:, None], num_latent - inject_index, axis=1)
        latent = jnp.concatenate([latent1, latent2], axis=1)

    out = jnp.tile(p['constant_input']['w'], (b, 1, 1, 1))
    out = style_conv(p['style_conv1'], out, latent[:, 0], noise[0], None,
                     resample_kernel)
    skip = to_rgb(p['to_rgb1'], out, latent[:, 1], None, upsample=False)

    i = 1
    n_pairs = len(p['to_rgbs'])
    for pi in range(n_pairs):
        out = style_conv(p['style_convs'][str(2 * pi)], out, latent[:, i],
                         noise[2 * pi + 1], 'upsample', resample_kernel)
        out = style_conv(p['style_convs'][str(2 * pi + 1)], out,
                         latent[:, i + 1], noise[2 * pi + 2], None,
                         resample_kernel)
        skip = to_rgb(p['to_rgbs'][str(pi)], out, latent[:, i + 2], skip,
                      upsample=True, resample_kernel=resample_kernel)
        i += 2
    return skip, latent


# ---------------------------------------------------------------------------
# discriminator
# ---------------------------------------------------------------------------

def _conv_layer_init(key, cin, cout, k, bias=True, activate=True):
    p = {}
    kc, = jax.random.split(key, 1)
    conv = {'w': jax.random.normal(kc, (k, k, cin, cout))}
    if bias and not activate:
        conv['b'] = jnp.zeros((cout,))
    p['conv'] = conv
    if activate and bias:
        p['act_bias'] = jnp.zeros((cout,))
    return p


def _conv_layer(p, x, k, downsample=False, bias=True, activate=True,
                resample_kernel=(1, 3, 3, 1)):
    if downsample:
        kern, pad = _smooth_pad(resample_kernel, 1, 2, k)
        x = upfirdn2d(x, kern, up=1, down=1, pad=pad)
        x = equal_conv2d(p['conv'], x, stride=2, padding=0)
    else:
        x = equal_conv2d(p['conv'], x, stride=1, padding=k // 2)
    if activate:
        if bias:
            x = fused_leaky_relu(x, p['act_bias'])
        else:
            x = jnp.where(x >= 0, x, 0.2 * x) * math.sqrt(2)
    return x


def stylegan2_discriminator_init(key, out_size, channel_multiplier=2, narrow=1):
    channels = _CHANNELS(channel_multiplier, narrow)
    log_size = int(math.log2(out_size))
    keys = iter(jax.random.split(key, 3 * log_size + 8))
    p = {'conv_body': {'0': _conv_layer_init(next(keys), 3,
                                             channels[f'{out_size}'], 1)}}
    cin = channels[f'{out_size}']
    bi = 1
    for i in range(log_size, 2, -1):
        cout = channels[f'{2**(i - 1)}']
        p['conv_body'][str(bi)] = {
            'conv1': _conv_layer_init(next(keys), cin, cin, 3),
            'conv2': _conv_layer_init(next(keys), cin, cout, 3),
            'skip': _conv_layer_init(next(keys), cin, cout, 1, bias=False,
                                     activate=False),
        }
        cin = cout
        bi += 1
    p['final_conv'] = _conv_layer_init(next(keys), cin + 1, channels['4'], 3)
    p['final_linear'] = {
        '0': equal_linear_init(next(keys), channels['4'] * 4 * 4, channels['4']),
        '1': equal_linear_init(next(keys), channels['4'], 1),
    }
    return p


def stylegan2_discriminator_apply(p, x, stddev_group=4,
                                  resample_kernel=(1, 3, 3, 1)):
    """x (B, H, W, 3) -> (B, 1) logits."""
    out = _conv_layer(p['conv_body']['0'], x, 1)
    n_blocks = len(p['conv_body']) - 1
    for bi in range(1, n_blocks + 1):
        blk = p['conv_body'][str(bi)]
        h = _conv_layer(blk['conv1'], out, 3)
        h = _conv_layer(blk['conv2'], h, 3, downsample=True,
                        resample_kernel=resample_kernel)
        skip = _conv_layer(blk['skip'], out, 1, downsample=True, bias=False,
                           activate=False, resample_kernel=resample_kernel)
        out = (h + skip) / math.sqrt(2)

    b, h, w, c = out.shape
    group = min(b, stddev_group)
    grouped = out.reshape(group, -1, h, w, c)
    stddev = jnp.sqrt(jnp.var(grouped, axis=0) + 1e-8)
    stddev = jnp.mean(stddev, axis=(1, 2, 3), keepdims=True)   # (b/g,1,1,1)
    stddev = jnp.tile(stddev, (group, h, w, 1))
    out = jnp.concatenate([out, stddev], axis=-1)

    out = _conv_layer(p['final_conv'], out, 3)
    # torch flatten order: channel-major
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, -1)
    out = equal_linear(p['final_linear']['0'], out, activation='fused_lrelu')
    return equal_linear(p['final_linear']['1'], out)


# ---------------------------------------------------------------------------
# registered wrappers
# ---------------------------------------------------------------------------

@ARCH_REGISTRY.register()
class StyleGAN2Generator:
    def __init__(self, out_size, num_style_feat=512, num_mlp=8,
                 channel_multiplier=2, resample_kernel=(1, 3, 3, 1),
                 lr_mlp=0.01, narrow=1, seed=0):
        self.out_size = out_size
        self.num_style_feat = num_style_feat
        self.lr_mlp = lr_mlp
        self.resample_kernel = tuple(resample_kernel)
        log_size = int(math.log2(out_size))
        self.num_latent = log_size * 2 - 2
        self.num_layers = (log_size - 2) * 2 + 1
        self.params = stylegan2_generator_init(
            jax.random.PRNGKey(seed), out_size, num_style_feat, num_mlp,
            channel_multiplier, narrow)

    def apply(self, params, styles, **kw):
        img, latent = stylegan2_generator_apply(
            params, styles, self.out_size, lr_mlp=self.lr_mlp,
            resample_kernel=self.resample_kernel, **kw)
        return jnp.transpose(img, (0, 3, 1, 2)), latent

    def __call__(self, styles, **kw):
        """styles: list of (B, num_style_feat) -> (B, 3, out, out) NCHW."""
        return self.apply(self.params, styles, **kw)

    def get_latent(self, x):
        return style_mlp_apply(self.params['style_mlp'], x, self.lr_mlp)

    def mean_latent(self, num_latent, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        z = jax.random.normal(key, (num_latent, self.num_style_feat))
        return jnp.mean(self.get_latent(z), axis=0, keepdims=True)

    def load(self, path, param_key='params'):
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        self.params = load_torch_generic(path, self.params, param_key)
        return self


@ARCH_REGISTRY.register()
class StyleGAN2Discriminator:
    def __init__(self, out_size, channel_multiplier=2,
                 resample_kernel=(1, 3, 3, 1), stddev_group=4, narrow=1,
                 seed=0):
        self.stddev_group = stddev_group
        self.resample_kernel = tuple(resample_kernel)
        self.params = stylegan2_discriminator_init(
            jax.random.PRNGKey(seed), out_size, channel_multiplier, narrow)

    def apply(self, params, x_nchw, train=False):
        del train
        x = jnp.transpose(jnp.asarray(x_nchw), (0, 2, 3, 1))
        return stylegan2_discriminator_apply(params, x, self.stddev_group,
                                             self.resample_kernel), {}

    def __call__(self, x):
        return self.apply(self.params, x)[0]

    def load(self, path, param_key='params'):
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        self.params = load_torch_generic(path, self.params, param_key)
        return self


def convert_stylegan2_state(state):
    """torch StyleGAN2 state dict -> param tree (handles the non-conv leaves
    the generic mapper mis-transposes: constant input, noise buffers, to_rgb
    bias, noise-strength scalars, modulated 5D weights)."""
    import numpy as np
    from bsvd_tpu.convert.torch_generic import state_dict_to_tree

    fixed = {}
    for key, val in state.items():
        v = np.asarray(val)
        if key.endswith('constant_input.weight'):
            fixed[key.replace('.weight', '.w')] = np.transpose(v, (0, 2, 3, 1))
        elif '.noises.' in key or key.startswith('noises.'):
            fixed[key] = np.transpose(v, (0, 2, 3, 1))
        elif key.endswith('.bias') and v.ndim == 4:       # to_rgb bias (1,3,1,1)
            fixed[key] = np.transpose(v, (0, 2, 3, 1))
        elif v.ndim in (0, 1) and key.endswith('.weight') and v.size == 1:
            fixed[key.replace('.weight', '.w')] = v.reshape(1)  # noise strength
        elif key.endswith('.weight') and v.ndim == 5:
            fixed[key] = v                                 # modulated conv, keep
        else:
            fixed[key] = v
    tree = state_dict_to_tree(fixed)

    def rename(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == 'activate':
                out[k] = {'b': v['b']} if 'b' in v else v
            else:
                out[k] = rename(v)
        return out
    return rename(tree)
