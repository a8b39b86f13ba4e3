"""SwinIR — image restoration with Swin Transformer, functional
(reference: BasicSR/basicsr/archs/swinir_arch.py:14-925).

Window attention maps beautifully onto the TPU: every window is an
independent (win*win, C) matmul batch for the MXU, the cyclic shift is a
roll, and all shapes are static under jit. Param trees mirror torch names
(layers.N.residual_group.blocks.M.attn.qkv...) so released SwinIR
checkpoints convert via the generic key mapper. Inference path (dropout and
stochastic depth are identity at eval; training can add them later).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from bsvd_tpu.archs.sr_archs import _upsample_apply, _upsample_init, nearest_up
from bsvd_tpu.nn.layers import conv2d, conv_init, pixel_shuffle
from bsvd_tpu.utils.registry import ARCH_REGISTRY


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def _linear_init(key, din, dout, bias=True):
    kw, _ = jax.random.split(key)
    p = {'w': _trunc_normal(kw, (din, dout))}
    if bias:
        p['b'] = jnp.zeros((dout,))
    return p


def _linear(p, x):
    y = x @ p['w']
    if 'b' in p:
        y = y + p['b']
    return y


def _ln_init(dim):
    return {'w': jnp.ones((dim,)), 'b': jnp.zeros((dim,))}


def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p['w'] + p['b']


def window_partition(x, ws):
    """(B, H, W, C) -> (B*nW, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, c)


def window_reverse(windows, ws, h, w):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, -1)


def _relative_position_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij'))           # 2, ws, ws
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                       # (ws*ws, ws*ws)


def _attn_mask(h, w, ws, shift):
    """SW-MSA mask (numpy at trace time; shapes are static)."""
    img_mask = np.zeros((h, w))
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for hs, wsl in itertools.product(slices, slices):
        img_mask[hs, wsl] = cnt
        cnt += 1
    mw = window_partition(jnp.asarray(img_mask[None, :, :, None]), ws)
    mw = np.asarray(mw).reshape(-1, ws * ws)
    mask = mw[:, None, :] - mw[:, :, None]
    return jnp.asarray(np.where(mask != 0, -100.0, 0.0), jnp.float32)


def _window_attention_init(key, dim, ws, num_heads):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        'relative_position_bias_table': _trunc_normal(
            k1, ((2 * ws - 1) * (2 * ws - 1), num_heads)),
        'qkv': _linear_init(k2, dim, dim * 3),
        'proj': _linear_init(k3, dim, dim),
    }


def _window_attention(p, x, ws, num_heads, mask=None):
    """x: (B_, N, C) windows; mask: (nW, N, N) or None."""
    b_, n, c = x.shape
    hd = c // num_heads
    qkv = _linear(p['qkv'], x).reshape(b_, n, 3, num_heads, hd)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (hd ** -0.5)
    attn = q @ jnp.swapaxes(k, -2, -1)                       # (B_, nH, N, N)

    idx = _relative_position_index(ws).reshape(-1)
    bias = p['relative_position_bias_table'][idx].reshape(n, n, num_heads)
    attn = attn + jnp.transpose(bias, (2, 0, 1))[None]

    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, num_heads, n, n) + \
            mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(-1, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.swapaxes(attn @ v, 1, 2).reshape(b_, n, c)
    return _linear(p['proj'], out)


def _block_init(key, dim, num_heads, ws, mlp_ratio):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hidden = int(dim * mlp_ratio)
    return {
        'norm1': _ln_init(dim),
        'attn': _window_attention_init(k1, dim, ws, num_heads),
        'norm2': _ln_init(dim),
        'mlp': {'fc1': _linear_init(k2, dim, hidden),
                'fc2': _linear_init(k3, hidden, dim)},
    }


def _block_apply(p, x, x_size, dim, num_heads, ws, shift):
    h, w = x_size
    b, _, c = x.shape
    if min(h, w) <= ws:
        shift, ws = 0, min(h, w)

    shortcut = x
    x = _ln(p['norm1'], x).reshape(b, h, w, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    xw = window_partition(x, ws).reshape(-1, ws * ws, c)
    mask = _attn_mask(h, w, ws, shift) if shift > 0 else None
    aw = _window_attention(p['attn'], xw, ws, num_heads, mask)
    x = window_reverse(aw.reshape(-1, ws, ws, c), ws, h, w)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = shortcut + x.reshape(b, h * w, c)

    y = _ln(p['norm2'], x)
    y = _linear(p['mlp']['fc2'],
                jax.nn.gelu(_linear(p['mlp']['fc1'], y), approximate=False))
    return x + y


def _rstb_init(key, dim, depth, num_heads, ws, mlp_ratio, resi_connection):
    keys = jax.random.split(key, depth + 3)
    p = {'residual_group': {'blocks': {
        str(i): _block_init(keys[i], dim, num_heads, ws, mlp_ratio)
        for i in range(depth)}}}
    if resi_connection == '1conv':
        p['conv'] = conv_init(keys[depth], dim, dim, 3, True)
    else:
        p['conv'] = {'0': conv_init(keys[depth], dim, dim // 4, 3, True),
                     '2': conv_init(keys[depth + 1], dim // 4, dim // 4, 1, True),
                     '4': conv_init(keys[depth + 2], dim // 4, dim, 3, True)}
    return p


def _resi_conv(p, x, resi_connection):
    if resi_connection == '1conv':
        return conv2d(p, x)

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)
    x = lrelu(conv2d(p['0'], x))
    x = lrelu(conv2d(p['2'], x, padding=0))
    return conv2d(p['4'], x)


def _rstb_apply(p, x, x_size, dim, num_heads, ws, mlp_ratio, resi_connection):
    h, w = x_size
    b = x.shape[0]
    y = x
    blocks = p['residual_group']['blocks']
    for i in range(len(blocks)):
        shift = 0 if i % 2 == 0 else ws // 2
        y = _block_apply(blocks[str(i)], y, x_size, dim, num_heads, ws, shift)
    img = y.reshape(b, h, w, dim)
    img = _resi_conv(p['conv'], img, resi_connection)
    return img.reshape(b, h * w, dim) + x


def swinir_init(key, in_chans=3, embed_dim=96, depths=(6, 6, 6, 6),
                num_heads=(6, 6, 6, 6), window_size=7, mlp_ratio=4.,
                patch_norm=True, upscale=2, upsampler='',
                resi_connection='1conv', num_feat=64):
    keys = jax.random.split(key, len(depths) + 8)
    p = {'conv_first': conv_init(keys[0], in_chans, embed_dim, 3, True),
         'layers': {str(i): _rstb_init(keys[1 + i], embed_dim, depths[i],
                                       num_heads[i], window_size, mlp_ratio,
                                       resi_connection)
                    for i in range(len(depths))},
         'norm': _ln_init(embed_dim)}
    if patch_norm:
        p['patch_embed'] = {'norm': _ln_init(embed_dim)}
    k = keys[len(depths) + 1:]
    if resi_connection == '1conv':
        p['conv_after_body'] = conv_init(k[0], embed_dim, embed_dim, 3, True)
    else:
        p['conv_after_body'] = {
            '0': conv_init(k[0], embed_dim, embed_dim // 4, 3, True),
            '2': conv_init(k[1], embed_dim // 4, embed_dim // 4, 1, True),
            '4': conv_init(k[2], embed_dim // 4, embed_dim, 3, True)}
    if upsampler == 'pixelshuffle':
        p['conv_before_upsample'] = {'0': conv_init(k[3], embed_dim, num_feat, 3, True)}
        p['upsample'] = _upsample_init(k[4], upscale, num_feat)
        p['conv_last'] = conv_init(k[5], num_feat, in_chans, 3, True)
    elif upsampler == 'pixelshuffledirect':
        p['upsample'] = {'0': conv_init(k[3], embed_dim,
                                        in_chans * upscale * upscale, 3, True)}
    elif upsampler == 'nearest+conv':
        p['conv_before_upsample'] = {'0': conv_init(k[3], embed_dim, num_feat, 3, True)}
        p['conv_up1'] = conv_init(k[4], num_feat, num_feat, 3, True)
        p['conv_up2'] = conv_init(k[5], num_feat, num_feat, 3, True)
        p['conv_hr'] = conv_init(k[6], num_feat, num_feat, 3, True)
        p['conv_last'] = conv_init(k[7], num_feat, in_chans, 3, True)
    else:
        p['conv_last'] = conv_init(k[3], embed_dim, in_chans, 3, True)
    return p


def _forward_features(p, x, cfg):
    """x: (B, H, W, C_embed) -> same, through the RSTB stack."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    if 'patch_embed' in p:
        tokens = _ln(p['patch_embed']['norm'], tokens)
    for i in range(len(p['layers'])):
        tokens = _rstb_apply(p['layers'][str(i)], tokens, (h, w), c,
                             cfg['num_heads'][i], cfg['window_size'],
                             cfg['mlp_ratio'], cfg['resi_connection'])
    tokens = _ln(p['norm'], tokens)
    return tokens.reshape(b, h, w, c)


def swinir_apply(p, x, *, in_chans=3, window_size=7, num_heads=(6, 6, 6, 6),
                 mlp_ratio=4., upscale=2, img_range=1., upsampler='',
                 resi_connection='1conv'):
    """x: (N, H, W, C) in [0,1], H/W multiples of window_size."""
    cfg = dict(window_size=window_size, num_heads=num_heads,
               mlp_ratio=mlp_ratio, resi_connection=resi_connection)
    if in_chans == 3:
        mean = jnp.asarray((0.4488, 0.4371, 0.4040), x.dtype).reshape(1, 1, 1, 3)
    else:
        mean = jnp.zeros((1, 1, 1, 1), x.dtype)
    x = (x - mean) * img_range

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.01 * v)  # nn.LeakyReLU() default slope

    if upsampler == 'pixelshuffle':
        feat = conv2d(p['conv_first'], x)
        feat = _resi_conv(p['conv_after_body'],
                          _forward_features(p, feat, cfg), resi_connection) + feat
        feat = lrelu(conv2d(p['conv_before_upsample']['0'], feat))
        out = conv2d(p['conv_last'], _upsample_apply(p['upsample'], feat, upscale))
    elif upsampler == 'pixelshuffledirect':
        feat = conv2d(p['conv_first'], x)
        feat = _resi_conv(p['conv_after_body'],
                          _forward_features(p, feat, cfg), resi_connection) + feat
        out = pixel_shuffle(conv2d(p['upsample']['0'], feat), upscale)
    elif upsampler == 'nearest+conv':
        def lrelu2(v):
            return jnp.where(v >= 0, v, 0.2 * v)
        feat = conv2d(p['conv_first'], x)
        feat = _resi_conv(p['conv_after_body'],
                          _forward_features(p, feat, cfg), resi_connection) + feat
        feat = lrelu(conv2d(p['conv_before_upsample']['0'], feat))
        feat = lrelu2(conv2d(p['conv_up1'], nearest_up(feat, 2)))
        feat = lrelu2(conv2d(p['conv_up2'], nearest_up(feat, 2)))
        out = conv2d(p['conv_last'], lrelu2(conv2d(p['conv_hr'], feat)))
    else:
        feat = conv2d(p['conv_first'], x)
        res = _resi_conv(p['conv_after_body'],
                         _forward_features(p, feat, cfg), resi_connection) + feat
        out = x + conv2d(p['conv_last'], res)

    return out / img_range + mean


@ARCH_REGISTRY.register()
class SwinIR:
    def __init__(self, img_size=64, patch_size=1, in_chans=3, embed_dim=96,
                 depths=(6, 6, 6, 6), num_heads=(6, 6, 6, 6), window_size=7,
                 mlp_ratio=4., upscale=2, img_range=1., upsampler='',
                 resi_connection='1conv', seed=0, param_dtype=jnp.float32,
                 **kwargs):
        del img_size, patch_size, kwargs
        self.opt = dict(in_chans=in_chans, window_size=window_size,
                        num_heads=tuple(num_heads), mlp_ratio=mlp_ratio,
                        upscale=upscale, img_range=img_range,
                        upsampler=upsampler, resi_connection=resi_connection)
        self.window_size = window_size
        self.upscale = upscale
        self.params = jax.tree.map(
            lambda a: a.astype(param_dtype),
            swinir_init(jax.random.PRNGKey(seed), in_chans, embed_dim,
                        tuple(depths), tuple(num_heads), window_size,
                        mlp_ratio, True, upscale, upsampler, resi_connection))

    def apply(self, params, x_nchw):
        """Pads H/W to window multiples with reflection (reference
        SwinIRModel.test pre-pad), runs, and crops back."""
        x = jnp.transpose(jnp.asarray(x_nchw), (0, 2, 3, 1))
        n, h, w, c = x.shape
        ws = self.window_size
        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode='reflect')
        y = swinir_apply(params, x, **self.opt)
        y = y[:, :h * self.upscale, :w * self.upscale]
        return jnp.transpose(y, (0, 3, 1, 2))

    def __call__(self, x):
        return self.apply(self.params, x)

    def load(self, path, param_key='params'):
        from bsvd_tpu.convert.torch_generic import load_torch_generic
        # (released ckpts also carry relative_position_index / attn_mask
        # buffers — recomputed here, ignored by the template-driven loader)
        self.params = load_torch_generic(path, self.params, param_key)
        return self
