import sys; sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from bsvd_tpu.ops.shift_conv import shift_conv_fused, shift_conv_reference

# small correctness check on TPU
T, H, W, C, CO = 4, 30, 64, 128, 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((T, H, W, C)), jnp.float32)
w = jnp.asarray(rng.standard_normal((3,3,C,CO))*0.05, jnp.float32)
b = jnp.asarray(rng.standard_normal(CO)*0.1, jnp.float32)

ref = shift_conv_reference(x, w, b, t_len=T)
got = shift_conv_fused(x, w, b, t_len=T)
d = float(jnp.max(jnp.abs(got - ref)))
print('fp32 max diff:', d)
# bf16
xb, wb, bb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
ref = shift_conv_reference(xb, wb, bb, t_len=T)
got = shift_conv_fused(xb, wb, bb, t_len=T)
print('bf16 max diff:', float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))))
# causal
ref = shift_conv_reference(x, w, b, t_len=T, causal=True)
got = shift_conv_fused(x, w, b, t_len=T, causal=True)
print('causal max diff:', float(jnp.max(jnp.abs(got - ref))))
# 2 clips (N=2)
x2 = jnp.asarray(rng.standard_normal((8, H, W, C)), jnp.float32)
ref = shift_conv_reference(x2, w, b, t_len=4)
got = shift_conv_fused(x2, w, b, t_len=4)
print('N=2 max diff:', float(jnp.max(jnp.abs(got - ref))))

# gen-2 plain conv variants (stems/up-path) + width folding, on-chip
from bsvd_tpu.ops.conv3x3 import _conv3x3_xla, conv3x3_pallas

ref = _conv3x3_xla(x, w, b, 'relu6')
got = conv3x3_pallas(x, w, b, shift='none', act='relu6')
print('plain C=128 max diff:', float(jnp.max(jnp.abs(got - ref))))

x64 = jnp.asarray(rng.standard_normal((2, 16, 64, 64)), jnp.float32)
w64 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.float32)
b64 = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
ref = _conv3x3_xla(x64, w64, b64, 'relu6')
got = conv3x3_pallas(x64, w64, b64, shift='none', act='relu6')
print('width-folded C=64 max diff:', float(jnp.max(jnp.abs(got - ref))))

# NT=1 row-block variant (streaming path)
x1f = jnp.asarray(rng.standard_normal((1, 30, 64, 128)), jnp.float32)
ref = _conv3x3_xla(x1f, w, b, 'relu6')
got = conv3x3_pallas(x1f, w, b, shift='none', act='relu6')
print('NT=1 row-block max diff:', float(jnp.max(jnp.abs(got - ref))))

# fused second input (skip-add)
x1g = jnp.asarray(rng.standard_normal((1, 30, 64, 128)), jnp.float32)
ref = _conv3x3_xla(x1f + x1g, w, b, 'relu6')
got = conv3x3_pallas(x1f, w, b, x1g, shift='none', act='relu6')
print('fused-add max diff:', float(jnp.max(jnp.abs(got - ref))))

# folded stride-2 down kernel
from bsvd_tpu.ops.conv_s2 import _conv_s2_xla, conv_s2_pallas
ws2 = jnp.asarray(rng.standard_normal((3, 2, 128, 128)) * 0.05, jnp.float32)
ref = _conv_s2_xla(x, ws2, b, 'relu6')
got = conv_s2_pallas(x, ws2, b, act='relu6')
print('stride-2 max diff:', float(jnp.max(jnp.abs(got - ref))))

# rolling-intermediate chained pair
from bsvd_tpu.ops.conv_chain import _chain_xla, conv_chain_pallas
w2c = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
b2c = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)
ref = _chain_xla(x, w, b, w2c, b2c, 'relu6', 'none')
got = conv_chain_pallas(x, w, b, w2c, b2c, act1='relu6', act2='none')
print('chain max diff:', float(jnp.max(jnp.abs(got - ref))))
