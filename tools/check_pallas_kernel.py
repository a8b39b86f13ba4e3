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
