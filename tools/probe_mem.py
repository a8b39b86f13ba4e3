import time, json
import numpy as np
from bsvd_tpu.utils.platform import setup_compilation_cache
setup_compilation_cache()
import jax, jax.numpy as jnp
from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init, wnet_apply

cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                 norm='none', act='relu6', shift_mode='TSM')
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      wnet_init(jax.random.PRNGKey(0), cfg))
d = jax.devices()[0]
print('platform', d.platform)
try:
    ms = d.memory_stats()
    print('mem_stats keys:', sorted(ms.keys()) if ms else None)
except Exception as e:
    print('memory_stats failed:', e)

n, t, h, w, c = 1, 10, 540, 960, 4
x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (n, t, h, w, c)), jnp.bfloat16)
fwd = jax.jit(lambda p, x: wnet_apply(p, x, cfg))
y = fwd(params, x)
float(jnp.sum(y.astype(jnp.float32)))
try:
    ms = d.memory_stats()
    if ms:
        print('peak_bytes_in_use:', ms.get('peak_bytes_in_use'))
        print('bytes_in_use:', ms.get('bytes_in_use'))
except Exception as e:
    print('memory_stats failed post:', e)
# compiled memory analysis
try:
    ma = fwd.lower(params, x).compile().memory_analysis()
    print('memory_analysis:', ma)
except Exception as e:
    print('memory_analysis failed:', e)
