import time
import numpy as np
from bsvd_tpu.utils.platform import setup_compilation_cache
setup_compilation_cache()
import jax, jax.numpy as jnp
from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init
from bsvd_tpu.archs.streaming import StreamDenoiser

cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                 norm='none', act='relu6', shift_mode='TSM')
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      wnet_init(jax.random.PRNGKey(0), cfg))
h, w = 540, 960
ssum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
for b in (2, 4):
    sd = StreamDenoiser(params, cfg, batch=b, height=h, width=w, dtype=jnp.bfloat16)
    frame = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (b, h, w, cfg.effective_in_ch)), jnp.bfloat16)
    out = None
    for _ in range(sd.latency + 4):
        o = sd.push(frame)
        out = o if o is not None else out
    float(ssum(out))
    best = float('inf')
    for _ in range(3):
        k = 10
        t0 = time.perf_counter()
        for _ in range(k):
            out = sd.push(frame)
        float(ssum(out))
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"B={b}: {best*1e3:.2f} ms/step -> {b/best:.1f} aggregate fps, {1/best:.1f} fps/stream")
