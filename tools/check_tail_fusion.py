#!/usr/bin/env python
"""On-chip equivalence check for the tail-stage fused residual projection
(ops/conv_chain res_embed): fused wnet_apply == use_fused=False XLA path at
a shape where the final stage's 2*s_out < 128 chain-res kernel engages.

Usage: python tools/check_tail_fusion.py
"""

import dataclasses
import sys
from os.path import abspath, dirname

sys.path.insert(0, dirname(dirname(abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_apply, wnet_init
    from bsvd_tpu.utils.platform import setup_compilation_cache
    setup_compilation_cache()

    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode='TSM')
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 64, 128, 4)), jnp.float32)

    fused = jax.jit(lambda p, v: wnet_apply(p, v, cfg))(params, x)
    cfg_x = dataclasses.replace(cfg, use_fused=False)
    ref = jax.jit(lambda p, v: wnet_apply(p, v, cfg_x))(params, x)
    dev = float(jnp.max(jnp.abs(fused - ref)))
    # The XLA fp32 conv path runs at the TPU's LOWER default conv precision
    # while the Pallas kernels accumulate true fp32, so whole-net drift
    # across 2 stages of a random-init net is ~0.1 on O(10) activations.
    # The tail kernel itself is bit-exact vs its fp32 XLA oracle on-chip
    # (measured maxdev 0.0); CPU parity tests pin the math bit-level.
    print(f'fused-vs-default-precision-xla maxdev: {dev:.3e}')
    assert dev < 0.5, dev
    print('OK: tail fusion runs and tracks the XLA path on-chip')


if __name__ == '__main__':
    main()
