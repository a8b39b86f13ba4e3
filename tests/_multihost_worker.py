"""Worker process for the multi-host mesh bring-up test: joins a 2-process
jax.distributed cluster (4 virtual CPU devices per process), builds the
GLOBAL ('data','spatial') mesh spanning both processes, and runs one full
sharded train step. Launched by tests/test_multihost.py.

usage: python tests/_multihost_worker.py <process_id> <num_processes> <coord>
"""

import os
import sys

proc_id, nprocs, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = [f for f in os.environ.get('XLA_FLAGS', '').split()
         if 'xla_force_host_platform_device_count' not in f]
flags.append('--xla_force_host_platform_device_count=4')
os.environ['XLA_FLAGS'] = ' '.join(flags)
# env-driven bring-up path (what a real launcher would set)
os.environ['BSVD_COORDINATOR'] = coord
os.environ['BSVD_NUM_PROCESSES'] = str(nprocs)
os.environ['BSVD_PROCESS_ID'] = str(proc_id)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
# persistent compile cache (workers don't run tests/conftest.py)
try:
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                     '/tmp/bsvd_tpu_test_jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
except Exception:
    pass

from bsvd_tpu.parallel.mesh import init_distributed, make_mesh
from bsvd_tpu.parallel.dryrun import run_sharded_train_step

pid, pcount = init_distributed()
assert pid == proc_id and pcount == nprocs, (pid, pcount)
assert len(jax.devices()) == 4 * nprocs, jax.devices()
assert len(jax.local_devices()) == 4

from bsvd_tpu.archs.wnet_arch import WNetConfig

mesh = make_mesh(spatial=2)
# a small net keeps the 2-process CPU compile affordable; the sharding
# machinery being validated is config-independent
cfg = WNetConfig(chns=(16, 32, 64), mid_ch=16, interm_ch=16,
                 norm='none', act='relu6', shift_mode='TSM')
loss = run_sharded_train_step(mesh, cfg=cfg)

# rank-gated I/O: every process calls the save/log APIs; only the main
# process may touch the shared filesystem (reference @master_only,
# BasicSR/basicsr/utils/dist_util.py:60-82). The parent test counts files.
outdir = os.environ.get('MH_TEST_OUTDIR')
if outdir:
    import jax.numpy as jnp
    from bsvd_tpu.models.base_model import BaseModel
    from bsvd_tpu.utils import get_root_logger, init_tb_logger

    class _M(BaseModel):
        pass

    m = _M({'is_train': True,
            'path': {'models': outdir, 'training_states': outdir}})
    m.save_network({'w': jnp.zeros((2, 2))}, 'g', 1)
    m.save_training_state(0, 1, opt_state={'count': jnp.zeros(())})
    get_root_logger(log_file=os.path.join(outdir, f'train_p{pid}.log'))
    tb = init_tb_logger(os.path.join(outdir, f'tb_p{pid}'))
    assert (tb is not None) == (pid == 0), 'TB writer must be rank-gated'

print(f'multihost worker {pid}/{pcount} ok: mesh={dict(mesh.shape)} '
      f'l_pix={loss:.4f}', flush=True)
