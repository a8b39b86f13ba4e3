"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's torch DataParallel/DDP+NCCL stack (reference:
BasicSR/basicsr/utils/dist_util.py, base_model.py:62-76, data_sampler.py).

Design: single-controller SPMD. One jitted train step runs over a
``jax.sharding.Mesh``; the batch is sharded over the ``data`` axis
(data parallelism — gradients are reduced by XLA-inserted all-reduces over
ICI, replacing DDP's NCCL all-reduce) and optionally over a ``spatial``
axis (the H dimension of NTHWC activations — GSPMD partitions the convs
with automatic halo exchange, the conv-net analogue of sequence/context
parallelism). Params are replicated: the WNet is ~20 MB, far below the
threshold where tensor/FSDP sharding pays.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_dist_initialized = False


def is_main_process():
    """True on the coordinator process (rank 0) — the analogue of the
    reference's ``get_dist_info()[0] == 0``
    (BasicSR/basicsr/utils/dist_util.py:60-70). Single-process runs are
    always main."""
    try:
        return jax.process_index() == 0
    except Exception:
        return True


def master_only(func):
    """Run ``func`` only on the main process (reference ``@master_only``,
    dist_util.py:73-82): in a multi-host cluster every process executes the
    same single-controller script, so checkpoint/log/CSV writes against the
    shared filesystem must be rank-gated or N processes race on the same
    paths."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return func(*args, **kwargs)
        return None
    return wrapper


def get_shard_map():
    """(shard_map, relax_kwargs) across jax versions: the replication/VMA
    check kwarg was renamed in jax 0.8."""
    try:
        from jax import shard_map          # jax >= 0.8
        return shard_map, {'check_vma': False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        return shard_map, {'check_rep': False}   # pre-0.8 spelling


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None, port=None):
    """Multi-host (DCN-spanning) bring-up: ``jax.distributed.initialize``
    from explicit args or the environment — the launcher analogue of the
    reference's slurm/env dist init (BasicSR/basicsr/utils/dist_util.py:30-57,
    which resolves MASTER_ADDR/RANK/WORLD_SIZE from SLURM vars).

    Resolution order:
      1. explicit args;
      2. ``BSVD_COORDINATOR`` / ``BSVD_NUM_PROCESSES`` / ``BSVD_PROCESS_ID``;
      3. SLURM (`SLURM_PROCID`/`SLURM_NTASKS`/`SLURM_STEP_NODELIST`, first
         host + ``port`` or ``BSVD_PORT`` or 12321 as the coordinator);
      4. on a Cloud-TPU pod, bare ``jax.distributed.initialize()``
         auto-detects everything.

    After this returns, ``jax.devices()`` is the GLOBAL device list and
    ``make_mesh`` builds DCN-spanning meshes transparently. No-op (returns
    (0, 1)) when no multi-process environment is found. Idempotent.

    Returns:
        (process_index, process_count)
    """
    global _dist_initialized
    if _dist_initialized:
        return jax.process_index(), jax.process_count()

    env = os.environ
    if coordinator_address is None and 'BSVD_COORDINATOR' in env:
        coordinator_address = env['BSVD_COORDINATOR']
        num_processes = int(env.get('BSVD_NUM_PROCESSES', num_processes or 1))
        process_id = int(env.get('BSVD_PROCESS_ID', process_id or 0))
    if (coordinator_address is None and 'SLURM_PROCID' in env
            and int(env.get('SLURM_NTASKS', '1')) > 1):
        # single-task slurm jobs (srun -n1) skip distributed init entirely:
        # auto-binding a default-port coordinator would collide between
        # unrelated jobs sharing a node (the reference's dist_util is
        # likewise launcher-opt-in). Explicit BSVD_COORDINATOR still works.
        process_id = int(env['SLURM_PROCID'])
        num_processes = int(env['SLURM_NTASKS'])
        nodelist = env.get('SLURM_STEP_NODELIST', env.get('SLURM_NODELIST', ''))
        import subprocess
        try:
            out = subprocess.run(['scontrol', 'show', 'hostname', nodelist],
                                 capture_output=True, text=True, check=True,
                                 timeout=30).stdout
            head = out.splitlines()[0].strip() if out.strip() else ''
        except (OSError, subprocess.SubprocessError):
            # no usable slurm CLI (e.g. a job step inside a container):
            # fall through to auto-detection / single-process
            head = ''
        if head:
            p = port or env.get('BSVD_PORT', 12321)
            coordinator_address = f'{head}:{p}'

    if coordinator_address is not None:
        # Explicit-address calls may still source counts from the env
        # (init_distributed('host:port') with BSVD_NUM_PROCESSES exported).
        if num_processes is None:
            num_processes = env.get('BSVD_NUM_PROCESSES')
        if process_id is None:
            process_id = env.get('BSVD_PROCESS_ID')
        if num_processes is None or process_id is None:
            raise ValueError(
                'init_distributed: coordinator_address given but '
                'num_processes/process_id unresolved — pass them explicitly '
                'or export BSVD_NUM_PROCESSES/BSVD_PROCESS_ID')
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=int(num_processes),
            process_id=int(process_id),
            local_device_ids=local_device_ids)
        _dist_initialized = True
        return jax.process_index(), jax.process_count()

    if env.get('TPU_WORKER_HOSTNAMES') or env.get('MEGASCALE_COORDINATOR_ADDRESS'):
        try:
            jax.distributed.initialize()   # TPU-pod auto-detection
            _dist_initialized = True
            return jax.process_index(), jax.process_count()
        except RuntimeError:
            # backend already initialised (e.g. single-host tunnel setups
            # that export TPU_* vars) — single-process it is
            pass

    return 0, 1


def make_mesh(num_devices=None, spatial=1, devices=None, strict=True):
    """Build a ('data', 'spatial') mesh.

    Args:
        num_devices: total devices to use (None = all).
        spatial: size of the spatial axis (must divide num_devices).
        strict: raise when ``spatial`` does not divide the device count — a
            user config asking for a layout the slice cannot provide should
            fail loudly. ``strict=False`` degrades to spatial=1 with a
            warning (used by the driver's dryrun entry, which probes
            whatever device count it is given).
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs) if num_devices in (None, 'auto') else int(num_devices)
    n = max(1, min(n, len(devs)))
    if n % spatial != 0:
        if strict:
            raise ValueError(f'spatial axis {spatial} does not divide '
                             f'device count {n}')
        import warnings
        warnings.warn(f'spatial axis {spatial} does not divide device count '
                      f'{n}; degrading to spatial=1', stacklevel=2)
        spatial = 1
    arr = np.array(devs[:n]).reshape(n // spatial, spatial)
    return Mesh(arr, ('data', 'spatial'))


def batch_sharding(mesh, ndim, batch_axis=0, spatial_axis=None):
    """NamedSharding for an activation batch: dim ``batch_axis`` over 'data'
    (pass None to leave the batch replicated, e.g. N=1 inference), optional
    dim ``spatial_axis`` over 'spatial'."""
    spec = [None] * ndim
    if batch_axis is not None:
        spec[batch_axis] = 'data'
    if spatial_axis is not None and mesh.shape['spatial'] > 1:
        spec[spatial_axis] = 'spatial'
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, tree, batch_axis=0, spatial_axis=None):
    """device_put every array of the pytree with batch(+spatial) sharding."""
    def _put(x):
        sh = batch_sharding(mesh, np.ndim(x), batch_axis, spatial_axis)
        return jax.device_put(x, sh)
    return jax.tree.map(_put, tree)
