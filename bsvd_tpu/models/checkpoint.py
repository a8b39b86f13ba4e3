"""Native checkpoint format: flat-key ``.npz`` for param pytrees and
training state (replaces torch .pth {'params','params_ema'} +
``.state`` files — reference base_model.py:170-328). A torch-compatible
``.pth`` can additionally be emitted through bsvd_tpu.convert.

Save is retried (reference retries 3x with 1 s sleep, base_model.py:200-215)
and atomic (write to tmp then rename).
"""

import os
import pickle
import time

import numpy as np


# Paramless subtrees (e.g. norm='none' slots, nn/layers.py norm_init) are
# real nodes of the arch's pytree: the flat encoding keeps them via a
# sentinel key so a save/load round-trip is structure-exact — dropping
# them made reloaded norm-free nets crash on p['inc']['n1'].
_EMPTY_SENTINEL = '__empty_dict__'


def flatten_tree(tree, prefix=''):
    """Nested dict/list pytree -> {flat/key/path: np.ndarray}."""
    flat = {}
    if isinstance(tree, dict):
        if not tree and prefix:
            return {f'{prefix}{_EMPTY_SENTINEL}': np.zeros((0,), np.float32)}
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip('/'): np.asarray(tree)}
    for k, v in items:
        flat.update(flatten_tree(v, f'{prefix}{k}/'))
    return flat


def unflatten_tree(flat):
    """Inverse of flatten_tree (all containers become dicts)."""
    tree = {}
    for key, val in flat.items():
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if parts[-1] != _EMPTY_SENTINEL:
            node[parts[-1]] = val
    return tree


def _atomic_retry_write(path, write_fn, retries=3):
    tmp = str(path) + '.tmp'
    for attempt in range(retries):
        try:
            write_fn(tmp)
            os.replace(tmp, path)
            return
        except Exception:
            if attempt == retries - 1:
                raise
            time.sleep(1)


def save_npz_params(path, params_dict):
    """Save {'params': tree, 'params_ema': tree, ...} into one npz.

    Keys are namespaced ``<param_key>/<flat/path>``.
    """
    flat = {}
    for param_key, tree in params_dict.items():
        if tree is None:
            continue
        for k, v in flatten_tree(tree).items():
            flat[f'{param_key}/{k}'] = np.asarray(v)

    def write(p):
        with open(p, 'wb') as f:   # file handle: np.savez must not append .npz
            np.savez(f, **flat)
    _atomic_retry_write(path, write)


def load_npz_params(path, param_key='params'):
    """Load one param tree (by key) from an npz checkpoint."""
    with np.load(path) as z:
        prefix = f'{param_key}/'
        flat = {k[len(prefix):]: z[k] for k in z.files if k.startswith(prefix)}
    if not flat:
        with np.load(path) as z:
            avail = sorted({k.split('/', 1)[0] for k in z.files})
        raise KeyError(f'param key {param_key!r} not in checkpoint '
                       f'(available: {avail})')
    return unflatten_tree(flat)


def save_training_state(path, state):
    """Pickle optimizer/scheduler/epoch/iter training state (host arrays)."""
    import jax
    state = jax.tree.map(lambda a: np.asarray(a), state)

    def write(p):
        with open(p, 'wb') as f:
            pickle.dump(state, f)
    _atomic_retry_write(path, write)


def load_training_state(path):
    with open(path, 'rb') as f:
        return pickle.load(f)
