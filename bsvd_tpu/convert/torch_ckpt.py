"""Convert reference torch checkpoints to/from bsvd_tpu parameter pytrees.

The published BSVD checkpoints are torch ``.pth`` files holding
``{'params': state_dict, 'params_ema': state_dict}`` in the *TSN training
layout*: ``(module.)?base_model.nets_list.{s}.<block>...`` with temporal convs
wrapped as ``...c1.net.weight`` (reference key surgery this replaces:
bsvd_arch.py:7-19,462-474,143-145,252-255,280-282 — the streaming BSVD class
re-maps the same TSN checkpoint into its differently-named modules; here both
MIMO and streaming modes share one tree so a single mapping suffices).

Weight layout: torch conv weights are OIHW; ours are HWIO.
"""

import numpy as np

__all__ = ['convert_tsn_state_dict', 'params_to_tsn_state_dict', 'load_params',
           'tsn_key_map']


def _conv_w(t):
    # OIHW -> HWIO
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _conv_w_inv(a):
    # HWIO -> OIHW
    return np.transpose(np.asarray(a), (3, 2, 0, 1))


def tsn_key_map(cfg):
    """Yield (torch_key_prefix, my_path_tuple, kind) for every parameter.

    ``kind`` is 'conv' or 'bn'. ``torch_key_prefix`` is relative to
    ``nets_list.{s}.`` and omits the trailing ``.weight``/``.bias``.
    Temporal convs carry a ``.net`` segment (TemporalShift wrapper) unless
    shift_mode is 'none'.
    """
    net = '' if cfg.shift_mode == 'none' else '.net'
    for s in range(cfg.stage_num):
        st = f'stage{s}'
        if cfg.shift_input:
            # inc is a CvBlock (temporal): inc.c1 / inc.c2 (+ .b1/.b2 norms)
            yield f'{s}.inc.c1{net}', (st, 'inc', 'c1'), 'conv'
            yield f'{s}.inc.b1', (st, 'inc', 'n1'), 'bn'
            yield f'{s}.inc.c2{net}', (st, 'inc', 'c2'), 'conv'
            yield f'{s}.inc.b2', (st, 'inc', 'n2'), 'bn'
        else:
            yield f'{s}.inc.convblock.0', (st, 'inc', 'c1'), 'conv'
            yield f'{s}.inc.convblock.1', (st, 'inc', 'n1'), 'bn'
            yield f'{s}.inc.convblock.3', (st, 'inc', 'c2'), 'conv'
            yield f'{s}.inc.convblock.4', (st, 'inc', 'n2'), 'bn'
        for name, mine in (('downc0', 'down0'), ('downc1', 'down1')):
            yield f'{s}.{name}.convblock.0', (st, mine, 'conv'), 'conv'
            yield f'{s}.{name}.convblock.1', (st, mine, 'n'), 'bn'
            yield f'{s}.{name}.convblock.3.c1{net}', (st, mine, 'cv', 'c1'), 'conv'
            yield f'{s}.{name}.convblock.3.b1', (st, mine, 'cv', 'n1'), 'bn'
            yield f'{s}.{name}.convblock.3.c2{net}', (st, mine, 'cv', 'c2'), 'conv'
            yield f'{s}.{name}.convblock.3.b2', (st, mine, 'cv', 'n2'), 'bn'
        for name, mine in (('upc2', 'up2'), ('upc1', 'up1')):
            yield f'{s}.{name}.convblock.0.c1{net}', (st, mine, 'cv', 'c1'), 'conv'
            yield f'{s}.{name}.convblock.0.b1', (st, mine, 'cv', 'n1'), 'bn'
            yield f'{s}.{name}.convblock.0.c2{net}', (st, mine, 'cv', 'c2'), 'conv'
            yield f'{s}.{name}.convblock.0.b2', (st, mine, 'cv', 'n2'), 'bn'
            yield f'{s}.{name}.convblock.1', (st, mine, 'conv'), 'conv'
        yield f'{s}.outc.convblock.0', (st, 'outc', 'c1'), 'conv'
        yield f'{s}.outc.convblock.1', (st, 'outc', 'n1'), 'bn'
        yield f'{s}.outc.convblock.3', (st, 'outc', 'c2'), 'conv'


def _strip_prefix(state):
    """Strip '(module.)?base_model.nets_list.' or 'nets_list.' down to '{s}.…'."""
    out = {}
    for k, v in state.items():
        for pre in ('module.base_model.nets_list.', 'base_model.nets_list.',
                    'module.nets_list.', 'nets_list.'):
            if k.startswith(pre):
                out[k[len(pre):]] = v
                break
        else:
            out[k] = v
    return out


def _set_path(tree, path, leaf):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def convert_tsn_state_dict(state, cfg, dtype=np.float32):
    """torch (numpy-valued) TSN state dict -> bsvd_tpu param pytree."""
    state = _strip_prefix({k: np.asarray(v) for k, v in state.items()})
    params = {}
    for tkey, path, kind in tsn_key_map(cfg):
        if kind == 'conv':
            if f'{tkey}.weight' not in state:
                raise KeyError(f'missing conv weight {tkey}.weight '
                               f'(have e.g. {sorted(state)[:4]})')
            leaf = {'w': _conv_w(state[f'{tkey}.weight']).astype(dtype)}
            if f'{tkey}.bias' in state:
                leaf['b'] = np.asarray(state[f'{tkey}.bias']).astype(dtype)
            _set_path(params, path, leaf)
        else:  # bn
            if cfg.norm != 'bn':
                _set_path(params, path, {})
                continue
            leaf = {
                'scale': np.asarray(state[f'{tkey}.weight']).astype(dtype),
                'bias': np.asarray(state[f'{tkey}.bias']).astype(dtype),
                'mean': np.asarray(state[f'{tkey}.running_mean']).astype(np.float32),
                'var': np.asarray(state[f'{tkey}.running_var']).astype(np.float32),
            }
            _set_path(params, path, leaf)
    return params


def params_to_tsn_state_dict(params, cfg):
    """bsvd_tpu param pytree -> torch-layout TSN state dict (numpy values).

    Allows saving checkpoints loadable by the reference implementation.
    """
    state = {}
    base = 'base_model.nets_list.'
    for tkey, path, kind in tsn_key_map(cfg):
        leaf = _get_path(params, path)
        if kind == 'conv':
            state[f'{base}{tkey}.weight'] = _conv_w_inv(leaf['w'])
            if 'b' in leaf:
                state[f'{base}{tkey}.bias'] = np.asarray(leaf['b'])
        elif cfg.norm == 'bn' and leaf:
            state[f'{base}{tkey}.weight'] = np.asarray(leaf['scale'])
            state[f'{base}{tkey}.bias'] = np.asarray(leaf['bias'])
            state[f'{base}{tkey}.running_mean'] = np.asarray(leaf['mean'])
            state[f'{base}{tkey}.running_var'] = np.asarray(leaf['var'])
    return state


def load_params(path, cfg, param_key='params', dtype=None):
    """Load a checkpoint file into a param pytree.

    Supports: torch ``.pth`` TSN checkpoints ({'params': …}/{'params_ema': …}
    or a bare state dict) and bsvd_tpu ``.npz`` native checkpoints (see
    bsvd_tpu/models/checkpoint.py).
    """
    import jax.numpy as jnp
    path = str(path)
    if path.endswith('.npz'):
        from bsvd_tpu.models.checkpoint import load_npz_params
        params = load_npz_params(path, param_key)
    else:
        import torch
        ckpt = torch.load(path, map_location='cpu', weights_only=True)
        if param_key and param_key in ckpt:
            ckpt = ckpt[param_key]
        state = {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
                 for k, v in ckpt.items()}
        params = convert_tsn_state_dict(state, cfg)
    if dtype is not None:
        import jax
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    else:
        import jax
        params = jax.tree.map(jnp.asarray, params)
    return params
