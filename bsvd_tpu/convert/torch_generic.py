"""Generic torch-state-dict <-> param-pytree conversion for archs whose trees
mirror torch module names (SR zoo, discriminators, ...).

Key mapping: ``a.b.0.conv.weight`` -> tree['a']['b']['0']['conv']['w'] with
4D conv weights transposed OIHW -> HWIO and 2D linear weights (O, I) -> (I, O).
"""

import numpy as np


def _to_tree_leaf(name, arr):
    arr = np.asarray(arr)
    if name in ('weight', 'weight_orig'):
        # 'weight_orig' is torch spectral_norm's stored weight — our SN
        # layers keep the raw weight under 'w' and re-run the power
        # iteration themselves (discriminator_arch.py)
        if arr.ndim == 4:
            return 'w', np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 2:
            return 'w', np.transpose(arr, (1, 0))
        return 'w', arr          # norm scale
    if name == 'weight_u':
        return 'u', arr          # persistent power-iteration vector
    if name == 'weight_v':
        return None, None        # recomputed from (w, u); not carried
    if name == 'bias':
        return 'b', arr
    return name, arr


def _from_tree_leaf(name, arr):
    arr = np.asarray(arr)
    if name == 'w':
        if arr.ndim == 4:
            return 'weight', np.transpose(arr, (3, 2, 0, 1))
        if arr.ndim == 2:
            return 'weight', np.transpose(arr, (1, 0))
        return 'weight', arr
    if name == 'b':
        return 'bias', arr
    return name, arr


def state_dict_to_tree(state, dtype=np.float32):
    tree = {}
    for key, val in state.items():
        key = key[len('module.'):] if key.startswith('module.') else key
        *path, leaf = key.split('.')
        leaf_name, arr = _to_tree_leaf(leaf, val)
        if leaf_name is None:
            continue
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = arr.astype(dtype)
    return tree


def tree_to_state_dict(tree, prefix=''):
    state = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            state.update(tree_to_state_dict(v, f'{prefix}{k}.'))
        else:
            name, arr = _from_tree_leaf(k, v)
            state[f'{prefix}{name}'] = arr
    return state


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def load_torch_generic(path, template_params, param_key='params'):
    """Load a torch .pth (or native .npz) into the template's tree structure,
    validating that every template leaf is provided with a matching shape."""
    import jax
    import jax.numpy as jnp
    path = str(path)
    if path.endswith('.npz'):
        from bsvd_tpu.models.checkpoint import load_npz_params
        tree = load_npz_params(path, param_key)
    else:
        import torch
        ckpt = torch.load(path, map_location='cpu', weights_only=True)
        if param_key and param_key in ckpt:
            ckpt = ckpt[param_key]
        tree = state_dict_to_tree(
            {k: v.numpy() if hasattr(v, 'numpy') else v for k, v in ckpt.items()})

    out = jax.tree.map(lambda a: a, template_params)  # copy structure
    flat_new = dict(_tree_paths(tree))
    result = {}
    for pth, tmpl in _tree_paths(template_params):
        if pth not in flat_new:
            raise KeyError(f'checkpoint missing parameter {"/".join(pth)}')
        arr = np.asarray(flat_new[pth])
        if arr.shape != tuple(tmpl.shape):
            raise ValueError(f'shape mismatch at {"/".join(pth)}: '
                             f'{arr.shape} vs {tuple(tmpl.shape)}')
        result[pth] = jnp.asarray(arr, tmpl.dtype)

    def build(node, prefix=()):
        return {k: build(v, prefix + (k,)) if isinstance(v, dict)
                else result[prefix + (k,)] for k, v in node.items()}
    del out
    return build(template_params)
