"""Temporal channel-shift ops on (N, T, H, W, C) arrays.

The temporal shift exchanges a slice of channels with the neighbouring frames:
the first ``C/fold_div`` channels are taken from the *future* frame, the second
``C/fold_div`` from the *past* frame, the rest stay. Out-of-range neighbours are
zeros. This is the whole temporal mixing mechanism of BSVD — reference
semantics: Experimental_root/archs/temporal_shift_ops/temporal_shift.py:27-80.

Three entry points:

- ``temporal_shift``: shift within each length-T segment (training-mode
  ``shift()`` and whole-clip MIMO inference — the latter is *exactly*
  equivalent to the reference's streaming pipeline because both use zero
  boundaries; see tests/test_streaming.py).
- ``temporal_shift_chunk``: chunked MIMO inference carrying the past-slice
  across chunk boundaries as an explicit functional carry (replaces the
  reference's global queue singleton, temporal_shift.py:53-80 +
  global_queue_buffer.py).
- causal variant (``shift_type='toFutureOnly'``): both folds come from the
  past frame — one-frame-latency unidirectional streaming
  (temporal_shift.py:42-46, 69-76).
"""

import jax.numpy as jnp


def _zeros_like_slice(x, t_axis=1):
    del t_axis
    return jnp.zeros_like(x[:, :1])


def temporal_shift(x, fold_div=8, shift_type='TSM', stride=1):
    """Shift channels across the T axis of (N, T, H, W, C) with zero boundaries.

    ``shift_type='TSM'``: channels [:fold] from frame t+stride (future),
    channels [fold:2*fold] from frame t-stride (past).
    ``'toFutureOnly'`` (causal): channels [:2*fold] from frame t-stride.
    """
    c = x.shape[-1]
    fold = c // fold_div
    zpad = jnp.zeros_like(x[:, :stride, ..., :fold])
    if 'toFutureOnly' in shift_type:
        zpad2 = jnp.zeros_like(x[:, :stride, ..., :2 * fold])
        past2 = jnp.concatenate([zpad2, x[:, :-stride, ..., :2 * fold]], axis=1)
        return jnp.concatenate([past2, x[..., 2 * fold:]], axis=-1)
    future = jnp.concatenate([x[:, stride:, ..., :fold], zpad], axis=1)
    zpad_p = jnp.zeros_like(x[:, :stride, ..., fold:2 * fold])
    past = jnp.concatenate([zpad_p, x[:, :-stride, ..., fold:2 * fold]], axis=1)
    return jnp.concatenate([future, past, x[..., 2 * fold:]], axis=-1)


def temporal_shift_chunk(x, carry, fold_div=8, shift_type='TSM', stride=1,
                         future_buffer_len=0):
    """Chunked-MIMO shift: like ``temporal_shift`` but the past slice of the
    first frame comes from ``carry`` (the previous chunk), and the slice to
    carry into the next chunk is returned.

    Args:
        x: (N, T, H, W, C) chunk (T includes ``future_buffer_len`` look-ahead
            frames that will be recomputed by the next chunk).
        carry: (N, 1, H, W, fold_width) past slice from the previous chunk, or
            None for the first chunk (zero boundary).
        future_buffer_len: number of trailing look-ahead frames; the carried
            slice is taken from frame ``T-1-stride-future_buffer_len+stride``
            = ``T-stride-future_buffer_len`` like the reference
            (temporal_shift.py:68: ``x[-stride-future_buffer_len]``).

    Returns:
        (shifted, new_carry) where new_carry has the same shape contract as
        ``carry``.
    """
    c = x.shape[-1]
    fold = c // fold_div
    causal = 'toFutureOnly' in shift_type
    width = 2 * fold if causal else fold
    lo, hi = (0, 2 * fold) if causal else (fold, 2 * fold)

    t = x.shape[1]
    src = x[:, t - stride - future_buffer_len:t - future_buffer_len, ..., lo:hi]
    new_carry = src

    if causal:
        shifted = temporal_shift(x, fold_div, shift_type, stride)
        if carry is not None:
            head = carry.astype(x.dtype)
            shifted = jnp.concatenate([
                jnp.concatenate([head, shifted[:, :stride, ..., 2 * fold:]], axis=-1),
                shifted[:, stride:],
            ], axis=1)
        return shifted, new_carry

    shifted = temporal_shift(x, fold_div, shift_type, stride)
    if carry is not None:
        head = jnp.concatenate([
            shifted[:, :stride, ..., :fold],
            carry.astype(x.dtype),
            shifted[:, :stride, ..., 2 * fold:],
        ], axis=-1)
        shifted = jnp.concatenate([head, shifted[:, stride:]], axis=1)
    return shifted, new_carry
