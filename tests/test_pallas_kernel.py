"""Pallas fused shift-conv correctness in CI via interpret mode.

The fused kernel is default-on for TPU inference (WNetConfig.use_fused), but
the test suite forces CPU, so without these interpret-mode cases the kernel
would be exercised by zero automated tests. Semantics oracle:
shift_conv_reference == temporal_shift + conv2d (reference:
temporal_shift.py:40-47 + bsvd_arch.py:42-50).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bsvd_tpu.ops.shift_conv import shift_conv_fused, shift_conv_reference


def _data(t, h, w, c, co, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((t, h, w, c)), dtype)
    wts = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, dtype)
    b = jnp.asarray(rng.standard_normal(co) * 0.1, dtype)
    return x, wts, b


@pytest.mark.parametrize('case', ['fp32', 'bf16', 'causal', 'two_clips',
                                  'relu', 'none_act'])
def test_shift_conv_interpret_matches_reference(case):
    T, H, W, C, CO = 4, 16, 32, 16, 24
    dtype = jnp.bfloat16 if case == 'bf16' else jnp.float32
    causal = case == 'causal'
    act = {'relu': 'relu', 'none_act': 'none'}.get(case, 'relu6')
    nt = 8 if case == 'two_clips' else T
    x, w, b = _data(nt, H, W, C, CO, dtype)

    ref = shift_conv_reference(x, w, b, t_len=T, act=act, causal=causal)
    got = shift_conv_fused(x, w, b, t_len=T, act=act, causal=causal,
                           bh=4, interpret=True)
    assert got.dtype == ref.dtype
    tol = 5e-2 if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_shift_conv_interpret_multi_rowblock_halo():
    """bh < H exercises the top/bottom halo DMAs across row blocks."""
    T, H, W, C, CO = 2, 12, 16, 8, 8
    x, w, b = _data(T, H, W, C, CO, jnp.float32, seed=3)
    ref = shift_conv_reference(x, w, b, t_len=T)
    for bh in (2, 3, 6, 12):
        got = shift_conv_fused(x, w, b, t_len=T, bh=bh, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f'bh={bh}')


@pytest.mark.parametrize('act', ['relu6', 'relu', 'none'])
def test_plain_conv3x3_interpret_matches_xla(act):
    """The shift='none' path of the gen-2 kernel (stems/up-path convs)."""
    from bsvd_tpu.ops.conv3x3 import _conv3x3_xla, conv3x3_pallas
    x, w, b = _data(3, 12, 16, 16, 32, jnp.float32, seed=5)
    ref = _conv3x3_xla(x, w, b, act)
    for bh in (3, 6, 12):
        got = conv3x3_pallas(x, w, b, shift='none', act=act, bh=bh,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f'bh={bh}')


def test_plain_conv3x3_custom_vjp_gradients():
    """conv3x3's Pallas-fwd/XLA-bwd custom_vjp == XLA composite grads."""
    import jax
    from bsvd_tpu.ops.conv3x3 import _conv3x3_xla, conv3x3
    x, w, b = _data(2, 8, 16, 8, 8, jnp.float32, seed=6)

    def loss_fused(x, w, b):
        # interpret-mode forward via the underlying kernel is exercised
        # above; here the vjp wiring itself is validated on CPU where the
        # forward falls back... custom_vjp forward must run, so use the
        # XLA-equivalent loss for the reference only.
        return jnp.sum(conv3x3(x, w, b, 'relu6') ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(_conv3x3_xla(x, w, b, 'relu6') ** 2)

    try:
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    except Exception:
        pytest.skip('Pallas forward unsupported on this backend')
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_plain_conv3x3_width_folded_c64():
    """C=64 goes through the width-folding transform (Mosaic needs
    128-lane DMA granularity): folded kernel == plain XLA conv."""
    from bsvd_tpu.ops.conv3x3 import _conv3x3_xla, conv3x3_pallas
    x, w, b = _data(2, 8, 24, 64, 32, jnp.float32, seed=7)
    ref = _conv3x3_xla(x, w, b, 'relu6')
    got = conv3x3_pallas(x, w, b, shift='none', act='relu6', bh=4,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('case', ['tsm_relu6', 'causal_relu', 'none_act'])
def test_direct_backward_matches_composite_vjp(case):
    """_sc_bwd computes (dx, dw, db) directly from saved (x, w, b, y)
    without re-running the forward; it must equal the vjp of the XLA
    composite (away from exact clip boundaries)."""
    import jax
    from bsvd_tpu.ops.shift_conv import _sc_bwd, shift_conv_reference
    causal = case.startswith('causal')
    act = {'tsm_relu6': 'relu6', 'causal_relu': 'relu',
           'none_act': 'none'}[case]
    T = 3
    x, w, b = _data(6, 10, 12, 16, 8, jnp.float32, seed=11)
    f = lambda x, w, b: shift_conv_reference(   # noqa: E731
        x, w, b, t_len=T, act=act, causal=causal)
    y, vjp = jax.vjp(f, x, w, b)
    g = jnp.asarray(np.random.default_rng(12).standard_normal(y.shape),
                    jnp.float32)
    ref = vjp(g)
    got = _sc_bwd(T, 8, act, causal, (x, w, b, y), g)
    for a, r, name in zip(got, ref, ('dx', 'dw', 'db')):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_plain_direct_backward_matches_composite_vjp():
    import jax
    from bsvd_tpu.ops.conv3x3 import _c3_bwd, _conv3x3_xla
    x, w, b = _data(3, 8, 12, 16, 8, jnp.float32, seed=13)
    f = lambda x, w, b: _conv3x3_xla(x, w, b, 'relu6')  # noqa: E731
    y, vjp = jax.vjp(f, x, w, b)
    g = jnp.asarray(np.random.default_rng(14).standard_normal(y.shape),
                    jnp.float32)
    ref = vjp(g)
    got = _c3_bwd('relu6', False, (x, w, b, y), g)
    for a, r, name in zip(got, ref, ('dx', 'dw', 'db')):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


@pytest.mark.parametrize('act', ['relu6', 'none'])
def test_nt1_rowblock_kernel_interpret_matches_xla(act):
    """NT=1 routes through the row-block-pipelined kernel (_kernel_nt1):
    same semantics as the frame-minor kernel, pipeline over row blocks."""
    from bsvd_tpu.ops.conv3x3 import _conv3x3_xla, conv3x3_pallas
    x, w, b = _data(1, 12, 16, 16, 32, jnp.float32, seed=7)
    ref = _conv3x3_xla(x, w, b, act)
    for bh in (3, 4, 6, 12):
        got = conv3x3_pallas(x, w, b, shift='none', act=act, bh=bh,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')


def test_nt1_rowblock_kernel_width_folded_c64():
    """NT=1 + C=64 composes the width fold with the row-block pipeline."""
    from bsvd_tpu.ops.conv3x3 import _conv3x3_xla, conv3x3_pallas
    x, w, b = _data(1, 8, 16, 64, 32, jnp.float32, seed=8)
    ref = _conv3x3_xla(x, w, b, 'relu6')
    got = conv3x3_pallas(x, w, b, shift='none', act='relu6', bh=4,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('nt,act', [(3, 'relu6'), (1, 'relu6'), (1, 'none'),
                                    (2, 'relu')])
def test_stride2_kernel_interpret_matches_xla(nt, act):
    """Width-folded stride-2 down-conv kernel (ops/conv_s2): frame-minor and
    NT=1 row-block variants vs the XLA composite."""
    from bsvd_tpu.ops.conv_s2 import _conv_s2_xla, conv_s2_pallas
    rng = np.random.default_rng(11)
    NT, H, W, C, CO = nt, 12, 16, 16, 24
    x = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 2, C, CO)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    ref = _conv_s2_xla(x, w, b, act)
    for bh in (2, 3, 6):
        got = conv_s2_pallas(x, w, b, act=act, bh=bh, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')


def test_stride2_kernel_matches_folded_down_site():
    """conv_s2 on the folded view == the natural stride-2 conv site
    (fold_width_stride2_weights roundtrip through the kernel)."""
    from bsvd_tpu.ops.conv3x3 import fold_width_stride2_weights
    from bsvd_tpu.ops.conv_s2 import conv_s2_pallas
    rng = np.random.default_rng(12)
    NT, H, W, C, CO = 2, 8, 12, 8, 16
    x = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, CO)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    import jax.lax as lax
    ref = lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                   dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    ref = jnp.clip(ref + b, 0, 6)
    w2, b2 = fold_width_stride2_weights(w, b)
    got = conv_s2_pallas(x.reshape(NT, H, W // 2, 2 * C), w2, b2,
                         act='relu6', bh=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_stride2_custom_vjp_gradients():
    from bsvd_tpu.ops.conv_s2 import _conv_s2_xla, conv_s2
    import jax
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1, 16, 64, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 2, 16, 16)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    from jax.experimental.pallas import tpu as pltpu
    def loss_fused(x, w, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv_s2(x, w, b) ** 2)
    def loss_ref(x, w, b):
        return jnp.sum(_conv_s2_xla(x, w, b, 'relu6') ** 2)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('nt', [1, 3])
def test_conv3x3_fused_add_interpret(nt):
    """conv3x3_pallas with a second input == XLA conv of the sum (the fused
    skip-add path), both NT=1 and frame-minor variants, incl. C=64 fold."""
    from bsvd_tpu.ops.conv3x3 import _conv3x3_xla, conv3x3_pallas
    rng = np.random.default_rng(21)
    for c in (16, 64):
        x = jnp.asarray(rng.standard_normal((nt, 8, 16, c)), jnp.float32)
        x2 = jnp.asarray(rng.standard_normal((nt, 8, 16, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, c, 16)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
        ref = _conv3x3_xla(x + x2, w, b, 'relu6')
        got = conv3x3_pallas(x, w, b, x2, shift='none', act='relu6', bh=4,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f'c={c}')


def test_conv3x3_add2_gradients():
    from bsvd_tpu.ops.conv3x3 import _conv3x3_xla, conv3x3_add2
    import jax
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((2, 8, 64, 16)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, 8, 64, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)

    def loss_fused(x, x2, w, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv3x3_add2(x, x2, w, b) ** 2)

    def loss_ref(x, x2, w, b):
        return jnp.sum(_conv3x3_xla(x + x2, w, b, 'relu6') ** 2)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, x2, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, x2, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('case', ['nt3', 'nt1', 'add2', 'relu_both'])
def test_conv_chain_interpret_matches_xla(case):
    """Rolling-intermediate chained-conv kernel (ops/conv_chain)."""
    from bsvd_tpu.ops.conv_chain import _chain_xla, conv_chain_pallas
    rng = np.random.default_rng(41)
    nt = 1 if case == 'nt1' else 3
    act2 = 'relu6' if case == 'relu_both' else 'none'
    NT, H, W, C, C1, CO = nt, 12, 16, 16, 24, 8
    x = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    x2 = (jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
          if case == 'add2' else None)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C1)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(C1) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C1, CO)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    ref = _chain_xla(x, w1, b1, w2, b2, 'relu6', act2, x2=x2)
    for bh in (3, 4, 6, 12):
        got = conv_chain_pallas(x, w1, b1, w2, b2, x2, act1='relu6',
                                act2=act2, bh=bh, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')


@pytest.mark.parametrize('act2', ['none', 'relu6'])
def test_conv_chain_gradients(act2):
    """Direct chain backward (act2 mask from the saved output, only the
    intermediate recomputed) == vjp through the XLA composite — both the
    outc-style (act2='none') and inc-style (act2='relu6') sites."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from bsvd_tpu.ops.conv_chain import _chain_xla, conv_chain
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((1, 8, 64, 16)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32)

    def loss_fused(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv_chain(*a, act2=act2) ** 2)

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(_chain_xla(x, w1, b1, w2, b2, 'relu6', act2) ** 2)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('act', ['relu6', 'none'])
def test_bibuffer_conv_interpret(act):
    """Fused streaming BiBufferConv step (ops/bibuffer_conv): conv on the
    packed-state assembly + next packed state, vs the XLA composite."""
    from bsvd_tpu.ops.bibuffer_conv import (bibuffer_conv_pallas,
                                            bibuffer_conv_reference)
    rng = np.random.default_rng(51)
    H, W, C, CO = 12, 16, 16, 24
    x = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    st = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, CO)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    ry, rs = bibuffer_conv_reference(x, st, w, b, act=act)
    for bh in (3, 4, 6):
        gy, gs = bibuffer_conv_pallas(x, st, w, b, act=act, bh=bh,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(gy), np.asarray(ry),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')
        np.testing.assert_array_equal(np.asarray(gs), np.asarray(rs))


@pytest.mark.parametrize('causal', [False, True])
def test_bibuffer_chain_interpret(causal):
    """Chained MemCvBlock step (ops/bibuffer_conv.bibuffer_chain_pallas):
    both buffered shift-convs in one kernel, vs two sequential reference
    steps — y, s1', s2' all exact."""
    from bsvd_tpu.ops.bibuffer_conv import (bibuffer_chain_pallas,
                                            bibuffer_chain_reference)
    rng = np.random.default_rng(53)
    H, W, C, C1, CO = 12, 16, 16, 24, 16
    x = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    s1 = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    s2 = jnp.asarray(rng.standard_normal((1, H, W, C1)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C1)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(C1) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C1, CO)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    ry, rs1, rs2 = bibuffer_chain_reference(x, s1, s2, w1, b1, w2, b2,
                                            act='relu6', act2='relu6',
                                            causal=causal)
    for bh in (3, 4, 12):
        gy, gs1, gs2 = bibuffer_chain_pallas(x, s1, s2, w1, b1, w2, b2,
                                             act='relu6', act2='relu6',
                                             bh=bh, causal=causal,
                                             interpret=True)
        np.testing.assert_allclose(np.asarray(gy), np.asarray(ry),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')
        np.testing.assert_array_equal(np.asarray(gs1), np.asarray(rs1))
        # s2' carries computed y1 lanes (kernel fp32 accumulation vs the
        # oracle's XLA conv): close, not bit-equal
        np.testing.assert_allclose(np.asarray(gs2), np.asarray(rs2),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')


@pytest.mark.parametrize('causal', [False, True])
@pytest.mark.parametrize('nf', [1, 2, 5])
def test_bibuffer_multi_interpret(nf, causal):
    """Weight-shared F-frame streaming advance
    (ops/bibuffer_conv.bibuffer_multi_pallas) == F sequential reference
    steps — outputs and the final packed state, both modes, incl. F=1."""
    from bsvd_tpu.ops.bibuffer_conv import (bibuffer_multi_pallas,
                                            bibuffer_multi_reference)
    rng = np.random.default_rng(54)
    H, W, C, CO = 12, 16, 16, 24
    x = jnp.asarray(rng.standard_normal((nf, H, W, C)), jnp.float32)
    st = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, CO)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    ry, rs = bibuffer_multi_reference(x, st, w, b, act='relu6', causal=causal)
    for bh in (3, 6):
        gy, gs = bibuffer_multi_pallas(x, st, w, b, act='relu6', bh=bh,
                                       causal=causal, interpret=True)
        np.testing.assert_allclose(np.asarray(gy), np.asarray(ry),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')
        np.testing.assert_array_equal(np.asarray(gs), np.asarray(rs))


def test_bibuffer_conv_causal_interpret():
    from bsvd_tpu.ops.bibuffer_conv import (bibuffer_conv_pallas,
                                            bibuffer_conv_reference)
    rng = np.random.default_rng(52)
    H, W, C, CO = 8, 16, 16, 16
    x = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    st = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, CO)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    ry, rs = bibuffer_conv_reference(x, st, w, b, act='relu6', causal=True)
    gy, gs = bibuffer_conv_pallas(x, st, w, b, act='relu6', bh=4,
                                  causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ry),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(rs))


@pytest.mark.parametrize('nt', [1, 3])
def test_conv_ps_fold_interpret_matches_xla(nt):
    """Fused up-conv + r=2 pixel shuffle + width-fold (ops/conv3x3
    conv_ps_fold): the shuffled+folded output written as tile-aligned lane
    slices must equal conv -> torch-order pixel_shuffle -> fold2."""
    from bsvd_tpu.ops.conv3x3 import _conv_ps_fold_xla, conv_ps_fold_pallas
    rng = np.random.default_rng(61)
    NT, H, W, C, HALF = nt, 12, 16, 16, 8
    x = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, 4 * HALF)) * 0.05,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(4 * HALF) * 0.1, jnp.float32)
    ref = _conv_ps_fold_xla(x, w, b)
    for bh in (3, 4, 6, 12):
        got = conv_ps_fold_pallas(x, w, b, bh=bh, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')


def test_conv_ps_fold_matches_up_site():
    """conv_ps_fold == the wnet up-conv site (conv + nn.layers.pixel_shuffle
    + width-fold) — ties the kernel to the checkpoint-compatible torch
    PixelShuffle channel order (wnet_models.py:92-105)."""
    from bsvd_tpu.nn.layers import pixel_shuffle
    from bsvd_tpu.ops.conv3x3 import conv_ps_fold_pallas
    from jax import lax
    rng = np.random.default_rng(62)
    NT, H, W, C, HALF = 2, 8, 12, 16, 8
    x = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, 4 * HALF)) * 0.05,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(4 * HALF) * 0.1, jnp.float32)
    y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    ps = pixel_shuffle(y + b, 2)                        # (NT, 2H, 2W, HALF)
    ref = ps.reshape(NT, 2 * H, W, 2 * HALF)            # width-fold
    got = conv_ps_fold_pallas(x, w, b, bh=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv_ps_fold_gradients():
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from bsvd_tpu.ops.conv3x3 import _conv_ps_fold_xla, conv_ps_fold
    rng = np.random.default_rng(63)
    x = jnp.asarray(rng.standard_normal((1, 8, 64, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(32) * 0.1, jnp.float32)

    def loss_fused(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv_ps_fold(*a) ** 2)

    def loss_ref(*a):
        return jnp.sum(_conv_ps_fold_xla(*a) ** 2)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('nt', [1, 3])
def test_conv3x3_dw_kernel_interpret(nt):
    """One-pass weight-grad accumulation kernel (ops/conv3x3._kernel_dw):
    (3,3,Ci,Co) == XLA conv_grad_weights, multiple row blocks + frames."""
    import jax
    from jax import lax
    from bsvd_tpu.ops.conv3x3 import conv3x3_dw_pallas
    rng = np.random.default_rng(65)
    H, W, CI, CO = 12, 16, 16, 8
    x = jnp.asarray(rng.standard_normal((nt, H, W, CI)), jnp.float32)
    dz = jnp.asarray(rng.standard_normal((nt, H, W, CO)), jnp.float32)

    def conv_w(v):
        return lax.conv_general_dilated(
            x, v, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    wspec = jax.ShapeDtypeStruct((3, 3, CI, CO), jnp.float32)
    ref = jax.linear_transpose(conv_w, wspec)(dz)[0]
    for bh in (3, 6, 12):
        got = conv3x3_dw_pallas(x, dz, bh=bh, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')


def test_conv_ps_natural_gradients():
    """Direct backward of the natural-layout shuffle kernel (one unshuffle
    transpose + dot-based dw) == vjp through the XLA composite."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from bsvd_tpu.ops.conv3x3 import _conv_ps_natural_xla, conv_ps_natural
    rng = np.random.default_rng(64)
    x = jnp.asarray(rng.standard_normal((1, 8, 64, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(32) * 0.1, jnp.float32)

    def loss_fused(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv_ps_natural(*a) ** 2)

    def loss_ref(*a):
        return jnp.sum(_conv_ps_natural_xla(*a) ** 2)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('rc', [1, 3])
def test_conv_chain_res_interpret_matches_xla(rc):
    """Residual-fused chain kernel: skip-add + c1 + c2 + the folded
    per-stage residual combine (lanes l%half < rc become x_res - y)."""
    from bsvd_tpu.ops.conv_chain import _chain_res_xla, conv_chain_pallas
    rng = np.random.default_rng(71)
    NT, H, W, C, C1, CO = 2, 12, 16, 16, 24, 8
    x = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    xr = jnp.asarray(rng.standard_normal((NT, H, W, CO)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C1)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(C1) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C1, CO)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    ref = _chain_res_xla(x, x2, xr, w1, b1, w2, b2, 'relu6', 'none', rc)
    for bh in (3, 4, 12):
        got = conv_chain_pallas(x, w1, b1, w2, b2, x2, xr, act1='relu6',
                                act2='none', res_ch=rc, bh=bh,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')


def test_conv_chain_res_embed_interpret_and_grads():
    """Residual-fused chain with IN-KERNEL lane projection (res_embed):
    x_res is the raw folded stage input; the kernel projects it to output
    lanes via the 0/1 embed matrix. Forward == XLA oracle; grads == vjp
    through the oracle (tail-stage path, 2*s_out < 128)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from bsvd_tpu.ops.conv_chain import (_chain_res_xla, conv_chain_pallas,
                                         conv_chain_add2_res)
    rng = np.random.default_rng(77)
    NT, H, W, C, C1 = 2, 8, 64, 16, 24
    in_c, s_out, rc = 8, 4, 3
    CO = 2 * s_out
    x = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    xr = jnp.asarray(rng.standard_normal((NT, H, W, 2 * in_c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C1)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(C1) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C1, CO)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    ref = _chain_res_xla(x, x2, xr, w1, b1, w2, b2, 'relu6', 'none', rc,
                         res_embed=(in_c, s_out))
    for bh in (2, 4):
        got = conv_chain_pallas(x, w1, b1, w2, b2, x2, xr, act1='relu6',
                                act2='none', res_ch=rc, bh=bh,
                                res_embed=(in_c, s_out), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')

    def loss_fused(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv_chain_add2_res(
                *a, 'relu6', 'none', rc, False, (in_c, s_out)) ** 2)

    def loss_ref(*a):
        return jnp.sum(_chain_res_xla(*a, 'relu6', 'none', rc,
                                      res_embed=(in_c, s_out)) ** 2)
    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(x, x2, xr, w1, b1,
                                                       w2, b2)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(x, x2, xr, w1, b1,
                                                     w2, b2)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)


def test_conv_chain_res_gradients():
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from bsvd_tpu.ops.conv_chain import _chain_res_xla, conv_chain_add2_res
    rng = np.random.default_rng(72)
    x = jnp.asarray(rng.standard_normal((1, 8, 64, 16)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((1, 8, 64, 16)), jnp.float32)
    xr = jnp.asarray(rng.standard_normal((1, 8, 64, 8)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32)

    def loss_fused(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv_chain_add2_res(*a) ** 2)

    def loss_ref(*a):
        return jnp.sum(_chain_res_xla(*a, 'relu6', 'none', 3) ** 2)
    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(x, x2, xr, w1, b1,
                                                       w2, b2)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(x, x2, xr, w1, b1,
                                                     w2, b2)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)


def test_supported_gate_matches_kernel_block_pick_n_in():
    """The support gates must size the VMEM working set with the SAME number
    of inputs the call site passes: a fused skip-add (n_in=2) enlarges the
    ring buffer ~60%, so a block that fits at n_in=1 may not exist at
    n_in=2. Regression for the 4K-width crash: gate(n_in=1) said yes while
    conv3x3_pallas(x, x2) found no row block and raised."""
    from bsvd_tpu.ops.conv3x3 import _pick_bh

    # the reviewer's failing shape: 4K up1 site (540, 1920, 128) tsm bf16 —
    # a 1-input block exists, a 2-input block does not
    assert _pick_bh(540, 1920, 128, 128, 'tsm', 2, n_in=1) is not None
    assert _pick_bh(540, 1920, 128, 128, 'tsm', 2, n_in=2) is None

    # every gate threads n_in through to _pick_bh (keyword accepted and
    # effective on both the natural and the C=64 width-folded branch)
    from bsvd_tpu.ops.conv3x3 import conv3x3_supported
    from bsvd_tpu.ops.shift_conv import shift_conv_supported
    conv3x3_supported((1, 540, 1920, 128), (3, 3, 128, 128),
                      jnp.bfloat16, n_in=2)
    shift_conv_supported((1, 540, 1920, 128), (3, 3, 128, 128),
                         jnp.bfloat16, 'none', n_in=2)

    # flagship 540p fused-add sites must still qualify at n_in=2
    assert _pick_bh(270, 480, 128, 128, 'tsm', 2, n_in=2) is not None
    assert _pick_bh(540, 480, 128, 128, 'none', 2, n_in=2) is not None
    assert _pick_bh(135, 240, 256, 256, 'tsm', 2, n_in=2) is not None


def test_kernel_entries_reject_unknown_act():
    """Kernel entry points raise on acts their epilogues do not implement
    (instead of silently skipping the activation)."""
    from bsvd_tpu.ops.conv3x3 import conv3x3_pallas
    from bsvd_tpu.ops.conv_s2 import conv_s2_pallas
    from bsvd_tpu.ops.conv_chain import conv_chain_pallas
    from bsvd_tpu.ops.bibuffer_conv import bibuffer_conv_pallas
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * .1, jnp.float32)
    ws = jnp.asarray(rng.standard_normal((3, 2, 128, 128)) * .1, jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    with pytest.raises(ValueError, match='acts'):
        conv3x3_pallas(x, w, b, act='gelu', interpret=True)
    with pytest.raises(ValueError, match='acts'):
        conv_s2_pallas(x, ws, b, act='gelu', interpret=True)
    with pytest.raises(ValueError, match='acts'):
        conv_chain_pallas(x, w, b, w, b, act1='gelu', interpret=True)
    with pytest.raises(ValueError, match='acts'):
        bibuffer_conv_pallas(x, x, w, b, act='gelu', interpret=True)


# ---------------------------------------------------------------------------
# width-fold MAC dedup (_tile.dots_folded): 6-dot folded contraction
# ---------------------------------------------------------------------------

def test_dedup_folded_weights_structure():
    """dedup_folded_weights recovers exactly the original taps from the
    fold_width_weights layout: the dense part is the kx=1 tap and the
    combined part is block-diagonal [w(:,0) | w(:,2)]."""
    from bsvd_tpu.ops._tile import dedup_folded_weights
    from bsvd_tpu.ops.conv3x3 import fold_width_weights
    rng = np.random.default_rng(5)
    C, CO = 8, 4
    w = jnp.asarray(rng.standard_normal((3, 3, C, CO)), jnp.float32)
    b = jnp.zeros((CO,), jnp.float32)
    w2, _ = fold_width_weights(w, b)
    wd, wc = dedup_folded_weights(w2)
    assert wd.shape == (3, 2 * C, 2 * CO) and wc.shape == (3, 2 * C, 2 * CO)
    wcn = np.asarray(wc)
    np.testing.assert_array_equal(wcn[:, :C, :CO], np.asarray(w[:, 0]))
    np.testing.assert_array_equal(wcn[:, C:, CO:], np.asarray(w[:, 2]))
    assert not wcn[:, :C, CO:].any() and not wcn[:, C:, :CO].any()
    np.testing.assert_array_equal(np.asarray(wd), np.asarray(w2[:, 1]))


@pytest.mark.parametrize('case', ['nt3', 'nt1', 'add2'])
def test_folded_dedup_conv_interpret_matches_xla(case):
    """The 6-dot dedup contraction (folded=True, _tile.dots_folded) ==
    plain XLA conv on the unfolded view, both kernel variants."""
    from bsvd_tpu.ops.conv3x3 import (_conv3x3_xla, conv3x3_pallas,
                                      fold_width_weights)
    rng = np.random.default_rng(21)
    nt = 1 if case == 'nt1' else 3
    NT, H, W, C, CO = nt, 8, 24, 16, 8
    x = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    x2 = (jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
          if case == 'add2' else None)
    w = jnp.asarray(rng.standard_normal((3, 3, C, CO)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    ref = _conv3x3_xla(x if x2 is None else x + x2, w, b, 'relu6')
    w2, b2 = fold_width_weights(w, b)
    xf = x.reshape(NT, H, W // 2, 2 * C)
    x2f = None if x2 is None else x2.reshape(NT, H, W // 2, 2 * C)
    for bh in (2, 4, 8):
        got = conv3x3_pallas(xf, w2, b2, x2f, shift='none', act='relu6',
                             bh=bh, folded=True, interpret=True)
        got = np.asarray(got).reshape(NT, H, W, CO)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4,
                                   atol=1e-4, err_msg=f'bh={bh}')


@pytest.mark.parametrize('case', ['plain', 'add2_res'])
def test_folded_dedup_chain_interpret_matches_xla(case):
    """Chained kernel with folded=True (both convs dedup) == XLA composite
    on the unfolded views, incl. the outc residual-combine variant."""
    from bsvd_tpu.ops.conv3x3 import fold_width_weights
    from bsvd_tpu.ops.conv_chain import (_chain_xla, conv_chain_pallas)
    rng = np.random.default_rng(33)
    NT, H, W, C, C1, CO = 2, 8, 16, 8, 16, 8
    x = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C1)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(C1) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C1, CO)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    w1f, b1f = fold_width_weights(w1, b1)
    w2f, b2f = fold_width_weights(w2, b2)
    xf = x.reshape(NT, H, W // 2, 2 * C)
    if case == 'plain':
        ref = _chain_xla(x, w1, b1, w2, b2, 'relu6', 'none')
        got = conv_chain_pallas(xf, w1f, b1f, w2f, b2f, act1='relu6',
                                act2='none', bh=4, folded=True,
                                interpret=True)
    else:
        x2 = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
        xr = jnp.asarray(rng.standard_normal((NT, H, W, CO)), jnp.float32)
        rc = 3
        y = _chain_xla(x, w1, b1, w2, b2, 'relu6', 'none', x2=x2)
        lane = np.arange(CO) % CO  # unfolded: all lanes, mask on folded view
        ref = y
        got = conv_chain_pallas(
            xf, w1f, b1f, w2f, b2f, x2.reshape(NT, H, W // 2, 2 * C),
            xr.reshape(NT, H, W // 2, 2 * CO), act1='relu6', act2='none',
            res_ch=rc, bh=4, folded=True, interpret=True)
        lanef = np.arange(2 * CO) % CO
        reff = np.asarray(y).reshape(NT, H, W // 2, 2 * CO)
        xrf = np.asarray(xr).reshape(NT, H, W // 2, 2 * CO)
        ref = np.where(lanef < rc, xrf - reff, reff)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4,
                                   atol=1e-4)
        return
    got = np.asarray(got).reshape(NT, H, W, CO)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('nt', [1, 2])
def test_conv_ps_natural_interpret_matches_xla(nt):
    """Fused conv + r=2 pixel shuffle in NATURAL layout (up2's site):
    block-structured (h, 2, w, 2, c) writes == XLA conv + shuffle."""
    from bsvd_tpu.ops.conv3x3 import (_conv_ps_natural_xla,
                                      conv_ps_natural_pallas)
    rng = np.random.default_rng(9)
    NT, H, W, C, CO = nt, 8, 16, 16, 32       # c = CO//4 = 8
    x = jnp.asarray(rng.standard_normal((NT, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, CO)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(CO) * 0.1, jnp.float32)
    ref = _conv_ps_natural_xla(x, w, b)
    for bh in (2, 4, 8):
        got = conv_ps_natural_pallas(x, w, b, bh=bh, interpret=True)
        assert got.shape == (NT, 2 * H, 2 * W, CO // 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f'bh={bh}')
