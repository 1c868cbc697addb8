"""Fused torch-parity MHA kernel (ops/fused_torch_attention.py):
value/grad parity vs the explicit-mask XLA composition (interpret
mode), pad-path semantics, and the model-level gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfc_vit_tpu.ops.fused_torch_attention import (
    fused_torch_mha,
    torch_mha_bwd_fits,
    torch_mha_fits,
    torch_mha_train,
)


def _params(rng, d):
    return (
        jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal((3 * d,)) * 0.01, jnp.float32),
        jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal((d,)) * 0.01, jnp.float32),
    )


@pytest.mark.parametrize("b,n,d,h", [(4, 64, 256, 4), (2, 50, 128, 2)])
def test_fused_torch_mha_parity(b, n, d, h):
    """Kernel fwd + all five grads match the XLA composition given the
    SAME dropout mask (incl. the internal token-pad path at n=50)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    w_in, b_in, w_out, b_out = _params(rng, d)
    keep = 0.9
    mask = jax.random.bernoulli(
        jax.random.key(7), keep, (b, h, n, n)
    ).astype(jnp.float32)

    def f_fused(*a):
        return fused_torch_mha(*a, mask, h, keep=keep, interpret=True,
                               train_impl="pallas")

    def f_xla(*a):
        return torch_mha_train(*a, mask, h, keep=keep)

    args = (x, w_in, b_in, w_out, b_out)
    o1, o2 = f_fused(*args), f_xla(*args)
    assert o1.shape == (b, n, d)
    assert float(jnp.linalg.norm(o1 - o2) / jnp.linalg.norm(o2)) < 1e-5

    loss = lambda f: (lambda *a: (f(*a) ** 2).sum())
    g1 = jax.grad(loss(f_fused), argnums=tuple(range(5)))(*args)
    g2 = jax.grad(loss(f_xla), argnums=tuple(range(5)))(*args)
    for name, a, c in zip(("dx", "dwin", "dbin", "dwout", "dbout"),
                          g1, g2):
        rel = float(jnp.linalg.norm(a - c) / (jnp.linalg.norm(c) + 1e-30))
        assert rel < 1e-5, (name, rel)


def test_fused_torch_mha_mask_actually_drops():
    """A zero row in the mask zeroes that (image, head) contribution
    and the kept entries are scaled by 1/keep."""
    rng = np.random.default_rng(1)
    b, n, d, h = 2, 16, 128, 2
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    w_in, b_in, w_out, b_out = _params(rng, d)
    keep = 0.5
    ones = jnp.ones((b, h, n, n), jnp.float32)
    out_full = fused_torch_mha(x, w_in, b_in, w_out, b_out, ones, h,
                               keep=1.0, interpret=True,
                               train_impl="pallas")
    out_scaled = fused_torch_mha(x, w_in, b_in, w_out, b_out, ones, h,
                                 keep=keep, interpret=True,
                                 train_impl="pallas")
    # all-ones mask at keep=0.5 doubles every probability => the
    # attention output doubles pre-projection; check via the linear
    # out-proj: out_scaled - b_out == 2 * (out_full - b_out)
    np.testing.assert_allclose(
        np.asarray(out_scaled - b_out),
        2.0 * np.asarray(out_full - b_out),
        rtol=2e-4, atol=2e-5,
    )
    zero = ones.at[:, :, :, :].set(0.0)
    out_zero = fused_torch_mha(x, w_in, b_in, w_out, b_out, zero, h,
                               keep=keep, interpret=True,
                               train_impl="pallas")
    # everything dropped: only the biases survive
    want = jnp.broadcast_to(b_out, (b, n, d))
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_torch_mha_xla_rule_matches_kernel_rule():
    """train_impl='xla' (differentiate the composition) and 'pallas'
    (companion backward kernel) produce aligned grads — the same
    two-rule contract the family-B kernels keep."""
    rng = np.random.default_rng(2)
    b, n, d, h = 2, 32, 128, 2
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    w_in, b_in, w_out, b_out = _params(rng, d)
    keep = 0.8
    mask = jax.random.bernoulli(
        jax.random.key(3), keep, (b, h, n, n)
    ).astype(jnp.float32)

    def make(impl):
        def f(*a):
            return (fused_torch_mha(*a, mask, h, keep=keep,
                                    interpret=True,
                                    train_impl=impl) ** 2).sum()
        return f

    g_pl = jax.grad(make("pallas"), argnums=tuple(range(5)))(
        x, w_in, b_in, w_out, b_out)
    g_xla = jax.grad(make("xla"), argnums=tuple(range(5)))(
        x, w_in, b_in, w_out, b_out)
    for a, c in zip(g_pl, g_xla):
        rel = float(jnp.linalg.norm(a - c) / (jnp.linalg.norm(c) + 1e-30))
        assert rel < 1e-5


def test_xla_rule_respects_n_actual():
    """The XLA fallback VJP rule masks pad KEY columns exactly like the
    kernel rule: values + grads restricted to real rows match between
    train_impl='xla' and 'pallas' when n_actual < n."""
    rng = np.random.default_rng(4)
    b, n, d, h = 2, 32, 128, 2
    n_act = 20
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    w_in, b_in, w_out, b_out = _params(rng, d)
    keep = 0.8
    mask = jax.random.bernoulli(
        jax.random.key(9), keep, (b, h, n, n)
    ).astype(jnp.float32)

    def make(impl):
        def f(*a):
            out = fused_torch_mha(*a, mask, h, keep=keep, interpret=True,
                                  n_actual=n_act, train_impl=impl)
            return (out[:, :n_act] ** 2).sum()  # pad rows are don't-care
        return f

    args = (x, w_in, b_in, w_out, b_out)
    v_pl, g_pl = jax.value_and_grad(
        make("pallas"), argnums=tuple(range(5)))(*args)
    v_xla, g_xla = jax.value_and_grad(
        make("xla"), argnums=tuple(range(5)))(*args)
    assert abs(float(v_pl - v_xla)) / abs(float(v_xla)) < 1e-5
    for name, a, c in zip(("dx", "dwin", "dbin", "dwout", "dbout"),
                          g_pl, g_xla):
        rel = float(jnp.linalg.norm(a - c) / (jnp.linalg.norm(c) + 1e-30))
        assert rel < 1e-5, (name, rel)
    # and the masking is real: n_actual changes the real-row value
    v_dense = make("pallas")(*args)
    full = fused_torch_mha(x, w_in, b_in, w_out, b_out, mask, h,
                           keep=keep, interpret=True, train_impl="pallas")
    assert float(v_dense) != float((full[:, :n_act] ** 2).sum())


def test_keep_zero_raises_and_model_falls_back():
    """keep<=0 raises a clear error in the kernel API; the model-level
    gate routes dropout_rate=1.0 to the nn.Dropout path (which returns
    zeroed attention weights without crashing)."""
    from sfc_vit_tpu.models import layers as L
    from sfc_vit_tpu.models import simple_vit as _sv

    rng = np.random.default_rng(5)
    b, n, d, h = 2, 16, 128, 2
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    w_in, b_in, w_out, b_out = _params(rng, d)
    mask = jnp.ones((b, h, n, n), jnp.float32)
    with pytest.raises(ValueError, match="keep > 0"):
        fused_torch_mha(x, w_in, b_in, w_out, b_out, mask, h,
                        keep=0.0, interpret=True)

    mha = L.TorchMultiHeadAttention(dim=d, n_heads=h, dropout_rate=1.0)
    variables = mha.init({"params": jax.random.key(0)}, x,
                         deterministic=True)
    old = _sv._FORCE_FUSED
    _sv._FORCE_FUSED = True
    try:
        out = mha.apply(variables, x, deterministic=False,
                        rngs={"dropout": jax.random.key(1)})
    finally:
        _sv._FORCE_FUSED = old
    # every attention probability dropped -> only out_proj bias remains
    want = jnp.broadcast_to(
        variables["params"]["out_proj"]["bias"], (b, n, d))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_dtype_none_promotes_like_nn_dense():
    """dtype=None + bf16 input computes (and returns) fp32, matching
    stock nn.Dense(dtype=None) promotion with fp32 params."""
    from sfc_vit_tpu.models import layers as L

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 16, 128)), jnp.bfloat16)
    mha = L.TorchMultiHeadAttention(dim=128, n_heads=2, dropout_rate=0.0)
    variables = mha.init({"params": jax.random.key(0)}, x,
                         deterministic=True)
    out = mha.apply(variables, x, deterministic=True)
    assert out.dtype == jnp.float32


def test_fits_gates():
    assert torch_mha_fits(64, 768, 2, 4, save_acts=True)
    assert torch_mha_bwd_fits(64, 768, 2, 4)
    assert not torch_mha_fits(4096, 768, 2, 4)  # short-N kernel only


def test_model_gate_takes_fused_path_under_dropout():
    """TorchMultiHeadAttention routes training-with-dropout through the
    fused kernel under _FORCE_FUSED (interpret mode on CPU), produces
    finite grads, and stays deterministic per rng key."""
    from sfc_vit_tpu.models import layers as L
    from sfc_vit_tpu.models import simple_vit as _sv

    mha = L.TorchMultiHeadAttention(dim=128, n_heads=2, dropout_rate=0.1)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 128)), jnp.float32)
    variables = mha.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, deterministic=True,
    )

    old = _sv._FORCE_FUSED
    _sv._FORCE_FUSED = True
    try:
        def loss(p, key):
            out = mha.apply({"params": p}, x, deterministic=False,
                            rngs={"dropout": key})
            return (out ** 2).sum()

        l1, g = jax.value_and_grad(loss)(
            variables["params"], jax.random.key(5))
        l1b = loss(variables["params"], jax.random.key(5))
        l2 = loss(variables["params"], jax.random.key(6))
    finally:
        _sv._FORCE_FUSED = old
    assert np.isfinite(l1) and float(l1) == float(l1b)
    assert float(l1) != float(l2)  # different key -> different mask
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # deterministic path (no dropout) is unaffected by the gate and
    # still matches the packed formula
    out_det = mha.apply(variables, x, deterministic=True)
    assert out_det.shape == x.shape


def _toy(b=2, n=16, d=64, h=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    w_in = jnp.asarray(rng.standard_normal((d, 3 * d)) / 8, jnp.float32)
    b_in = jnp.zeros((3 * d,), jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((d, d)) / 8, jnp.float32)
    b_out = jnp.zeros((d,), jnp.float32)
    mask = jnp.ones((b, h, n, n), jnp.float32)
    return x, w_in, b_in, w_out, b_out, mask


def test_guards_fire_under_differentiation():
    """jax.grad never executes the custom-vjp primal body, so the
    keep/shape guards must also live in _ftm_fwd (review finding:
    grad with keep=0 returned NaN silently; bad heads raised a
    confusing reshape error from kernel tracing)."""
    from sfc_vit_tpu.ops.fused_torch_attention import fused_torch_mha

    x, w_in, b_in, w_out, b_out, mask = _toy()

    def loss(keep, heads):
        return jax.grad(
            lambda xx: (fused_torch_mha(
                xx, w_in, b_in, w_out, b_out, mask, heads,
                keep=keep, train_impl="xla",
            ) ** 2).sum()
        )(x)

    with pytest.raises(ValueError, match="keep > 0"):
        loss(0.0, 2)
    with pytest.raises(ValueError, match="divisible"):
        loss(0.9, 3)


def test_primal_routes_like_the_vjp_forward():
    """A forward-only call (no differentiation) must honor train_impl
    and the fits gates exactly like _ftm_fwd: train_impl='xla' on CPU
    runs the XLA composition instead of dying in Pallas lowering
    (review finding)."""
    from sfc_vit_tpu.ops.fused_torch_attention import (
        fused_torch_mha,
        torch_mha_train,
    )

    x, w_in, b_in, w_out, b_out, mask = _toy(seed=3)
    got = fused_torch_mha(
        x, w_in, b_in, w_out, b_out, mask, 2, keep=0.9,
        train_impl="xla",
    )
    want = torch_mha_train(
        x, w_in, b_in, w_out, b_out, mask, 2, keep=0.9
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # 'auto' off-TPU without interpret also takes the XLA composition
    got_auto = fused_torch_mha(
        x, w_in, b_in, w_out, b_out, mask, 2, keep=0.9,
        train_impl="auto",
    )
    np.testing.assert_array_equal(np.asarray(got_auto), np.asarray(want))


def test_bwd_block_b_chooser_unroll_overhead():
    """Mirror of fused_attention_block's long-N VMEM regression: the
    backward chooser must include the unrolled per-(image, head) live
    window (measured +40 MB over the single-iteration model at
    n_pad=1024 on the sibling kernel) without demoting any production
    geometry."""
    from sfc_vit_tpu.ops.fused_torch_attention import (
        choose_bwd_block_b,
        torch_mha_bwd_fits,
    )

    # production family-A geometries keep their measured block sizes
    assert choose_bwd_block_b(512, 256, 768, 2, 4) == 8   # flagship 1D
    assert choose_bwd_block_b(256, 208, 768, 2, 12) == 8  # post-norm B
    assert choose_bwd_block_b(64, 208, 768, 4, 12) == 4
    # long-N fp32: footprint+overhead exceeds the limit at every
    # block_b -> the gate must route training to the XLA rule
    assert not torch_mha_bwd_fits(1024, 128, 4, 4)
    assert not torch_mha_bwd_fits(1024, 256, 4, 4)
