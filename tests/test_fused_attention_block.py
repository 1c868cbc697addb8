"""Fused pre-norm attention-block kernel (ops/fused_attention_block.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfc_vit_tpu.ops.fused_attention_block import (
    attention_block_train,
    attention_block_xla,
    fused_attention_block,
    fused_attention_block_fits,
)


def _inputs(b=4, n=196, d=256, heads=4, dh=64, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    inner = heads * dh
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)
    return (
        mk(b, n, d), mk(d) * 0.1 + 1.0, mk(d) * 0.1,
        mk(d, 3 * inner) / np.sqrt(d), mk(inner, d) / np.sqrt(inner),
    ), heads


def test_kernel_matches_xla_fp32():
    args, heads = _inputs()
    ref = attention_block_xla(*args, heads=heads)
    out = fused_attention_block(*args, heads, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5
    )


def test_kernel_matches_xla_bf16():
    args, heads = _inputs(dtype=jnp.bfloat16)
    ref = attention_block_xla(*args, heads=heads)
    out = fused_attention_block(*args, heads, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=4e-2, atol=4e-2,
    )


def test_batch_not_multiple_of_block():
    # block_b auto-halves until it divides the batch
    args, heads = _inputs(b=3, n=100)
    ref = attention_block_xla(*args, heads=heads)
    out = fused_attention_block(*args, heads, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5
    )


def test_xla_rule_grads_are_packed_vjp_composition():
    """train_impl='xla' restores the round-2 store-weights rule:
    grads bit-match the packed-QKV composition."""
    args, heads = _inputs(b=2, n=64)

    def loss_fused(*a):
        return jnp.sum(
            fused_attention_block(
                *a, heads, interpret=True,
                train_impl="xla",
            ) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(attention_block_train(*a, heads=heads) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 3, 4))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 3, 4))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_pallas_bwd_matches_composition_grads():
    """The round-3 recompute-softmax Pallas backward vs the packed-QKV
    composition grads: fp32, every argnum (x, both LN params, both
    projections)."""
    args, heads = _inputs(b=2, n=64)
    argnums = tuple(range(5))

    def loss_fused(*a):
        return jnp.sum(
            fused_attention_block(
                *a, heads, interpret=True, train_impl="pallas"
            ) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(attention_block_train(*a, heads=heads) ** 2)

    g1 = jax.grad(loss_fused, argnums=argnums)(*args)
    g2 = jax.grad(loss_ref, argnums=argnums)(*args)
    for a, b in zip(g1, g2):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4
        )


def test_pallas_bwd_odd_shapes_grads():
    """Sequence padding (n=100 -> 112) + block_b auto-halving under the
    Pallas backward."""
    args, heads = _inputs(b=3, n=100)
    argnums = tuple(range(5))

    def loss_fused(*a):
        return jnp.sum(
            fused_attention_block(
                *a, heads, interpret=True, train_impl="pallas"
            ) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(attention_block_train(*a, heads=heads) ** 2)

    g1 = jax.grad(loss_fused, argnums=argnums)(*args)
    g2 = jax.grad(loss_ref, argnums=argnums)(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4
        )


def test_pallas_bwd_bf16_grads():
    """bf16 end-to-end: training-equivalence via relative L2 per leaf
    (elementwise is meaningless at bf16 — see fused-MLP test)."""
    args, heads = _inputs(b=2, n=64)
    args = tuple(a.astype(jnp.bfloat16) for a in args)

    def loss_fused(*a):
        return jnp.sum(
            fused_attention_block(
                *a, heads, interpret=True, train_impl="pallas"
            ).astype(jnp.float32) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(
            attention_block_train(*a, heads=heads).astype(jnp.float32)
            ** 2
        )

    g1 = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    for a, b in zip(g1, g2):
        assert a.dtype == jnp.bfloat16
        af = np.asarray(a, np.float32).ravel()
        bf = np.asarray(b, np.float32).ravel()
        rel = np.linalg.norm(af - bf) / (np.linalg.norm(bf) + 1e-9)
        assert rel < 2e-2, rel


def test_pallas_bwd_n_actual_pad_semantics():
    """Pallas backward with n_actual: real-row grads match the train
    rule, pad-row cotangents pass straight through, pad rows add
    nothing to parameter grads."""
    args, heads = _inputs(b=2, n=60)
    x = args[0]

    def loss_padded(x, lns, lnb, wq, wo):
        out = fused_attention_block(
            jnp.pad(x, ((0, 0), (0, 4), (0, 0))), lns, lnb, wq, wo,
            heads, None, 1e-5, True, 60, "pallas",
        )
        return jnp.sum(out[:, :60] ** 2)

    def loss_ref(x, lns, lnb, wq, wo):
        return jnp.sum(
            attention_block_train(x, lns, lnb, wq, wo, heads=heads) ** 2
        )

    g1 = jax.grad(loss_padded, argnums=(0, 1, 3, 4))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 3, 4))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4
        )

    # pad-row cotangent pass-through: d/dxp of sum(out[:, 60:] * C)
    # must be exactly C on pad rows and affect no parameter grad
    xp = jnp.pad(x, ((0, 0), (0, 4), (0, 0)))

    def loss_pad_rows(xp, lns, lnb, wq, wo):
        out = fused_attention_block(
            xp, lns, lnb, wq, wo, heads, None, 1e-5, True, 60, "pallas"
        )
        return jnp.sum(out[:, 60:] * 3.0)

    gx, gw = jax.grad(loss_pad_rows, argnums=(0, 3))(xp, *args[1:])
    np.testing.assert_allclose(np.asarray(gx[:, 60:]), 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), 0.0, atol=1e-6)


def test_fits_gate():
    assert fused_attention_block_fits(196, 768, 768, 2)   # ViT-B bf16
    assert not fused_attention_block_fits(4096, 768, 768, 2)  # long N


def test_model_params_and_impls_agree():
    """Param tree unchanged; every attn_impl still runs and the auto
    (kernel-eligible-on-TPU, XLA here) path matches explicit 'xla'."""
    from sfc_vit_tpu.models import SimpleViT

    m = SimpleViT(image_size=32, patch_size=4, num_classes=10, dim=64,
                  depth=1, heads=2, mlp_dim=128, dim_head=32)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, 32, 3)),
        jnp.float32,
    )
    params = m.init({"params": jax.random.key(0)}, x)["params"]
    attn = params["transformer"]["attn_0"]
    assert set(attn) == {"norm", "to_qkv", "to_out"}
    assert attn["to_qkv"]["kernel"].shape == (64, 3 * 64)
    assert "bias" not in attn["to_qkv"]
    ref = m.apply({"params": params}, x)
    m_xla = SimpleViT(image_size=32, patch_size=4, num_classes=10, dim=64,
                      depth=1, heads=2, mlp_dim=128, dim_head=32,
                      attn_impl="xla")
    out = m_xla.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_n_actual_masks_pad_keys():
    """Kernel with n_actual on pre-padded input == unpadded reference
    on the real rows (pad keys masked out of every softmax)."""
    args, heads = _inputs(b=2, n=196)
    x = args[0]
    n_pad = 208
    xp = jnp.pad(x, ((0, 0), (0, n_pad - 196), (0, 0)))
    # garbage in the pad rows must not leak into real rows
    xp = xp.at[:, 196:].set(7.7)
    ref = attention_block_xla(x, *args[1:], heads=heads)
    out = fused_attention_block(
        xp, *args[1:], heads, None, 1e-5, True, 196
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :196]), np.asarray(ref), rtol=3e-5, atol=3e-5
    )
    assert np.isfinite(np.asarray(out)).all()


def test_n_actual_train_rule_passthrough_grads():
    args, heads = _inputs(b=2, n=60)
    x = args[0]
    xp = jnp.pad(x, ((0, 0), (0, 4, ), (0, 0)))

    def loss_padded(x, lns, lnb, wq, wo):
        out = fused_attention_block(
            jnp.pad(x, ((0, 0), (0, 4), (0, 0))), lns, lnb, wq, wo,
            heads, None, 1e-5, True, 60, "xla",
        )
        return jnp.sum(out[:, :60] ** 2)

    def loss_ref(x, lns, lnb, wq, wo):
        return jnp.sum(
            attention_block_train(x, lns, lnb, wq, wo, heads=heads) ** 2
        )

    g1 = jax.grad(loss_padded, argnums=(0, 1, 3, 4))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 3, 4))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )
    # pad-row cotangents pass straight through: out[:, 60:] == x-pad rows
    out = attention_block_train(xp, *args[1:], heads=heads, n_actual=60)
    np.testing.assert_array_equal(
        np.asarray(out[:, 60:]), np.asarray(xp[:, 60:])
    )


def test_pad_once_model_layout_parity(monkeypatch):
    """PreNormTransformer's pad-once layout (forced on CPU, interpret
    kernels) matches the unfused 'xla' path exactly: 25 tokens pad to
    32 for the whole stack and are sliced before the final LN."""
    from sfc_vit_tpu.models import SimpleViT
    from sfc_vit_tpu.models import simple_vit as sv

    kw = dict(image_size=20, patch_size=4, num_classes=7, dim=128,
              depth=2, heads=2, mlp_dim=192, dim_head=64)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 20, 20, 3)),
        jnp.float32,
    )
    m = SimpleViT(**kw)
    params = m.init({"params": jax.random.key(0)}, x)["params"]
    ref = SimpleViT(attn_impl="xla", **kw).apply({"params": params}, x)

    monkeypatch.setattr(sv, "_FORCE_FUSED", True)
    out = m.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    # grads through the pad-once stack == unfused grads
    def loss(mod):
        def f(p):
            return jnp.sum(mod.apply({"params": p}, x) ** 2)
        return f

    g1 = jax.grad(loss(m))(params)
    g2 = jax.grad(loss(SimpleViT(attn_impl="xla", **kw)))(params)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_observability_capture_still_works():
    from sfc_vit_tpu.models import SimpleViT

    m = SimpleViT(image_size=32, patch_size=4, num_classes=10, dim=64,
                  depth=1, heads=2, mlp_dim=128, dim_head=32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = m.init({"params": jax.random.key(0)}, x)
    out, inter = m.apply(params, x, mutable=["intermediates"])
    w = inter["intermediates"]["transformer"]["attn_0"][
        "attention_weights"
    ][0]
    assert w.shape == (1, 2, 64, 64)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)


@pytest.mark.parametrize(
    "b,n,d,heads,dh",
    [
        (1, 17, 128, 1, 128),   # tiny odd n, single head
        (3, 50, 256, 4, 32),    # odd batch, dh < lane width
        (2, 16, 128, 2, 64),    # n == sublane multiple exactly
        (5, 129, 128, 2, 192),  # dh > 128 (family-A style), odd n
    ],
)
def test_kernel_shape_fuzz(b, n, d, heads, dh):
    """Odd shapes: padding, block_b auto-halving, non-standard dh."""
    args, _ = _inputs(b=b, n=n, d=d, heads=heads, dh=dh, seed=b * n)
    ref = attention_block_xla(*args, heads=heads)
    out = fused_attention_block(*args, heads, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5
    )


def test_invalid_packed_shapes_raise():
    """Same contract as packed_qkv_attention: silent head truncation
    is rejected at every entry point (kernel + XLA reference)."""
    x = jnp.zeros((1, 8, 128), jnp.float32)
    bad_wq = jnp.zeros((128, 770), jnp.float32)  # not divisible by 12
    wo = jnp.zeros((256, 128), jnp.float32)
    for fn in (
        lambda: fused_attention_block(
            x, jnp.ones(128), jnp.zeros(128), bad_wq, wo, 4,
            interpret=True,
        ),
        lambda: attention_block_xla(
            x, jnp.ones(128), jnp.zeros(128), bad_wq, wo, heads=4
        ),
    ):
        with pytest.raises(ValueError, match="divisible"):
            fn()


def test_remat_pad_once_fused_grads(monkeypatch):
    """remat (jax.checkpoint) x pad-once x fused custom-VJP kernels:
    gradients match the non-remat stack exactly."""
    from sfc_vit_tpu.models import simple_vit as sv
    from sfc_vit_tpu.models.simple_vit import PreNormTransformer

    monkeypatch.setattr(sv, "_FORCE_FUSED", True)
    kw = dict(dim=128, depth=2, heads=2, dim_head=64, mlp_dim=192)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 25, 128)),
        jnp.float32,
    )
    t = PreNormTransformer(remat=True, **kw)
    p = t.init({"params": jax.random.key(0)}, x)["params"]
    g1 = jax.grad(lambda p: jnp.sum(t.apply({"params": p}, x) ** 2))(p)
    t2 = PreNormTransformer(remat=False, **kw)
    g2 = jax.grad(lambda p: jnp.sum(t2.apply({"params": p}, x) ** 2))(p)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_bf16exp_softmax_variant_close_to_fp32():
    """Opt-in bf16-exp softmax (fwd squeeze A/B candidate): output
    stays within bf16 tolerance of the fp32-softmax kernel."""
    from sfc_vit_tpu.ops.fused_attention_block import _fused_attn_block

    args, heads = _inputs(b=2, n=100, dtype=jnp.bfloat16)
    kw = dict(heads=heads, scale=64 ** -0.5, eps=1e-5, interpret=True)
    ref = _fused_attn_block(*args, **kw)
    got = _fused_attn_block(*args, softmax_impl="bf16exp", **kw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_bwd_bf16exp_recompute_grads_close():
    """bf16exp softmax-recompute in the backward: grads stay within
    bf16 training tolerance of the fp32-recompute backward."""
    from sfc_vit_tpu.ops.fused_attention_block import _fused_attn_block_bwd

    args, heads = _inputs(b=2, n=64, dtype=jnp.bfloat16)
    x = args[0].astype(jnp.bfloat16)
    rng = np.random.default_rng(9)
    g = jnp.asarray(rng.standard_normal(x.shape), jnp.bfloat16)
    rest = tuple(a.astype(jnp.bfloat16) for a in args[1:])
    kw = dict(heads=heads, scale=64 ** -0.5, eps=1e-5, interpret=True)
    ref = _fused_attn_block_bwd(x, g, *rest, **kw)
    got = _fused_attn_block_bwd(x, g, *rest, softmax_impl="bf16exp", **kw)
    for a, b in zip(got, ref):
        af = np.asarray(a, np.float32).ravel()
        bf = np.asarray(b, np.float32).ravel()
        rel = np.linalg.norm(af - bf) / (np.linalg.norm(bf) + 1e-9)
        assert rel < 2e-2, rel


def test_bwd_block_b_chooser_long_n_vmem():
    """Regression: at (b=16, n_pad=1024, d=128, inner=128, fp32) the
    single-iteration footprint model chose block_b=4, whose REAL Mosaic
    scoped-vmem allocation is 103.8 MiB > the 100 MiB limit (observed
    compile-time OOM, round 4).  The chooser must now account for the
    unrolled per-(image, head) loop's live window and pick <= 2 there,
    while keeping the measured-best block_b=8 at ViT-B geometry."""
    from sfc_vit_tpu.ops.fused_attention_block import (
        attn_block_bwd_fits,
        choose_bwd_block_b,
    )

    # the geometry that OOMed on-chip (CurveViT dim=128, 1024 tokens)
    assert choose_bwd_block_b(16, 1024, 128, 128, 4, True) <= 2
    # ViT-B/16 bf16 train (n_pad=208): stays at the measured-best 8
    assert choose_bwd_block_b(64, 208, 768, 768, 2, True) == 8
    # the train-rule gate still admits both geometries (block_b shrinks)
    assert attn_block_bwd_fits(1024, 128, 128, 4)
    assert attn_block_bwd_fits(197, 768, 768, 2)
