"""Fused MLP-block kernel (ops/fused_mlp.py).

Parity is against the unfused flax-semantics formula; the kernel runs
in interpret mode on CPU (on-chip timing lives in RESULTS.md and
tests/test_tpu_hardware.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfc_vit_tpu.ops.fused_mlp import (
    fused_mlp_block,
    fused_mlp_fits,
    mlp_block_xla,
)


def _inputs(b=2, n=196, d=256, f=512, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)
    return (
        mk(b, n, d), mk(d) * 0.1 + 1.0, mk(d) * 0.1,
        mk(d, f) / np.sqrt(d), mk(f) * 0.1,
        mk(f, d) / np.sqrt(f), mk(d) * 0.1,
    )


@pytest.mark.parametrize("activation", ["gelu", "relu"])
def test_kernel_matches_xla_fp32(activation):
    args = _inputs()
    ref = mlp_block_xla(*args, activation=activation)
    out = fused_mlp_block(*args, activation=activation, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_kernel_matches_xla_bf16():
    args = _inputs(dtype=jnp.bfloat16)
    ref = mlp_block_xla(*args)
    out = fused_mlp_block(*args, interpret=True)
    # same rounding points -> bf16-level agreement
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_row_padding():
    # B*N not a multiple of the 256-row tile exercises the pad path
    args = _inputs(b=1, n=100, d=256, f=512)
    ref = mlp_block_xla(*args)
    out = fused_mlp_block(*args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_xla_rule_grads_are_unfused_formula():
    """train_impl='xla' restores the round-2 store-residuals rule:
    grads bit-match the unfused composition."""
    args = _inputs(b=1, n=64, d=256, f=512)

    def loss_fused(*a):
        return jnp.sum(
            fused_mlp_block(*a, interpret=True, train_impl="xla") ** 2
        )

    def loss_ref(*a):
        return jnp.sum(mlp_block_xla(*a) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 3, 4, 5))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 3, 4, 5))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


@pytest.mark.parametrize("activation", ["gelu", "relu"])
def test_pallas_bwd_matches_xla_grads(activation):
    """The round-3 Pallas backward (recompute-hidden) vs the unfused
    XLA grads: agreement to erf-approx noise in fp32, every argnum
    including both biases and both LN params."""
    args = _inputs(b=1, n=64, d=256, f=512)
    argnums = tuple(range(7))

    def loss_fused(*a):
        return jnp.sum(
            fused_mlp_block(
                *a, activation=activation, interpret=True,
                train_impl="pallas",
            ) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(mlp_block_xla(*a, activation=activation) ** 2)

    g1 = jax.grad(loss_fused, argnums=argnums)(*args)
    g2 = jax.grad(loss_ref, argnums=argnums)(*args)
    for a, b in zip(g1, g2):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_pallas_bwd_row_padding_grads():
    """B*N not a multiple of the row tile: pad rows (zero g) must not
    contaminate parameter grads."""
    args = _inputs(b=1, n=100, d=256, f=512)
    argnums = tuple(range(7))

    def loss_fused(*a):
        return jnp.sum(
            fused_mlp_block(*a, interpret=True, train_impl="pallas") ** 2
        )

    def loss_ref(*a):
        return jnp.sum(mlp_block_xla(*a) ** 2)

    g1 = jax.grad(loss_fused, argnums=argnums)(*args)
    g2 = jax.grad(loss_ref, argnums=argnums)(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_pallas_bwd_bf16():
    """bf16 end-to-end (the production train dtype): grads track the
    unfused bf16 composition to bf16-level tolerance.  All-bf16 args
    (the _inputs helper's numpy-scalar scaling would leave the weights
    fp32 — a mixed-precision combo no model path produces)."""
    args = tuple(
        a.astype(jnp.bfloat16) for a in _inputs(b=2, n=64, d=256, f=512)
    )

    def loss_fused(*a):
        return jnp.sum(
            fused_mlp_block(*a, interpret=True, train_impl="pallas")
            .astype(jnp.float32) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(mlp_block_xla(*a).astype(jnp.float32) ** 2)

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(g1, g2):
        assert a.dtype == b.dtype == jnp.bfloat16
        # Elementwise comparison is meaningless at bf16 (even two XLA
        # compositions differing in ONE rounding point show ~25% p99
        # elementwise, measured) — assert training-equivalence via
        # relative L2 per leaf (measured 0.2-0.6%).
        af = np.asarray(a, np.float32).ravel()
        bf = np.asarray(b, np.float32).ravel()
        rel = np.linalg.norm(af - bf) / (np.linalg.norm(bf) + 1e-9)
        assert rel < 2e-2, rel


def test_pallas_bwd_no_residual():
    args = _inputs(b=1, n=64, d=256, f=512)

    def loss_fused(*a):
        return jnp.sum(
            fused_mlp_block(
                *a, residual=False, interpret=True, train_impl="pallas"
            ) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(mlp_block_xla(*a, residual=False) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_fits_gate():
    assert fused_mlp_fits(768, 3072, 2)      # ViT-B bf16
    assert not fused_mlp_fits(4096, 16384, 2)  # weights alone >> VMEM


def test_param_tree_unchanged_and_model_runs():
    """_FeedForward's param paths must stay nn.Dense/nn.LayerNorm-shaped
    (checkpoints + torch transplants depend on them)."""
    from sfc_vit_tpu.models import SimpleViT

    m = SimpleViT(image_size=32, patch_size=4, num_classes=10, dim=64,
                  depth=1, heads=2, mlp_dim=128, dim_head=32)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = m.init({"params": jax.random.key(0)}, x)["params"]
    ff = params["transformer"]["ff_0"]
    assert set(ff) == {"norm", "fc1", "fc2"}
    assert ff["norm"]["scale"].shape == (64,)
    assert ff["fc1"]["kernel"].shape == (64, 128)
    assert ff["fc2"]["bias"].shape == (64,)
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 10) and bool(jnp.all(jnp.isfinite(out)))


def _tail_inputs(b=2, n=64, d=256, f=512, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)
    return (
        mk(b, n, d), mk(b, n, d),
        mk(d) * 0.1 + 1.0, mk(d) * 0.1,
        mk(d, f) / np.sqrt(d), mk(f) * 0.1,
        mk(f, d) / np.sqrt(f), mk(d) * 0.1,
        mk(d) * 0.1 + 1.0, mk(d) * 0.1,
    )


def test_postnorm_tail_matches_xla_fp32():
    from sfc_vit_tpu.ops.fused_mlp import (
        fused_postnorm_tail,
        postnorm_tail_xla,
    )

    args = _tail_inputs()
    ref = postnorm_tail_xla(*args)
    out = fused_postnorm_tail(*args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5
    )


def test_postnorm_tail_matches_xla_bf16():
    from sfc_vit_tpu.ops.fused_mlp import (
        fused_postnorm_tail,
        postnorm_tail_xla,
    )

    args = _tail_inputs(dtype=jnp.bfloat16)
    ref = postnorm_tail_xla(*args)
    out = fused_postnorm_tail(*args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_postnorm_tail_xla_rule_grads_are_unfused_formula():
    from sfc_vit_tpu.ops.fused_mlp import (
        fused_postnorm_tail,
        postnorm_tail_xla,
    )

    args = _tail_inputs(n=32, d=128, f=256)

    def loss_fused(*a):
        return jnp.sum(
            fused_postnorm_tail(*a, interpret=True, train_impl="xla")
            ** 2
        )

    def loss_ref(*a):
        return jnp.sum(postnorm_tail_xla(*a) ** 2)

    argnums = tuple(range(10))
    g1 = jax.grad(loss_fused, argnums=argnums)(*args)
    g2 = jax.grad(loss_ref, argnums=argnums)(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_postnorm_tail_pallas_bwd_matches_xla_grads():
    """Round 3: the saved-acts tail backward vs the unfused grads —
    every argnum (both residual inputs, both LNs, both projections)."""
    from sfc_vit_tpu.ops.fused_mlp import (
        fused_postnorm_tail,
        postnorm_tail_xla,
    )

    args = _tail_inputs(n=32, d=128, f=256)
    argnums = tuple(range(10))

    def loss_fused(*a):
        return jnp.sum(
            fused_postnorm_tail(*a, interpret=True, train_impl="pallas")
            ** 2
        )

    def loss_ref(*a):
        return jnp.sum(postnorm_tail_xla(*a) ** 2)

    g1 = jax.grad(loss_fused, argnums=argnums)(*args)
    g2 = jax.grad(loss_ref, argnums=argnums)(*args)
    for a, b in zip(g1, g2):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4
        )


def test_postnorm_tail_pallas_bwd_bf16_and_padding():
    """bf16 + a non-tile-multiple row count through the saved-acts tail
    backward: training-equivalence via relative L2."""
    from sfc_vit_tpu.ops.fused_mlp import (
        fused_postnorm_tail,
        postnorm_tail_xla,
    )

    args = tuple(
        a.astype(jnp.bfloat16)
        for a in _tail_inputs(b=1, n=100, d=128, f=256)
    )

    def loss_fused(*a):
        return jnp.sum(
            fused_postnorm_tail(*a, interpret=True, train_impl="pallas")
            .astype(jnp.float32) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(
            postnorm_tail_xla(*a).astype(jnp.float32) ** 2
        )

    g1 = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for a, b in zip(g1, g2):
        af = np.asarray(a, np.float32).ravel()
        bf = np.asarray(b, np.float32).ravel()
        rel = np.linalg.norm(af - bf) / (np.linalg.norm(bf) + 1e-9)
        # two LN stages + the bf16-saved pre-LN2 sum add one rounding
        # stage over the MLP-block case (fp32 parity is 3e-4 above);
        # measured worst leaf 2.5%
        assert rel < 4e-2, rel


def test_postnorm_layer_model_parity(monkeypatch):
    """TorchTransformerEncoderLayer: forced fused tail (interpret) ==
    the unfused formula, params stay nn-shaped, dropout path intact."""
    from sfc_vit_tpu.models import simple_vit as sv
    from sfc_vit_tpu.models.layers import TorchTransformerEncoderLayer

    layer = TorchTransformerEncoderLayer(
        dim=128, n_heads=2, hidden_dim=256, dropout_rate=0.1
    )
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((2, 48, 128)),
        jnp.float32,
    )
    params = layer.init(
        {"params": jax.random.key(0)}, x, True
    )["params"]
    assert set(params) == {
        "self_attn", "norm1", "norm2", "linear1", "linear2"
    }
    assert params["linear1"]["kernel"].shape == (128, 256)
    assert params["norm2"]["scale"].shape == (128,)

    ref = layer.apply({"params": params}, x, True)
    monkeypatch.setattr(sv, "_FORCE_FUSED", True)
    out = layer.apply({"params": params}, x, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    # dropout (training) path: needs rng, stays unfused, still runs
    out_d = layer.apply(
        {"params": params}, x, False,
        rngs={"dropout": jax.random.key(1)},
    )
    assert out_d.shape == x.shape and bool(jnp.all(jnp.isfinite(out_d)))


def test_postnorm_tail_shape_fuzz():
    from sfc_vit_tpu.ops.fused_mlp import (
        fused_postnorm_tail,
        postnorm_tail_xla,
    )

    for b, n, d, f in [(1, 13, 128, 256), (3, 50, 256, 128),
                       (2, 300, 128, 512)]:
        args = _tail_inputs(b=b, n=n, d=d, f=f, seed=b + n)
        ref = postnorm_tail_xla(*args)
        out = fused_postnorm_tail(*args, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5,
            err_msg=f"shape {(b, n, d, f)}",
        )
