"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfc_vit_tpu.ops.attention import dot_product_attention_xla
from sfc_vit_tpu.ops.flash_attention import flash_attention


def _qkv(b=2, n=196, h=4, dh=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, n, h, dh)), dtype=dtype
    )
    return mk(), mk(), mk()


@pytest.mark.parametrize("n", [64, 128, 196, 300])
def test_flash_attention_matches_xla(n):
    q, k, v = _qkv(n=n)
    want = dot_product_attention_xla(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_flash_attention_grads_match_xla():
    q, k, v = _qkv(n=64)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(dot_product_attention_xla(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_flash_attention_bf16():
    q, k, v = _qkv(n=128, dtype=jnp.bfloat16)
    want = dot_product_attention_xla(q, k, v).astype(jnp.float32)
    got = flash_attention(q, k, v, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )
