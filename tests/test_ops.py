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


@pytest.mark.parametrize("n", [64, 196])
def test_flash_attention_grads_match_xla(n):
    q, k, v = _qkv(n=n)

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


@pytest.mark.parametrize("n,block_q,block_k", [
    (512, 128, 128),   # 4 k-steps per q tile
    (300, 128, 128),   # ragged: n_pad_q=384, n_pad_k=384, masked tail
    (640, 256, 128),   # block_q != block_k
])
def test_flash_attention_streaming_fwd_matches_xla(n, block_q, block_k):
    """Online-softmax K-streaming path (multiple k blocks per q tile)."""
    q, k, v = _qkv(n=n)
    want = dot_product_attention_xla(q, k, v)
    got = flash_attention(q, k, v, None, block_q, block_k, None, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_flash_attention_streaming_fwd_lse():
    """LSE emitted by the streaming forward matches logsumexp."""
    from sfc_vit_tpu.ops.flash_attention import _flash_fwd

    q, k, v = _qkv(n=300, b=1, h=2)
    out, lse = _flash_fwd(q, k, v, q.shape[-1] ** -0.5, block_q=128,
                          block_k=128, return_lse=True, interpret=True)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * q.shape[-1] ** -0.5
    want = jax.nn.logsumexp(logits, axis=-1)  # [B,H,N]
    want = want.reshape(2, 300)
    got = np.asarray(lse)[:, :300, 0]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)

    # single-K-step fast path (static plain-softmax branch) emits the
    # same LSE
    out1, lse1 = _flash_fwd(q, k, v, q.shape[-1] ** -0.5, block_q=128,
                            return_lse=True, interpret=True)
    got1 = np.asarray(lse1)[:, :300, 0]
    np.testing.assert_allclose(got1, np.asarray(want), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n", [300, 512])
def test_flash_attention_streaming_bwd_matches_xla(n, monkeypatch):
    """Force the long-sequence streaming backward at test-sized N."""
    import sfc_vit_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_FUSED_BWD_MAX", 128)
    q, k, v = _qkv(n=n)

    def loss_flash(q, k, v):
        return jnp.sum(
            fa.flash_attention(q, k, v, None, 128, 128, None, True) ** 2
        )

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


# ---------------- gather_project kernel ----------------

from sfc_vit_tpu.ops.gather_project import gather_project, gather_project_xla


@pytest.mark.parametrize("n,k,d", [(196, 768, 64), (256, 12, 32), (64, 48, 128)])
def test_gather_project_matches_xla(n, k, d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, n, k)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, d)) * 0.05, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(d) * 0.1, dtype=jnp.float32)
    lut = jnp.asarray(rng.permutation(n).astype(np.int32))
    want = gather_project_xla(x, lut, w, b)
    got = gather_project(x, lut, w, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_gather_project_grads():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 24)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((24, 32)) * 0.05, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(32) * 0.1, dtype=jnp.float32)
    lut = jnp.asarray(rng.permutation(64).astype(np.int32))

    def loss_pallas(x, w, b):
        return jnp.sum(gather_project(x, lut, w, b, 128, True) ** 2)

    def loss_xla(x, w, b):
        return jnp.sum(gather_project_xla(x, lut, w, b) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-4
        )


def test_fused_tokenizer_matches_unfused():
    """Same params, same output, fused vs XLA path (tree-compatible)."""
    from sfc_vit_tpu.tokenizers import (
        HierarchicalCurveEmbedding,
        PixelCurveEmbedding1D,
    )

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 16, 3)),
        dtype=jnp.float32,
    )
    for make in (
        lambda f: PixelCurveEmbedding1D(
            img_size=16, patch_size=4, embed_dim=32, curve="hilbert", fused=f
        ),
        lambda f: HierarchicalCurveEmbedding(
            img_size=16, patch_size_list=(4, 1), embed_dim=32,
            curve="morton", fused=f,
        ),
    ):
        ref_mod, fused_mod = make(False), make(True)
        params = ref_mod.init(jax.random.key(0), x)["params"]
        want = ref_mod.apply({"params": params}, x)
        got = fused_mod.apply({"params": params}, x)  # same tree reused
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


# ---------------- curve-local block attention ----------------

from sfc_vit_tpu.ops.local_attention import (
    local_block_attention,
    local_block_attention_xla,
)


@pytest.mark.parametrize("n,halo", [(512, 1), (512, 2), (300, 1)])
def test_local_attention_matches_xla_mask(n, halo):
    """Exact |Δblock|<=halo masking at every position, incl. edges and
    a non-multiple sequence length."""
    rng = np.random.default_rng(0)
    b, h, dh, blk = 2, 2, 64, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, dh)), dtype=jnp.float32)
        for _ in range(3)
    )
    want = local_block_attention_xla(q, k, v, block=blk, halo=halo)
    got = local_block_attention(q, k, v, block=blk, halo=halo,
                                interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_local_attention_small_sequence_is_dense():
    """When the window covers everything, result == dense attention."""
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 128, 2, 64)), dtype=jnp.float32)
        for _ in range(3)
    )
    want = dot_product_attention_xla(q, k, v)
    got = local_block_attention(q, k, v, block=128, halo=1, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_local_attention_via_dispatcher():
    from sfc_vit_tpu.ops.attention import multi_head_attention

    rng = np.random.default_rng(2)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 256, 2, 64)), dtype=jnp.float32)
        for _ in range(3)
    )
    out = multi_head_attention(q, k, v, implementation="local")
    assert out.shape == q.shape and np.isfinite(np.asarray(out)).all()


def test_fused_conv_tokenizer_matches_unfused():
    from sfc_vit_tpu.tokenizers import ConvPatchEmbedding

    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 32, 32, 3)),
        dtype=jnp.float32,
    )
    for curve in ("hilbert", "raster"):
        ref_mod = ConvPatchEmbedding(
            img_size=32, patch_size=4, embed_dim=64, curve=curve
        )
        fused_mod = ConvPatchEmbedding(
            img_size=32, patch_size=4, embed_dim=64, curve=curve, fused=True
        )
        params = ref_mod.init(jax.random.key(0), x)["params"]
        want = ref_mod.apply({"params": params}, x)
        got = fused_mod.apply({"params": params}, x)  # conv tree reused
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


@pytest.mark.parametrize("n,blk,halo", [
    (256, 64, 1),    # aligned, windowed Pallas backward
    (300, 64, 1),    # ragged tail: padded rows/cols masked in bwd
    (512, 64, 2),    # wider halo
    (128, 128, 1),   # dense fallback window -> XLA-vjp path
])
def test_local_attention_grads(n, blk, halo):
    """Windowed Pallas backward == dense-mask XLA grads (VERDICT r1 #4)."""
    rng = np.random.default_rng(5)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, n, 2, 64)), dtype=jnp.float32)
        for _ in range(3)
    )

    def loss_local(q, k, v):
        return jnp.sum(
            local_block_attention(q, k, v, blk, halo, None, True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(local_block_attention_xla(q, k, v, blk, halo) ** 2)

    g1 = jax.grad(loss_local, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


# ---------------- curve token merging ----------------

from sfc_vit_tpu.ops.token_merge import curve_pair_merge_topk


def test_curve_pair_merge_topk_semantics():
    # pairs: (identical), (orthogonal) -> identical pair must merge
    x = jnp.asarray([[
        [1.0, 0.0], [1.0, 0.0],   # pair 0: identical (sim 1)
        [0.0, 1.0], [1.0, 0.0],   # pair 1: orthogonal (sim 0)
    ]])
    out = curve_pair_merge_topk(x, merge_ratio=0.5)  # k=1
    assert out.shape == (1, 3, 2)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [1.0, 0.0])  # merged
    np.testing.assert_allclose(np.asarray(out[0, 1]), [0.0, 1.0])  # kept x0
    np.testing.assert_allclose(np.asarray(out[0, 2]), [1.0, 0.0])  # kept x1


def test_curve_pair_merge_topk_counts_and_grads():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 64, 16)), dtype=jnp.float32)
    out = curve_pair_merge_topk(x, merge_ratio=0.25)  # k = 8
    assert out.shape == (3, 56, 16)
    out2 = jax.jit(lambda v: curve_pair_merge_topk(v, 0.25))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-6)
    g = jax.grad(lambda v: jnp.sum(curve_pair_merge_topk(v, 0.25) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_curve_pair_merge_zero_ratio_identity():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 4)),
                    dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(curve_pair_merge_topk(x, 0.0)), np.asarray(x)
    )


def test_bf16_softmax_attention_close_to_fp32():
    from sfc_vit_tpu.ops.attention import (
        dot_product_attention_bf16,
        multi_head_attention,
    )

    rng = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, 64, 4, 32)), dtype=jnp.bfloat16)
        for _ in range(3)
    )
    want = dot_product_attention_xla(q, k, v).astype(jnp.float32)
    got = dot_product_attention_bf16(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-2, atol=5e-2
    )
    via = multi_head_attention(q, k, v, implementation="xla_bf16")
    np.testing.assert_array_equal(np.asarray(via), np.asarray(got))


@pytest.mark.parametrize("impl", ["xla", "xla_bf16", "local"])
def test_packed_qkv_attention_matches_split(impl):
    """packed_qkv_attention == split + BNHD dispatcher for both the
    fused BHND fast path and the kernel-backed fallback."""
    from sfc_vit_tpu.ops.attention import (
        multi_head_attention,
        packed_qkv_attention,
    )

    rng = np.random.default_rng(7)
    b, n, h, dh = 2, 196, 4, 64
    qkv = jnp.asarray(
        rng.standard_normal((b, n, 3 * h * dh)), dtype=jnp.float32
    )
    got = packed_qkv_attention(qkv, h, implementation=impl)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (t.reshape(b, n, h, dh) for t in (q, k, v))
    want = multi_head_attention(q, k, v, implementation=impl)
    want = want.reshape(b, n, h * dh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("nq,nk,block_k", [
    (64, 256, None),    # Q shorter than K/V (the Ulysses-SP shape)
    (196, 640, 128),    # ragged both sides, streamed K
    (256, 96, None),    # K/V shorter than Q
])
def test_flash_attention_cross_matches_xla(nq, nk, block_k):
    """Rectangular (cross-attention) flash: n_kv != n_q."""
    rng = np.random.default_rng(11)
    mk = lambda n: jnp.asarray(
        rng.standard_normal((2, n, 4, 64)), dtype=jnp.float32
    )
    q, k, v = mk(nq), mk(nk), mk(nk)
    want = dot_product_attention_xla(q, k, v)
    got = flash_attention(q, k, v, None, None, block_k, None, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("streaming", [False, True])
def test_flash_attention_cross_grads_match_xla(streaming, monkeypatch):
    """Cross-attention grads through both backward paths."""
    import sfc_vit_tpu.ops.flash_attention as fa

    if streaming:
        monkeypatch.setattr(fa, "_FUSED_BWD_MAX", 64)
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((1, 96, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 320, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 320, 2, 64)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(
            fa.flash_attention(q, k, v, None, 64, 128, None, True) ** 2
        )

    def loss_xla(q, k, v):
        return jnp.sum(dot_product_attention_xla(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


@pytest.mark.parametrize("n,h,dh", [(196, 12, 64), (300, 4, 64), (64, 2, 128), (600, 2, 64)])
def test_packed_flash_attention_matches_ref(n, h, dh):
    """Packed-QKV short-seq kernel == the XLA packed formula (and the
    per-head slicing in-register is exact)."""
    from sfc_vit_tpu.ops.flash_attention import (
        _packed_xla_ref,
        packed_flash_attention,
    )

    rng = np.random.default_rng(13)
    qkv = jnp.asarray(
        rng.standard_normal((2, n, 3 * h * dh)), dtype=jnp.float32
    )
    want = _packed_xla_ref(qkv, h, dh ** -0.5)
    got = packed_flash_attention(qkv, h, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_packed_flash_attention_grads():
    from sfc_vit_tpu.ops.flash_attention import (
        _packed_xla_ref,
        packed_flash_attention,
    )

    rng = np.random.default_rng(14)
    qkv = jnp.asarray(
        rng.standard_normal((1, 96, 3 * 2 * 64)), dtype=jnp.float32
    )
    g1 = jax.grad(
        lambda t: jnp.sum(packed_flash_attention(t, 2, None, True) ** 2)
    )(qkv)
    g2 = jax.grad(
        lambda t: jnp.sum(_packed_xla_ref(t, 2, 64 ** -0.5) ** 2)
    )(qkv)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=2e-4
    )


def test_flash_bwd_caps_blocks_and_slices_lse():
    """Explicit fwd-legal blocks (block_q=512, block_k=2048) must not
    be inherited verbatim by the backward (whose VMEM envelope is
    tighter — review finding); the capped-block + 1-lane-LSE-residual
    path must still match XLA grads."""
    import jax

    from sfc_vit_tpu.ops.attention import dot_product_attention_xla
    from sfc_vit_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(11)
    n = 4096
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, n, 2, 64)) / 8, jnp.float32)
        for _ in range(3)
    )

    def loss_flash(q):
        return (flash_attention(
            q, k, v, None, 512, 2048, interpret=True
        ) ** 2).sum()

    def loss_xla(q):
        return (dot_product_attention_xla(q, k, v) ** 2).sum()

    gf = jax.grad(loss_flash)(q)
    gx = jax.grad(loss_xla)(q)
    rel = float(jnp.linalg.norm(gf - gx) / (jnp.linalg.norm(gx) + 1e-9))
    assert rel < 2e-5, rel


def test_packed_flash_attention_cpu_fallback():
    """The documented CPU fallback must actually exist: calling the
    packed kernel off-TPU without interpret previously died inside
    pallas_call (review finding)."""
    from sfc_vit_tpu.ops.flash_attention import (
        _packed_xla_ref,
        packed_flash_attention,
    )

    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.standard_normal((2, 16, 3 * 2 * 32)),
                      jnp.float32)
    got = packed_flash_attention(qkv, 2)
    want = _packed_xla_ref(qkv, 2, 32 ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_flash_fwd_block_q_cap_vmem_window():
    """The fp32 single-K-step forward at N=4096 must demote block_q
    512 -> 256: Mosaic keeps two (block_q, block_k) fp32 temporaries
    live (measured 16.91 MiB scoped allocation vs the 16 MiB limit — a
    compile-time OOM that killed the relational local-attention study's
    pallas arm).  The measured-good bf16 config of the attention
    scaling table (512 x 4096) must NOT demote."""
    from sfc_vit_tpu.ops.flash_attention import _fwd_block_q_cap

    # the crash geometry: fp32, single K step at N=4096
    assert _fwd_block_q_cap(512, 4096, jnp.float32) == 256
    # measured boundary (results/r4_flash_fwd_vmem_probe.json): the
    # 15.5 MiB fp32 pair at bk=3968 overflows on chip by 416 KiB and
    # must demote; the 15.0 MiB pair at bk=3840 compiles and must not
    assert _fwd_block_q_cap(512, 3968, jnp.float32) == 256
    assert _fwd_block_q_cap(512, 3840, jnp.float32) == 512
    # measured-good bf16 at the same blocks stays
    assert _fwd_block_q_cap(512, 4096, jnp.bfloat16) == 512
    # streaming block_k (N > 4096) never demotes
    assert _fwd_block_q_cap(512, 1024, jnp.float32) == 512
    # short sequences (single K step <= 2048) never demote
    assert _fwd_block_q_cap(512, 2048, jnp.float32) == 512
    # floor: never below the 128 the backward envelope assumes
    assert _fwd_block_q_cap(128, 4096, jnp.float32) == 128

    # the demoted config still matches XLA (fwd, auto blocks)
    from sfc_vit_tpu.ops.attention import dot_product_attention_xla
    from sfc_vit_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(13)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 4096, 1, 32)) / 8,
                    jnp.float32)
        for _ in range(3)
    )
    got = flash_attention(q, k, v, interpret=True)
    want = dot_product_attention_xla(q, k, v)
    rel = float(
        jnp.linalg.norm(got - want) / (jnp.linalg.norm(want) + 1e-9)
    )
    assert rel < 2e-5, rel


def test_auto_block_q_never_buys_extra_padding():
    """The retuned forward q-tile chooser (bq=512 past 512 tokens,
    results/r4_flash_fwd_retune_100m.json) must only pick a tile that
    divides the 128-padded length: the ~6% tile win would be swamped
    by padded rows otherwise."""
    from sfc_vit_tpu.ops.flash_attention import _auto_block_q
    from sfc_vit_tpu.ops.kernel_utils import round_up

    # measured geometries pin the retune winners
    assert _auto_block_q(1024) == 512
    assert _auto_block_q(2048) == 512
    assert _auto_block_q(4096) == 512
    # non-power-of-two lengths: largest divisor tile, zero extra rows
    assert _auto_block_q(768) == 256
    assert _auto_block_q(1536) == 512
    assert _auto_block_q(640) == 128
    assert _auto_block_q(2100) == 128
    for n in range(513, 8193, 29):
        bq = _auto_block_q(n)
        assert round_up(n, bq) == round_up(n, 128), (n, bq)


def _lse_paddings(nq, nk, dtype, block_q=None, block_k=None):
    """Mirror the fwd/bwd padding computations of `_fa_fwd`/`_fa_bwd`
    exactly: fwd pads the saved LSE by the CAPPED q block; bwd (post
    cross-attention fix) re-derives the same capped block before its
    own 512 envelope cap."""
    from sfc_vit_tpu.ops.flash_attention import (
        _auto_block_k,
        _auto_block_q,
        _fwd_block_q_cap,
    )
    from sfc_vit_tpu.ops.kernel_utils import round_up

    bq_auto = _auto_block_q(nq) if block_q is None else block_q
    bk = _auto_block_k(nk) if block_k is None else block_k
    bq_capped = _fwd_block_q_cap(bq_auto, bk, dtype)
    bq_bwd = (512 if bq_capped > 512 and bq_capped % 512 == 0
              else bq_capped)
    return round_up(nq, bq_capped), round_up(nq, bq_bwd)


def test_saved_lse_padding_covers_streaming_bwd():
    """Contract between `_fa_fwd` and `_fa_bwd` (flash_attention.py):
    the forward saves LSE rows padded to the CAPPED q block
    (`_fwd_block_q_cap` may demote), and the backward slices
    ``lse[:, :n_pad_bwd]`` — if its padding ever exceeds the saved
    rows, `broadcast_to` raises at trace time deep inside training.
    The backward therefore re-derives the SAME capped block (review
    round 4: slicing by the uncapped auto block broke exactly the
    cross-attention shapes where the cap is driven by a long K/V
    length while the q padding granularity shrinks, e.g. fp32
    nq=2176/nk=4096).  Sweeps self-attention over the streaming range,
    the cross-attention (nq != nk) plane, and explicit non-auto
    block_q values; keeps any future cap extension (e.g. a dh-aware
    term) honest."""
    from sfc_vit_tpu.ops.flash_attention import _use_streaming_bwd

    from sfc_vit_tpu.ops.flash_attention import _FUSED_BWD_MAX

    lo = _FUSED_BWD_MAX  # streaming regime starts one past this
    checked = 0
    for dtype in (jnp.float32, jnp.bfloat16):
        # self-attention, auto blocks — the whole first streaming
        # octave plus the demotion-sensitive fp32 boundary band
        for n in range(lo + 1, 2 * lo + 1):
            if not _use_streaming_bwd(n):
                continue
            n_pad_fwd, n_pad_bwd = _lse_paddings(n, n, dtype)
            assert n_pad_bwd <= n_pad_fwd, (n, jnp.dtype(dtype).name)
            checked += 1
        # cross-attention: q length and K/V length independent (the
        # Ulysses sequence-parallel Q-slice x gathered-K/V step) —
        # a long K/V side drives the cap while the q padding
        # granularity shrinks
        for nq in range(2049, 4608, 37):
            for nk in (lo + 1, lo + 128, 12288, 15872, 16000, 16384):
                if not _use_streaming_bwd(max(nq, nk)):
                    continue
                n_pad_fwd, n_pad_bwd = _lse_paddings(nq, nk, dtype)
                assert n_pad_bwd <= n_pad_fwd, (
                    nq, nk, jnp.dtype(dtype).name
                )
                checked += 1
        # explicit block_q (user-specified, incl. non-power-of-two)
        for bq in (256, 320, 512, 640, 1024):
            for nq in (lo + 1, lo + 128, 12288, 15000):
                n_pad_fwd, n_pad_bwd = _lse_paddings(
                    nq, 16384, dtype, block_q=bq
                )
                assert n_pad_bwd <= n_pad_fwd, (
                    bq, nq, jnp.dtype(dtype).name
                )
                checked += 1
    # guard against the sweep going vacuous if the boundary moves again
    assert checked > 1000, checked
