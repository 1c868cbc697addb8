"""Model building blocks, family A (torch-style semantics).

Parity-faithful flax implementations of the reference's ``src/models/
vit.py`` components: the post-norm torch ``nn.TransformerEncoderLayer``
stack (relu activation, eps 1e-5 -- the torch defaults the reference
relies on), the channel-mix-only MixerBlock, the Kronecker-factorized
head, and the TokenAggregator.  Attention routes through
``sfc_vit_tpu.ops.attention`` so the Pallas flash kernel is a drop-in.

Reference bugs fixed (documented divergences, SURVEY.md section 2c):
  * ``MixerBlock`` arity: the reference's ``MultiLayerPredictor(mix=True)``
    passes 3 of 4 required args (``vit.py:301``) -> TypeError; here
    ``out_dim`` defaults to ``embed_dim``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import packed_qkv_attention

__all__ = [
    "TokenAggregator",
    "TorchMultiHeadAttention",
    "TorchTransformerEncoderLayer",
    "TransformerSeqEncoder",
    "MixerBlock",
    "FactorisedLinear",
    "MultiLayerPredictor",
]

#: TRACING-TIME switch (like models.simple_vit._TRAIN_IMPL): route
#: training-with-dropout through the fused torch-MHA Pallas kernel
#: (ops/fused_torch_attention.py).  False restores the explicit-weights
#: path end-to-end — the A/B hook for scripts/r3_mha_kernel_ab.py.
_FUSED_TRAIN_MHA = True


class TokenAggregator(nn.Module):
    """Depthwise-separable Conv1d over the token axis (localformer-style).

    Reference: ``vit.py:20-42`` (defined but disabled in the stock
    models; kept as an opt-in component).
    """

    dim: int
    kernel: int = 3
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, N, D]
        # flax Conv is NLC-native: convolve over N with feature groups.
        x = nn.Conv(
            features=self.dim,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            padding=[(self.kernel // 2, self.kernel // 2)],
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dw",
        )(x)
        x = nn.Conv(
            features=self.dim, kernel_size=(1,), dtype=self.dtype, name="pw"
        )(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(
            nn.gelu(x, approximate=False)
        )


class TorchMultiHeadAttention(nn.Module):
    """Packed-QKV multi-head self-attention, torch ``nn.MultiheadAttention``
    parameterization (in_proj [D,3D] + out_proj), so reference weights map
    one-to-one for parity tests."""

    dim: int
    n_heads: int
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        import jax as _jax

        from . import simple_vit as _sv

        d = self.dim
        # Params via holders (identical tree to nn.Dense: in_proj /
        # out_proj {kernel, bias}) so the fused training kernel and the
        # unfused graphs share checkpoints and torch transplants.
        in_proj = _sv._DenseParams(d, 3 * d, name="in_proj")
        out_proj = _sv._DenseParams(d, d, name="out_proj")
        w_in, b_in = in_proj()
        w_out, b_out = out_proj()
        # dtype=None matches nn.Dense(dtype=None): promote with the fp32
        # params, so bf16 inputs still get an fp32 matmul (stock-flax
        # numerics for checkpoints that never set a compute dtype).
        dt = self.dtype or jnp.promote_types(x.dtype, w_in.dtype)
        xc = x.astype(dt)
        w_in, b_in, w_out, b_out = (
            a.astype(dt) for a in (w_in, b_in, w_out, b_out)
        )
        b, n, _ = x.shape
        dh = d // self.n_heads
        needs_weights = self.is_mutable_collection("intermediates")
        apply_weight_dropout = self.dropout_rate > 0.0 and not deterministic

        if (
            apply_weight_dropout
            and self.dropout_rate < 1.0  # rate=1.0: nn.Dropout path
            and not needs_weights
            and _FUSED_TRAIN_MHA
        ):
            # Fused training path: the whole MHA (packed projection,
            # per-head softmax, in-register probability dropout from
            # hardware-RNG mask bits, out projection) as one Pallas
            # kernel with a no-[N,N]-residual backward — the explicit-
            # weights path below spends ~22% of the flagship train step
            # in BNHD layout copies + stored-probability residuals
            # (RESULTS round 3, profile_forward --preset flagship).
            from ..ops.fused_torch_attention import (
                fused_torch_mha,
                mha_train_pallas,
            )

            itemsize = jnp.dtype(dt).itemsize
            if (
                self.attn_impl == "auto"  # 'xla' = whole-module escape
                # shared eligibility predicate (backend + d%128 + both
                # VMEM fits gates) — the kernel's vjp routing uses the
                # SAME function, so the two gates cannot drift
                and mha_train_pallas("auto", n, d, self.n_heads,
                                     itemsize, interpret=_sv._FORCE_FUSED)
            ):
                keep = 1.0 - self.dropout_rate
                mask = _jax.random.bernoulli(
                    self.make_rng("dropout"), keep,
                    (b, self.n_heads, n, n),
                ).astype(dt)
                return fused_torch_mha(
                    xc, w_in, b_in, w_out, b_out, mask, self.n_heads,
                    keep=keep, interpret=_sv._FORCE_FUSED,
                    train_impl=_sv._TRAIN_IMPL,
                )

        # in-proj through the holder's apply mode (== xc @ w_in + b_in):
        # lets the int8 serving interceptor route this GEMM to the int8
        # MXU instead of materializing a dequantized weight view.
        qkv = in_proj(xc)
        if needs_weights or apply_weight_dropout:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, n, self.n_heads, dh)
            k = k.reshape(b, n, self.n_heads, dh)
            v = v.reshape(b, n, self.n_heads, dh)
            # Explicit-weights path: (a) observability -- apply with
            # mutable=['intermediates'] to capture per-head maps (cf. the
            # reference's commented-out CustomTransformerEncoderLayer,
            # vit.py:48-174); (b) training with dropout when the fused
            # kernel doesn't fit -- torch nn.MultiheadAttention drops
            # attention *probabilities*, so parity requires dropout on
            # the weights, not the output.
            from ..ops.attention import attention_with_weights

            out, weights = attention_with_weights(q, k, v)
            if needs_weights:
                self.sow("intermediates", "attention_weights", weights)
            if apply_weight_dropout:
                weights = nn.Dropout(self.dropout_rate)(
                    weights, deterministic=False
                )
                out = jnp.einsum(
                    "bhnm,bmhd->bnhd", weights.astype(v.dtype), v
                )
            out = out.reshape(b, n, d)
        else:
            # packed path: one relayout instead of split + 3 head
            # transposes (17% of fwd device time, profile_forward.py)
            out = packed_qkv_attention(
                qkv, self.n_heads, implementation=self.attn_impl
            )
            # out-proj through the holder's apply mode so int8 serving
            # runs a true int8 MXU GEMM here (interceptor-routable); the
            # unquantized math is identical to `out @ w_out + b_out`.
            return out_proj(out)
        return out @ w_out + b_out


class TorchTransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer matching torch ``nn.TransformerEncoderLayer``
    defaults (relu, dropout 0.1, LayerNorm eps 1e-5, norm_first=False),
    which the reference uses at ``vit.py:197-203``:
        x = norm1(x + Dropout(SelfAttn(x)))
        x = norm2(x + Dropout(Linear2(Dropout(relu(Linear1(x))))))
    """

    dim: int
    n_heads: int
    hidden_dim: int
    dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        import jax as _jax

        from ..ops.fused_mlp import fused_postnorm_tail, postnorm_tail_fits
        from . import simple_vit as _sv

        attn = TorchMultiHeadAttention(
            dim=self.dim,
            n_heads=self.n_heads,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="self_attn",
        )(x, deterministic=deterministic)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)

        d, f = self.dim, self.hidden_dim
        # promotion as in TorchMultiHeadAttention: dtype=None + bf16
        # input must compute fp32 (the stock nn.Dense/LayerNorm rule).
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        dropout_active = self.dropout_rate > 0.0 and not deterministic
        if (
            self.attn_impl == "auto"
            and not dropout_active
            and d % 128 == 0
            # f >= 1024: at the reference family-A scales (mlp 256-512)
            # the kernel ties XLA standalone (0.66 vs 0.67 ms) but
            # breaks XLA's cross-op fusions in-model (-7% flagship
            # end-to-end, RESULTS.md round 2); the fused win is the
            # wide-MLP regime (f=3072: 3.93 vs 5.00 ms).
            and f % 128 == 0
            and (f >= 1024 or _sv._FORCE_FUSED)
            and (_jax.default_backend() == "tpu" or _sv._FORCE_FUSED)
            and postnorm_tail_fits(d, f, jnp.dtype(dt).itemsize)
        ):
            # Params via holders (identical tree to nn.LayerNorm /
            # nn.Dense, the family-B pattern) so the fused tail kernel
            # and the unfused graph share checkpoints.
            ln1_s, ln1_b = _sv._LNParams(self.dim, name="norm1")()
            w1, b1 = _sv._DenseParams(self.dim, self.hidden_dim,
                                      name="linear1")()
            w2, b2 = _sv._DenseParams(self.hidden_dim, self.dim,
                                      name="linear2")()
            ln2_s, ln2_b = _sv._LNParams(self.dim, name="norm2")()
            x = x.astype(dt)
            attn = attn.astype(dt)
            w1, b1, w2, b2 = (a.astype(dt) for a in (w1, b1, w2, b2))
            # everything after the attention projection as ONE kernel:
            # +residual -> LN1 -> fc1 -> relu -> fc2 -> +residual -> LN2
            return fused_postnorm_tail(
                x, attn, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                eps=1e-5, activation="relu",
                interpret=_sv._FORCE_FUSED, train_impl=_sv._TRAIN_IMPL,
            )

        # Unfused path: the stock flax modules verbatim — swapping in a
        # manual holders-based formula here measured -3.5% on the
        # flagship train step (XLA fuses the nn graph better).
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + attn)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + h)


class TransformerSeqEncoder(nn.Module):
    """Stack of post-norm encoder layers.

    Reference: ``TransformerSeqEncoder`` (``vit.py:177-242``).  The stock
    reference applies no CLS token and no positional embedding (all
    commented out, ``vit.py:207-219``); positional encodings live in
    ``models/posemb.py`` and are applied by the model wrappers instead.
    """

    dim: int
    n_heads: int
    hidden_dim: int
    n_layers: int = 1
    dropout_rate: float = 0.1
    remat: bool = False  # jax.checkpoint each layer (memory for FLOPs)
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        layer_cls = (
            nn.remat(TorchTransformerEncoderLayer, static_argnums=(2,))
            if self.remat
            else TorchTransformerEncoderLayer
        )
        for i in range(self.n_layers):
            x = layer_cls(
                dim=self.dim,
                n_heads=self.n_heads,
                hidden_dim=self.hidden_dim,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"layer_{i}",
            )(x, deterministic)
        return x


class MixerBlock(nn.Module):
    """MLP-Mixer block, channel-mix branch only.

    Reference ``vit.py:250-273``: the token-mixing branch is commented
    out, so the active computation is ``x + channel_mix(LN(x))``; the
    reference's dead token-mix parameters are NOT created here (a torch
    transplant maps only the channel_mix_* leaves, see
    ``tests/test_model_parity.py``).

    ``out_dim`` mirrors the reference's constructor arity (its arity
    bug passed ``out_dim`` positionally into dropout); the residual
    constrains it to ``embed_dim``, which is checked loudly -- the
    reference would fail the same way, just with an opaque broadcast
    error.
    """

    seq_len: int
    embed_dim: int
    hidden_dim: int
    out_dim: Optional[int] = None  # reference bug fix: defaults to embed_dim
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, N, D]
        out_dim = self.out_dim if self.out_dim is not None else self.embed_dim
        if out_dim != self.embed_dim:
            raise ValueError(
                f"MixerBlock residual requires out_dim == embed_dim "
                f"({out_dim} != {self.embed_dim})"
            )
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="channel_mix_ln")(x)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="channel_mix_0")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(out_dim, dtype=self.dtype, name="channel_mix_1")(h)
        return x + h


class FactorisedLinear(nn.Module):
    """Kronecker-factorized head: [B, N, D] -> [B, out].

    ``y = einsum('bnr,onr->bo', einsum('bnd,rd->bnr', x, W_emb), W_seq)``
    -- reference ``vit.py:276-292`` (xavier-normal init preserved).
    """

    seq_len: int
    embed_dim: int
    rank: int
    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w_emb = self.param(
            "W_emb",
            nn.initializers.xavier_normal(),
            (self.rank, self.embed_dim),
        )
        w_seq = self.param(
            "W_seq",
            nn.initializers.xavier_normal(batch_axis=(0,)),
            (self.out_dim, self.seq_len, self.rank),
        )
        h = jnp.einsum("bnd,rd->bnr", x, w_emb.astype(x.dtype))
        return jnp.einsum("bnr,onr->bo", h, w_seq.astype(x.dtype))


class MultiLayerPredictor(nn.Module):
    """Classification head: LN (or MixerBlock) -> FactorisedLinear ->
    GELU -> Dropout -> [hidden Linears] -> Linear(num_classes).

    Reference ``vit.py:295-319``.  ``mix=True`` uses the (fixed)
    MixerBlock front end.
    """

    embed_dim: int
    seq_len: int
    n_layers: int = 2
    rank: int = 64
    dropout_rate: float = 0.5
    num_classes: int = 10
    mix: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        if self.mix:
            x = MixerBlock(
                seq_len=self.seq_len,
                embed_dim=self.embed_dim,
                hidden_dim=self.embed_dim * 2,
                dtype=self.dtype,
                name="mixer",
            )(x)
        else:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        h = FactorisedLinear(
            seq_len=self.seq_len,
            embed_dim=self.embed_dim,
            rank=self.rank,
            out_dim=self.embed_dim * 2,
            dtype=self.dtype,
            name="fact",
        )(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        prev = self.embed_dim * 2
        for i in range(self.n_layers - 2):
            prev //= 2
            h = nn.Dense(prev, dtype=self.dtype, name=f"hidden_{i}")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="out")(h)
