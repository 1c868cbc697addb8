"""Family B models: the reference ``src/models/altvit.py`` architectures.

Pre-norm ViT stack (vit-pytorch style): ``SimpleViT`` (raster baseline
with sin/cos 1-D positional table, mean-pool head, ``altvit.py:163-205``)
and ``HilbertViT`` (curve-ordered patches + GFPE positional encoding,
``altvit.py:208-268``).  Generalized so any registered curve can be used
where the reference hard-codes Hilbert.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..curves import flat_lut
from ..tokenizers.embeddings import curve_gather, patchify
from .posemb import gfpe, sincos_1d
from ..ops.attention import packed_qkv_attention

__all__ = ["CurvePatchEmbedding", "PreNormTransformer", "SimpleViT", "CurveViT", "HilbertViT", "curve_pair_pool"]


class CurvePatchEmbedding(nn.Module):
    """Patchify -> curve gather -> LN -> Linear -> LN.

    Reference ``HilbertPatchEmbedding`` (``altvit.py:46-99``), curve
    generalized.  Requires a square power-of-2 grid for hilbert/moore/z
    (mirrors the reference assertion, ``altvit.py:54-55``).
    """

    image_size: int
    patch_size: int
    dim: int
    curve: str = "hilbert"
    dtype: Optional[jnp.dtype] = None

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def n_patches(self) -> int:
        return self.grid_size ** 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.grid_size
        x = patchify(x, self.patch_size)
        if self.curve != "raster":
            # The reference asserts a power-of-2 grid (altvit.py:54-55);
            # our embed-and-prune LUTs cover arbitrary grids, so we only
            # require the result to be a true permutation.
            lut = flat_lut(self.curve, g)
            assert sorted(lut.tolist()) == list(range(g * g)), (
                f"{self.curve} LUT on grid {g} is not a permutation"
            )
            x = curve_gather(x, lut)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_in")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_out")(x)


# Test hooks: force the fused-block gate on non-TPU backends (the
# kernels then run in Pallas interpret mode) so the pad-once stack
# layout is exercised by the hermetic CPU suite.
_FORCE_FUSED = False

# Training-rule selector for the fused kernels' custom VJPs:
# 'auto' (Pallas backward kernels on TPU / under interpret, XLA rule
# elsewhere), 'pallas', or 'xla' (the round-2 store-residuals rule).
# TRACING-TIME switch (CLAUDE.md): jit caches by function identity —
# re-jit / use distinct step fns when toggling, as the A/B scripts do.
_TRAIN_IMPL = "auto"

# Above this token count, the observability capture sows the flash
# kernel's LSE (+ q/k) instead of full [B,H,N,N] weights; rows
# reconstruct on demand via utils.profiling.attention_rows.
_WEIGHTS_CAPTURE_MAX = 2048


def _fused_attn_gate(attn_impl: str, n: int, d: int, inner: int,
                     dtype) -> bool:
    """True when `_PreNormAttention` will take the fused-block kernel.

    Shared between the attention module and `PreNormTransformer`'s
    pad-once layout decision so the two can never disagree (a padded
    stack routed to an unfused, unmasked path would attend to pad
    keys)."""
    import jax as _jax

    from ..ops.fused_attention_block import fused_attention_block_fits

    if attn_impl != "auto" or d % 128 or inner % 128:
        return False
    if not (_jax.default_backend() == "tpu" or _FORCE_FUSED):
        return False
    return fused_attention_block_fits(n, d, inner,
                                      jnp.dtype(dtype).itemsize)


def _impl_schedule(attn_impl: Union[str, Sequence[str]],
                   depth: int) -> Tuple[str, ...]:
    """Normalize ``attn_impl`` to a per-layer tuple of length ``depth``.

    A single string applies to every layer (the common case).  A
    sequence is a per-layer schedule — the long-context motivation is
    hybrid local/global stacks: the relational control study
    (``results/local_attention_relational.json``) proved pure
    curve-local attention cannot route information between distant
    curve sites (it sits at chance on a two-site relation for the full
    run), while pure global flash costs 5.7x the step time at 16k
    tokens (``results/r4_longctx_tune.json``).  A schedule like
    ``('local','local','local','auto')`` keeps most of the local
    speedup while the sparse global layers restore cross-site routing
    (the Longformer/BigBird recipe, curve-native).
    """
    if isinstance(attn_impl, str):
        return (attn_impl,) * depth
    impls = tuple(attn_impl)
    if len(impls) != depth:
        raise ValueError(
            f"attn_impl schedule has {len(impls)} entries for depth "
            f"{depth}; give one implementation per layer (or a single "
            "string for all layers)"
        )
    if not all(isinstance(i, str) for i in impls):
        raise TypeError(f"attn_impl schedule must be strings, got {impls!r}")
    return impls


class _PreNormAttention(nn.Module):
    """LN -> QKV (no bias) -> softmax attention -> out proj (no bias).

    Reference ``Attention`` (``altvit.py:116-142``); inner dim =
    heads * dim_head may exceed the model dim.

    ``n_actual``: set by ``PreNormTransformer``'s pad-once layout —
    ``x`` arrives padded to a sublane multiple and rows past
    ``n_actual`` are padding (masked out of every softmax, passed
    through as residual identity).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"
    n_actual: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.fused_attention_block import (
            fused_attention_block,
        )

        inner = self.heads * self.dim_head
        ln_scale, ln_bias = _LNParams(self.dim, name="norm")()
        w_qkv = _DenseParams(self.dim, inner * 3, use_bias=False,
                             name="to_qkv")()
        w_out = _DenseParams(inner, self.dim, use_bias=False,
                             name="to_out")()
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        w_qkv, w_out = w_qkv.astype(dt), w_out.astype(dt)

        from ..ops.kernel_utils import ln_fp32

        def _ln(v):
            return ln_fp32(v, ln_scale, ln_bias, 1e-5)

        if self.is_mutable_collection("intermediates"):
            qkv = _ln(x) @ w_qkv
            b, n, _ = qkv.shape
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, n, self.heads, self.dim_head)
            k = k.reshape(b, n, self.heads, self.dim_head)
            v = v.reshape(b, n, self.heads, self.dim_head)
            if n <= _WEIGHTS_CAPTURE_MAX:
                from ..ops.attention import attention_with_weights

                out, weights = attention_with_weights(q, k, v)
                self.sow("intermediates", "attention_weights", weights)
            else:
                # Long sequences: materializing [B,H,N,N] weights is
                # O(N^2) HBM and can't observe the production kernel —
                # capture the flash kernel's LSE instead; any weight
                # rows reconstruct in O(rows*N) via
                # utils.profiling.attention_rows (VERDICT r2 item 7).
                from ..ops.flash_attention import flash_attention_with_lse

                out, lse = flash_attention_with_lse(
                    q, k, v, interpret=_FORCE_FUSED
                )
                self.sow("intermediates", "attention_lse", lse)
                self.sow("intermediates", "attention_q", q)
                self.sow("intermediates", "attention_k", k)
            return x + out.reshape(b, n, inner) @ w_out

        b, n, d = x.shape
        if _fused_attn_gate(self.attn_impl, n, d, inner, dt):
            # whole attention block (LN + QKV + attention + out proj +
            # residual) as one kernel; training uses the packed-VJP
            # composition via the kernel's custom-VJP rule
            return fused_attention_block(
                x, ln_scale, ln_bias, w_qkv, w_out, self.heads,
                interpret=_FORCE_FUSED, n_actual=self.n_actual,
                train_impl=_TRAIN_IMPL,
            )
        # unfused: identical composition, attention dispatched by impl
        if self.n_actual is not None and self.n_actual < n:
            # Defensive only: PreNormTransformer sets n_actual iff the
            # SAME gate held (fits(n) == fits(n_pad) since round_up is
            # idempotent), so this branch is unreachable today — it
            # exists so a future asymmetric gate change degrades to a
            # correct (masked) slow path instead of attending pad keys.
            real = self.n_actual
            out = packed_qkv_attention(
                _ln(x[:, :real]) @ w_qkv, self.heads,
                implementation=self.attn_impl,
            )
            return jnp.concatenate(
                [x[:, :real] + out @ w_out, x[:, real:]], axis=1
            )
        out = packed_qkv_attention(
            _ln(x) @ w_qkv, self.heads, implementation=self.attn_impl
        )
        return x + out @ w_out


class _LNParams(nn.Module):
    """Param holder with ``nn.LayerNorm``'s tree (``scale``/``bias``)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _DenseParams(nn.Module):
    """Param holder with ``nn.Dense``'s tree (``kernel``/``bias``) and
    default initializers, so checkpoints/transplants are path-identical
    whether the fused kernel or the unfused graph consumes them.

    Two call modes:

    * ``holder()`` — return the raw ``kernel`` (``, bias``) leaves for a
      consumer that does its own GEMM (the fused Pallas kernels).
    * ``holder(x)`` — apply ``x @ kernel + bias`` in ``x.dtype`` (the
      same cast-then-matmul the callers used to do inline).  Callers
      whose GEMM runs in XLA (not inside a Pallas kernel) should use
      this mode: the int8 serving interceptor (``quant/int8.py``) can
      then route the whole GEMM to the 2x-rate int8 MXU path instead of
      serving a dequantized weight view.
    """

    in_dim: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray] = None):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_dim, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if x is not None:
            y = x @ kernel.astype(x.dtype)
            if bias is not None:
                y = y + bias.astype(x.dtype)
            return y
        if not self.use_bias:
            return kernel
        return kernel, bias


class _FeedForward(nn.Module):
    """LN -> Linear -> GELU(exact) -> Linear (``altvit.py:102-113``).

    The whole block (including the caller's residual add) runs as ONE
    Pallas kernel on TPU (:func:`~sfc_vit_tpu.ops.fused_mlp.
    fused_mlp_block`) when the weights fit VMEM; training and CPU use
    the identical-math unfused formula (the kernel's VJP rule), so
    checkpoints, parity, and grads are unchanged.  NOTE: unlike the
    pre-kernel version this module ADDS THE RESIDUAL itself.
    """

    dim: int
    hidden_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.fused_mlp import (
            fused_mlp_block,
            fused_mlp_fits,
            mlp_block_xla,
        )

        ln_scale, ln_bias = _LNParams(self.dim, name="norm")()
        w1, b1 = _DenseParams(self.dim, self.hidden_dim, name="fc1")()
        w2, b2 = _DenseParams(self.hidden_dim, self.dim, name="fc2")()
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        w1, b1, w2, b2 = (a.astype(dt) for a in (w1, b1, w2, b2))
        import jax as _jax

        d, f = self.dim, self.hidden_dim
        if (
            (_jax.default_backend() == "tpu" or _FORCE_FUSED)
            and d % 128 == 0
            and f % 128 == 0
            and fused_mlp_fits(d, f, jnp.dtype(dt).itemsize)
        ):
            return fused_mlp_block(
                x, ln_scale, ln_bias, w1, b1, w2, b2,
                eps=1e-5, activation="gelu", residual=True,
                interpret=_FORCE_FUSED, train_impl=_TRAIN_IMPL,
            )
        return mlp_block_xla(
            x, ln_scale, ln_bias, w1, b1, w2, b2,
            eps=1e-5, activation="gelu", residual=True,
        )


def curve_pair_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Merge curve-adjacent token pairs by averaging: [B, N, D] -> [B, N/2, D].

    Because tokens are curve-ordered, position 2i and 2i+1 are spatial
    neighbours (the clustering-number property), so pair pooling is a
    semantically local reduction -- the curve-native analogue of the
    neighbour-aware token reduction literature (PAPERS.md).  Static
    shapes, pure reshape+mean: free on TPU.
    """
    b, n, d = x.shape
    assert n % 2 == 0, f"token count {n} must be even to pair-pool"
    return x.reshape(b, n // 2, 2, d).mean(axis=2)


class PreNormTransformer(nn.Module):
    """Residual pre-norm stack with final LN (``altvit.py:145-160``).

    ``pool_layers`` optionally halves the token count after the given
    layer indices via :func:`curve_pair_pool` (curve-native token
    reduction; quadratic-attention cost drops 4x per pool).
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    pool_layers: tuple = ()
    merge_layers: tuple = ()  # data-dependent top-k pair merging
    merge_ratio: float = 0.5
    remat: bool = False  # jax.checkpoint each block (memory for FLOPs)
    dtype: Optional[jnp.dtype] = None
    #: one implementation for every layer, or a per-layer tuple of
    #: length ``depth`` (hybrid local/global schedules — see
    #: :func:`_impl_schedule` for the measured motivation)
    attn_impl: Union[str, Tuple[str, ...]] = "auto"
    # final_norm=False runs the stack WITHOUT the closing LayerNorm —
    # used by pipeline parallelism, where the depth split into stages
    # must be norm-free (the final LN is applied once, after the last
    # stage, by parallel.pipeline_model's head).
    final_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        attn_cls = nn.remat(_PreNormAttention) if self.remat else _PreNormAttention
        ff_cls = nn.remat(_FeedForward) if self.remat else _FeedForward

        # Pad-once sequence layout: when every layer takes the fused
        # attention-block kernel, pad tokens to the kernel's sublane
        # multiple ONCE for the whole stack instead of pad+slice inside
        # each of `depth` kernel calls (the per-layer pad/slice/reshape
        # churn measured ~9% of ViT-B device time, RESULTS.md round 2).
        # Pad rows are masked out of every softmax and all other ops
        # are row-local, so real rows are bit-identical either way.
        from ..ops.kernel_utils import round_up as _round_up

        n = x.shape[1]
        n_pad = _round_up(n, 16)
        inner = self.heads * self.dim_head
        dt = self.dtype or x.dtype
        impls = _impl_schedule(self.attn_impl, self.depth)
        pad_once = (
            n_pad != n
            and not self.pool_layers
            and not self.merge_layers
            and not self.is_mutable_collection("intermediates")
            # a mixed schedule routes some layers off the fused kernel,
            # and those paths don't thread n_actual — stay unpadded
            and len(set(impls)) == 1
            and _fused_attn_gate(impls[0], n, self.dim, inner, dt)
        )
        if pad_once:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

        for i in range(self.depth):
            x = attn_cls(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                dtype=self.dtype, attn_impl=impls[i],
                n_actual=n if pad_once else None,
                name=f"attn_{i}",
            )(x)  # residual added in-module (fused kernel path)
            # _FeedForward adds the residual in-kernel (one fused pass)
            x = ff_cls(
                dim=self.dim, hidden_dim=self.mlp_dim, dtype=self.dtype,
                name=f"ff_{i}",
            )(x)
            if i in self.pool_layers:
                x = curve_pair_pool(x)
            if i in self.merge_layers:
                from ..ops.token_merge import curve_pair_merge_topk

                x = curve_pair_merge_topk(x, self.merge_ratio)
        if pad_once:
            x = x[:, :n]
        if not self.final_norm:
            return x
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class SimpleViT(nn.Module):
    """Raster baseline: patchify -> LN/Linear/LN -> +sincos1d -> pre-norm
    transformer -> mean pool -> linear head (``altvit.py:163-205``).

    NOTE: the embed (everything before the transformer) and head (final
    norm + pool + linear) are mirrored by ``parallel.pipeline_model.
    _embed`` / ``_head`` for the pipeline-parallel path — change them in
    BOTH places (drift is caught by tests/test_parallel.py's pipelined-
    vs-sequential parity, but only for the configurations it runs)."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    remat: bool = False
    dtype: Optional[jnp.dtype] = None
    attn_impl: Union[str, Tuple[str, ...]] = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        del deterministic  # no dropout in this family (altvit semantics)
        assert self.image_size % self.patch_size == 0, (
            "Image dimensions must be divisible by the patch size."
        )
        n = (self.image_size // self.patch_size) ** 2
        x = patchify(x, self.patch_size)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_in")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_out")(x)
        x = x + jnp.asarray(sincos_1d(n, self.dim), dtype=x.dtype)
        x = PreNormTransformer(
            dim=self.dim, depth=self.depth, heads=self.heads,
            dim_head=self.dim_head, mlp_dim=self.mlp_dim, remat=self.remat,
            dtype=self.dtype, attn_impl=self.attn_impl, name="transformer",
        )(x)
        x = x.mean(axis=1)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="linear_head")(x)


class CurveViT(nn.Module):
    """Curve-ordered SimpleViT with GFPE positional encoding.

    Reference ``HilbertViT`` (``altvit.py:208-268``, GFPE hyperparams
    T=4, h=3.0), generalized over curves.

    NOTE: embed/head are mirrored by ``parallel.pipeline_model`` — see
    the SimpleViT docstring.
    """

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    curve: str = "hilbert"
    temperature: float = 4.0
    h_param: float = 3.0
    pool_layers: tuple = ()  # curve-native token reduction after these layers
    merge_layers: tuple = ()
    merge_ratio: float = 0.5
    remat: bool = False
    dtype: Optional[jnp.dtype] = None
    attn_impl: Union[str, Tuple[str, ...]] = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        del deterministic  # no dropout in this family (altvit semantics)
        grid = self.image_size // self.patch_size
        x = CurvePatchEmbedding(
            image_size=self.image_size, patch_size=self.patch_size,
            dim=self.dim, curve=self.curve, dtype=self.dtype,
            name="to_patch_embedding",
        )(x)
        positions = flat_lut(self.curve, grid).astype(np.float32)
        pe = gfpe(positions, self.dim, temperature=self.temperature,
                  h_param=self.h_param)
        x = x + jnp.asarray(pe, dtype=x.dtype)
        x = PreNormTransformer(
            dim=self.dim, depth=self.depth, heads=self.heads,
            dim_head=self.dim_head, mlp_dim=self.mlp_dim,
            pool_layers=self.pool_layers, merge_layers=self.merge_layers,
            merge_ratio=self.merge_ratio, remat=self.remat,
            dtype=self.dtype, attn_impl=self.attn_impl, name="transformer",
        )(x)
        x = x.mean(axis=1)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="linear_head")(x)


def HilbertViT(**kwargs) -> CurveViT:
    """Reference-named constructor (``altvit.py:208``)."""
    kwargs.setdefault("curve", "hilbert")
    if "T" in kwargs:
        kwargs["temperature"] = kwargs.pop("T")
    return CurveViT(**kwargs)
