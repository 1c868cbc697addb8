"""End-to-end model forward parity vs the PyTorch reference.

Full weight transplants torch -> flax; logits must match to fp32
tolerance (BASELINE.md contract).  Skipped when the reference checkout
is not mounted.
"""

import pathlib
import sys

import numpy as np
import pytest

REF = pathlib.Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not mounted"
)

if REF.exists():
    sys.path.insert(0, str(REF))
    torch = pytest.importorskip("torch")

import jax.numpy as jnp

from sfc_vit_tpu import models
from sfc_vit_tpu.tokenizers import compat
from sfc_vit_tpu.utils import torch_compat as tc

RTOL, ATOL = 2e-4, 2e-4  # fp32 end-to-end across 6-8 transformer layers


def _image(b=2, c=3, hw=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, c, hw, hw)).astype(np.float32)


def test_vision_transformer_parity():
    """VisionTransformer + MortonEmbedding1D (``vit.py:325-385``)."""
    from src.models.vit import VisionTransformer as RefViT
    from src.tokenizers._1D.morton_embedding1D import MortonEmbedding1D

    torch.manual_seed(0)
    ref_tok = MortonEmbedding1D(32, 4, 3, 64)
    ref = RefViT(patch_embed=ref_tok, depth=3, n_heads=4, mlp_dim=128,
                 num_classes=10).eval()
    x = _image()
    with torch.no_grad():
        want = tc.to_numpy(ref(torch.from_numpy(x)))

    tok = compat.MortonEmbedding1D(32, 4, 3, 64)
    mine = models.VisionTransformer(
        patch_embed=tok, depth=3, n_heads=4, mlp_dim=128, num_classes=10,
        attn_impl="xla",
    )
    params = {
        "patch_embed": {"proj": tc.linear_params(ref_tok.proj)},
        "encoder": tc.torch_seq_encoder_params(ref.encoder),
        "mlp_head": tc.predictor_params(ref.mlp_head),
    }
    got = np.asarray(
        mine.apply({"params": params}, jnp.asarray(tc.nchw_to_nhwc(x)))
    )
    assert got.shape == want.shape == (2, 10)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_vision_transformer1d_hierarchical_parity():
    """The flagship config: VisionTransformer1D + HierarchicalMorton
    (``main.py:269-282``)."""
    from src.models.vit import VisionTransformer1D as RefViT1D
    from src.tokenizers.multiscale.multi_morton import (
        HierarchicalMortonEmbedding,
    )

    torch.manual_seed(0)
    ref_tok = HierarchicalMortonEmbedding(32, 3, [16, 4, 1], 64)
    ref = RefViT1D(patch_embed=ref_tok, depth=2, n_heads=4, mlp_dim=128,
                   num_classes=10).eval()
    x = _image()
    with torch.no_grad():
        want = tc.to_numpy(ref(torch.from_numpy(x)))

    tok = compat.HierarchicalMortonEmbedding(32, 3, [16, 4, 1], 64)
    mine = models.VisionTransformer1D(
        patch_embed=tok, depth=2, n_heads=4, mlp_dim=128, num_classes=10,
        attn_impl="xla",
    )
    tok_params = {
        f"level_{i}": {"proj": tc.linear_params(ref_tok.levels[i].proj)}
        for i in range(3)
    }
    tok_params["fusion"] = tc.linear_params(ref_tok.fusion)
    params = {
        "patch_embed": tok_params,
        "mlp_mixer": tc.mixer_params(ref.mlp_mixer),
        "encoder": tc.torch_seq_encoder_params(ref.encoder),
        "mlp_head": tc.predictor_params(ref.mlp_head),
    }
    got = np.asarray(
        mine.apply({"params": params}, jnp.asarray(tc.nchw_to_nhwc(x)))
    )
    assert got.shape == want.shape == (2, 10)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_simple_vit_parity():
    """SimpleViT raster baseline (``altvit.py:163-205``)."""
    from src.models.altvit import SimpleViT as RefSimpleViT

    torch.manual_seed(0)
    ref = RefSimpleViT(
        image_size=32, patch_size=4, num_classes=10, dim=128, depth=3,
        heads=4, mlp_dim=256,
    ).eval()
    x = _image()
    with torch.no_grad():
        want = tc.to_numpy(ref(torch.from_numpy(x)))

    mine = models.SimpleViT(
        image_size=32, patch_size=4, num_classes=10, dim=128, depth=3,
        heads=4, mlp_dim=256, attn_impl="xla",
    )
    emb = ref.to_patch_embedding
    params = {
        "norm_in": tc.layernorm_params(emb[1]),
        "proj": tc.linear_params(emb[2]),
        "norm_out": tc.layernorm_params(emb[3]),
        "transformer": tc.prenorm_transformer_params(ref.transformer),
        "linear_head": tc.linear_params(ref.linear_head),
    }
    got = np.asarray(
        mine.apply({"params": params}, jnp.asarray(tc.nchw_to_nhwc(x)))
    )
    assert got.shape == want.shape == (2, 10)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_hilbert_vit_parity():
    """HilbertViT with GFPE positional encoding (``altvit.py:208-268``)."""
    from src.models.altvit import HilbertViT as RefHilbertViT

    torch.manual_seed(0)
    ref = RefHilbertViT(
        image_size=32, patch_size=4, num_classes=10, dim=128, depth=3,
        heads=4, mlp_dim=256,
    ).eval()
    x = _image()
    with torch.no_grad():
        want = tc.to_numpy(ref(torch.from_numpy(x)))

    mine = models.CurveViT(
        image_size=32, patch_size=4, num_classes=10, dim=128, depth=3,
        heads=4, mlp_dim=256, curve="hilbert", attn_impl="xla",
    )
    emb = ref.to_patch_embedding
    params = {
        "to_patch_embedding": {
            "norm_in": tc.layernorm_params(emb.layernorm1),
            "proj": tc.linear_params(emb.linear),
            "norm_out": tc.layernorm_params(emb.layernorm2),
        },
        "transformer": tc.prenorm_transformer_params(ref.transformer),
        "linear_head": tc.linear_params(ref.linear_head),
    }
    # Also pin the GFPE table itself against the reference buffer.
    from sfc_vit_tpu.curves import flat_lut
    from sfc_vit_tpu.models import gfpe

    mine_pe = gfpe(flat_lut("hilbert", 8).astype(np.float32), 128)
    np.testing.assert_allclose(
        mine_pe, tc.to_numpy(ref.pos_embedding), rtol=1e-5, atol=1e-5
    )
    got = np.asarray(
        mine.apply({"params": params}, jnp.asarray(tc.nchw_to_nhwc(x)))
    )
    assert got.shape == want.shape == (2, 10)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_hierarchical_vit_smoke():
    """The reference model is broken as shipped (SURVEY.md 2c); ours must
    construct and run."""
    import jax

    tok = compat.HierarchicalMortonEmbedding(
        32, 3, [16, 4, 1], 64, return_levels=True
    )
    mine = models.HierarchicalVisionTransformer1D(
        patch_embed=tok, depth=1, n_heads=4, mlp_dim=64, num_classes=10,
        attn_impl="xla",
    )
    x = jnp.asarray(tc.nchw_to_nhwc(_image()))
    params = mine.init(jax.random.key(0), x)["params"]
    y = mine.apply({"params": params}, x)
    assert y.shape == (2, 10)
    assert np.isfinite(np.asarray(y)).all()


def test_attention_map_capture():
    """Applying with mutable intermediates yields per-head maps."""
    import jax
    import jax.numpy as jnp

    from sfc_vit_tpu.utils.profiling import attention_maps

    m = models.SimpleViT(
        image_size=16, patch_size=4, num_classes=4, dim=32, depth=2,
        heads=2, mlp_dim=64, dim_head=16, attn_impl="xla",
    )
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    out = attention_maps(m, variables, x)
    assert out["logits"].shape == (2, 4)
    assert len(out["attention"]) == 2  # one map per layer
    for w in out["attention"].values():
        arr = np.asarray(w)
        assert arr.shape[-4:] == (2, 2, 16, 16)
        np.testing.assert_allclose(arr.sum(-1), 1.0, rtol=1e-5, atol=1e-5)
