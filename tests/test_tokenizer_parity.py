"""Numerical forward-parity: flax tokenizers vs the PyTorch reference.

Weights are copied torch -> flax, the same random image is fed to both,
and outputs must agree to fp32 tolerance (SURVEY.md section 4 item 2).
Skipped automatically when the reference checkout is not mounted.
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

import jax
import jax.numpy as jnp

from sfc_vit_tpu.tokenizers import compat
from sfc_vit_tpu.utils.torch_compat import (
    conv2d_params,
    linear_params,
    nchw_to_nhwc,
    to_numpy,
)

RTOL, ATOL = 1e-5, 1e-5


def _image(b=2, c=3, hw=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, c, hw, hw)).astype(np.float32)


def _run_flax(module, params, x_nchw, rngs=None):
    y = module.apply({"params": params}, jnp.asarray(nchw_to_nhwc(x_nchw)),
                     rngs=rngs)
    return np.asarray(y)


@pytest.mark.parametrize(
    "ref_path,ref_cls,curve",
    [
        ("src.tokenizers._1D.zigzag_embedding1D", "RasterScan1DEmbedding", "raster"),
        ("src.tokenizers._1D.hilbert_embedding1D", "HilbertEmbedding1D", "hilbert"),
        ("src.tokenizers._1D.peano_embedding1D", "PeanoEmbedding1D", "peano"),
        ("src.tokenizers._1D.moore_embedding1D", "MooreEmbedding1D", "moore"),
        ("src.tokenizers._1D.morton_embedding1D", "MortonEmbedding1D", "morton"),
        ("src.tokenizers._1D.onion_embedding1D", "OnionEmbedding1D", "onion"),
    ],
)
def test_pixel1d_parity(ref_path, ref_cls, curve):
    import importlib

    mod = importlib.import_module(ref_path)
    ref = getattr(mod, ref_cls)(32, 4, 3, 64).eval()
    x = _image()
    with torch.no_grad():
        want = to_numpy(ref(torch.from_numpy(x)))

    mine = compat.__dict__[ref_cls if ref_cls != "RasterScan1DEmbedding" else "RasterScan1DEmbedding"](
        32, 4, 3, 64
    )
    params = {"proj": linear_params(ref.proj)}
    got = _run_flax(mine, params, x)
    assert got.shape == want.shape == (2, 256, 64)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize(
    "ref_path,ref_cls",
    [
        ("src.tokenizers._2D.zigzag_embedding", "ZigzagEmbedding"),
        ("src.tokenizers._2D.hilbert_embedding", "HilbertEmbedding"),
    ],
)
def test_conv2d_parity(ref_path, ref_cls):
    import importlib

    mod = importlib.import_module(ref_path)
    ref = getattr(mod, ref_cls)(32, 4, 3, 64).eval()
    x = _image()
    with torch.no_grad():
        want = to_numpy(ref(torch.from_numpy(x)))

    mine = compat.__dict__[ref_cls](32, 4, 3, 64)
    params = {"proj": conv2d_params(ref.proj)}
    got = _run_flax(mine, params, x)
    assert got.shape == want.shape == (2, 64, 64)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_random_embedding_is_fresh_permutation():
    """Reference semantics (``_2D/random_embedding.py:34-35``): a fresh
    shuffle every call; the missing-embed_dim bug is fixed in our build."""
    mine = compat.RandomEmbedding(32, 4, 3, 64)
    x = jnp.asarray(nchw_to_nhwc(_image()))
    params = mine.init(
        {"params": jax.random.key(0), "permute": jax.random.key(1)}, x
    )["params"]
    y1 = mine.apply({"params": params}, x, rngs={"permute": jax.random.key(2)})
    y2 = mine.apply({"params": params}, x, rngs={"permute": jax.random.key(3)})
    assert y1.shape == (2, 64, 64)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # same tokens, different order
    np.testing.assert_allclose(
        np.sort(np.asarray(y1), axis=1), np.sort(np.asarray(y2), axis=1),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize(
    "ref_path,ref_cls,mine_name",
    [
        ("src.tokenizers.multiscale.multi_morton", "HierarchicalMortonEmbedding", "HierarchicalMortonEmbedding"),
        ("src.tokenizers.multiscale.multi_hilbert", "HierarchicalHilbertEmbedding", "HierarchicalHilbertEmbedding"),
        ("src.tokenizers.multiscale.multi_onion", "HierarchicalOnionEmbedding", "HierarchicalOnionEmbedding"),
        ("src.tokenizers.multiscale.multi_zigzag", "HierarchicalRasterScanEmbedding", "HierarchicalRasterScanEmbedding"),
    ],
)
def test_hierarchical_parity(ref_path, ref_cls, mine_name):
    import importlib

    mod = importlib.import_module(ref_path)
    ref = getattr(mod, ref_cls)(32, 3, [16, 4, 1], 64).eval()
    x = _image()
    with torch.no_grad():
        want = to_numpy(ref(torch.from_numpy(x)))

    mine = compat.__dict__[mine_name](32, 3, [16, 4, 1], 64)
    params = {
        f"level_{i}": {"proj": linear_params(ref.levels[i].proj)}
        for i in range(3)
    }
    params["fusion"] = linear_params(ref.fusion)
    got = _run_flax(mine, params, x)
    assert got.shape == want.shape == (2, 64, 192)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
