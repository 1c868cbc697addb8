"""Persistent XLA compilation cache (sfc_vit_tpu.utils.compile_cache).

Production feature for the remote-TPU deployment (cold ViT-B compiles
cost 5-20 min over the tunnel — CLAUDE.md); correctness is hermetic on
CPU: the cache is content-addressed by HLO, so entry reuse is
observable as a stable entry count across fresh processes.
"""

import os
import subprocess
import sys

import jax
import pytest

from sfc_vit_tpu.utils import compile_cache_stats, enable_compile_cache


@pytest.fixture
def restore_cache_config():
    cfg = jax.config
    saved = (
        cfg.jax_enable_compilation_cache,
        cfg.jax_compilation_cache_dir,
        cfg.jax_persistent_cache_min_compile_time_secs,
        cfg.jax_persistent_cache_min_entry_size_bytes,
    )
    yield
    cfg.update("jax_enable_compilation_cache", saved[0])
    cfg.update("jax_compilation_cache_dir", saved[1])
    cfg.update("jax_persistent_cache_min_compile_time_secs", saved[2])
    cfg.update("jax_persistent_cache_min_entry_size_bytes", saved[3])


def test_enable_writes_entries(tmp_path, restore_cache_config):
    import jax.numpy as jnp

    cache = tmp_path / "jax-cache"
    path = enable_compile_cache(cache, min_compile_seconds=0.0)
    assert os.path.isdir(path)

    @jax.jit
    def f(a):
        return (a @ a.T).sum() * 3.0

    float(f(jnp.ones((32, 16))))
    stats = compile_cache_stats(cache)
    assert stats["entries"] > 0 and stats["bytes"] > 0


def test_stats_on_missing_dir(tmp_path):
    assert compile_cache_stats(tmp_path / "nope") == {
        "entries": 0, "bytes": 0,
    }


_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
from sfc_vit_tpu.utils import enable_compile_cache
enable_compile_cache({cache!r}, min_compile_seconds=0.0)
import jax.numpy as jnp
from sfc_vit_tpu.models import CurveViT
m = CurveViT(curve="hilbert", image_size=16, patch_size=4, num_classes=4,
             dim=32, depth=1, heads=2, mlp_dim=48, dim_head=16)
x = jnp.zeros((2, 16, 16, 3), jnp.float32)
p = m.init({{"params": jax.random.key(0)}}, x)
out = jax.jit(lambda p, x: m.apply(p, x))(p, x)
print("OK", out.shape)
"""


def test_cross_process_reuse(tmp_path):
    """Two fresh processes compiling the SAME model: the second must
    not grow the cache (content-addressed hit), proving a serving
    restart would skip the cold compile."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = str(tmp_path / "shared-cache")
    code = _CHILD.format(repo=repo, cache=cache)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site" + os.pathsep + repo

    first = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=600)
    assert first.returncode == 0, first.stderr[-2000:]
    n1 = compile_cache_stats(cache)["entries"]
    assert n1 > 0

    second = subprocess.run([sys.executable, "-c", code], env=env,
                            capture_output=True, text=True, timeout=600)
    assert second.returncode == 0, second.stderr[-2000:]
    assert "OK" in second.stdout
    n2 = compile_cache_stats(cache)["entries"]
    assert n2 == n1, (n1, n2)


def test_cli_flag_accepted():
    from sfc_vit_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["--compile-cache", "/tmp/x", "--epochs", "1"]
    )
    assert args.compile_cache == "/tmp/x"
