"""Int8 post-training quantization (sfc_vit_tpu.quant).

New TPU-serving capability (the torch reference serves fp32/amp only,
``main.py:158-159``); correctness is hermetic on CPU -- the int8
dot_general semantics are backend-independent, only the speed is
TPU-specific (RESULTS.md round 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfc_vit_tpu.quant import (
    dynamic_quantize,
    int8_dense,
    quantize_dense_params,
    quantize_weight,
    quantized_apply,
    strip_quantized_kernels,
)


def test_weight_quant_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
    w_i8, scale = quantize_weight(w)
    w_hat = w_i8.astype(jnp.float32) * scale
    # symmetric 127-level quant: max error <= scale/2 per channel
    err = jnp.max(jnp.abs(w_hat - w), axis=0)
    assert bool(jnp.all(err <= scale * 0.5 + 1e-7))


def test_dynamic_quantize_rows():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 7, 32)) * 10, jnp.bfloat16)
    x_i8, scale = dynamic_quantize(x)
    assert x_i8.dtype == jnp.int8 and scale.shape == (4, 7, 1)
    x_hat = x_i8.astype(jnp.float32) * scale
    assert float(jnp.max(jnp.abs(x_hat - x.astype(jnp.float32)))) <= float(
        jnp.max(scale)
    ) * 0.5 + 1e-6


def test_int8_dense_matches_fp32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 196, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 48)) / 10, jnp.float32)
    b = jnp.asarray(rng.standard_normal((48,)), jnp.float32)
    ref = x @ w + b
    w_i8, scale = quantize_weight(w)
    out = int8_dense(x, w_i8, scale, b, jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def _tiny_vit(curve="hilbert"):
    from sfc_vit_tpu.models import CurveViT

    return CurveViT(
        curve=curve, image_size=32, patch_size=4, num_classes=10,
        dim=64, depth=2, heads=2, mlp_dim=128, dim_head=32,
        dtype=jnp.float32,
    )


def test_quantized_model_close_and_jittable():
    model = _tiny_vit()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x[:1])
    ref = model.apply(params, x)
    # paths=None + model/sample auto-discovers reachable Denses
    qtable = quantize_dense_params(params, model=model, sample=x)
    assert qtable, "no Dense kernels found to quantize"

    # side-table must travel as a jit ARGUMENT (never a closure constant
    # -- big constants blow up the remote-backend HLO upload, CLAUDE.md)
    @jax.jit
    def serve(p, q, v):
        return quantized_apply(model, p, q, v)

    out = serve(params, qtable, x)
    cos = float(
        jnp.sum(out * ref)
        / (jnp.linalg.norm(out) * jnp.linalg.norm(ref))
    )
    assert cos > 0.995, cos
    # int8 serving must preserve the argmax class on this random model
    assert bool(jnp.all(jnp.argmax(out, -1) == jnp.argmax(ref, -1)))


def test_strip_quantized_kernels_unused():
    from sfc_vit_tpu.quant import discover_dense_paths

    model = _tiny_vit()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x[:1])
    # only interceptor-reachable Denses may be stripped: the fused-MLP
    # fc1/fc2 params are consumed directly by the kernel path
    qtable = quantize_dense_params(
        params, paths=discover_dense_paths(model, params, x)
    )
    full = quantized_apply(model, params, qtable, x)
    stripped = strip_quantized_kernels(params, qtable)
    out = quantized_apply(model, stripped, qtable, x)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(out))


def test_skip_keeps_module_fp():
    model = _tiny_vit()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x)
    all_paths = set(quantize_dense_params(params, paths="all"))
    head_paths = {p for p in all_paths if "linear_head" in p}
    assert head_paths, sorted(all_paths)
    kept = set(
        quantize_dense_params(params, skip=("linear_head",), paths="all")
    )
    assert kept == all_paths - head_paths
    assert kept != all_paths
    # paths=None without a model is the broken warn-and-proceed combo
    # the round-2 advisor flagged — it must raise now
    with pytest.raises(ValueError):
        quantize_dense_params(params)


def test_bench_quick_quant_cpu():
    import bench

    rec = bench.main([
        "--quick", "--platform", "cpu", "--quant", "int8",
        "--iters", "2", "--batch-size", "8",
    ])
    assert rec["value"] > 0 and rec["vs_baseline"] > 0


def test_static_calibration_close():
    model = _tiny_vit()
    rng = np.random.default_rng(5)
    calib = [jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
             for _ in range(2)]
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x[:1])
    ref = model.apply(params, x)

    from sfc_vit_tpu.quant import calibrate_activations

    scales = calibrate_activations(model, params, calib)
    assert scales and all(float(s) > 0 for s in scales.values())
    qtable = quantize_dense_params(
        params, act_scales=scales, paths=set(scales)
    )
    assert all("x_scale" in e for e in qtable.values())
    out = quantized_apply(model, params, qtable, x)
    cos = float(
        jnp.sum(out * ref)
        / (jnp.linalg.norm(out) * jnp.linalg.norm(ref))
    )
    # static scales clip tokens outside the calibration range; the
    # eval batch is fresh, so the bound is a bit looser than dynamic
    assert cos > 0.99, cos


def test_bench_quick_quant_static_cpu():
    import bench

    rec = bench.main([
        "--quick", "--platform", "cpu", "--quant", "int8-static",
        "--iters", "2", "--batch-size", "8",
    ])
    assert rec["value"] > 0 and rec["vs_baseline"] > 0


def test_quant_composes_with_fused_block_path(monkeypatch):
    """With the fused-block kernels engaged (pad-once stack), encoder
    to_qkv/fc1/... params are _DenseParams holder reads, not nn.Dense
    calls — discovery must include them, the interceptor serves them
    weight-only (dequantize-on-read feeding the kernel), and stripping
    them must leave serving intact with int8 the only resident copy."""
    from sfc_vit_tpu.models import SimpleViT
    from sfc_vit_tpu.models import simple_vit as sv
    from sfc_vit_tpu.quant import discover_dense_paths

    kw = dict(image_size=20, patch_size=4, num_classes=5, dim=128,
              depth=1, heads=2, mlp_dim=192, dim_head=64)
    m = SimpleViT(**kw)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 20, 20, 3)),
        jnp.float32,
    )
    params = m.init({"params": jax.random.key(0)}, x)

    monkeypatch.setattr(sv, "_FORCE_FUSED", True)
    paths = discover_dense_paths(m, params, x)
    names = {p[-1] for p in paths}
    # holder reads are discovered alongside real Dense calls
    assert "to_qkv" in names and "fc1" in names
    assert "proj" in names and "linear_head" in names

    table = quantize_dense_params(params, paths=paths)
    assert set(table) == paths
    ref = m.apply(params, x)
    got = quantized_apply(m, params, table, x)
    cos = float(
        jnp.sum(ref * got)
        / (jnp.linalg.norm(ref) * jnp.linalg.norm(got) + 1e-9)
    )
    assert cos > 0.99, cos
    # the fused path never reads the tree copies of holder kernels:
    # stripping them must change nothing and shrink residency
    stripped = strip_quantized_kernels(params, table)
    enc = stripped["params"]["transformer"]["attn_0"]["to_qkv"]["kernel"]
    assert enc.shape == (1,)
    out = quantized_apply(m, stripped, table, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(out))


def test_holder_paths_family_a_quantized(monkeypatch):
    """Family-A in/out projections moved to _DenseParams holders for
    the fused train-MHA kernel — int8 serving must still cover them
    (the ViT-B-width flagship keeps 54% of its weights there)."""
    from sfc_vit_tpu.models.layers import TransformerSeqEncoder
    from sfc_vit_tpu.quant import discover_dense_paths

    m = TransformerSeqEncoder(
        dim=64, n_heads=2, hidden_dim=96, n_layers=2, dropout_rate=0.0
    )
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 12, 64)), jnp.float32)
    params = m.init({"params": jax.random.key(1)}, x)

    paths = discover_dense_paths(m, params, x)
    names = {p[-1] for p in paths}
    assert "in_proj" in names and "out_proj" in names, sorted(names)
    assert "linear1" in names  # unfused MLP on CPU stays nn.Dense

    table = quantize_dense_params(params, paths=paths)
    ref = m.apply(params, x)
    stripped = strip_quantized_kernels(params, table)
    got = quantized_apply(m, stripped, table, x)
    cos = float(
        jnp.sum(ref * got)
        / (jnp.linalg.norm(ref) * jnp.linalg.norm(got) + 1e-9)
    )
    assert cos > 0.99, cos
    # residency actually shrank: in_proj kernel is a placeholder now
    k = stripped["params"]["layer_0"]["self_attn"]["in_proj"]["kernel"]
    assert k.shape == (1,)


def test_holder_dequant_preserves_dtype():
    """The wdt marker must hand back the ORIGINAL kernel dtype, or the
    promote_types(x, w) rule would upgrade bf16 serving to fp32."""
    from sfc_vit_tpu.quant import dequantize_weight

    w = jnp.asarray(
        np.random.default_rng(2).standard_normal((32, 16)), jnp.bfloat16
    )
    table = quantize_dense_params(
        {"params": {"mod": {"kernel": w}}}, paths={("mod",)}
    )
    back = dequantize_weight(table[("mod",)])
    assert back.dtype == jnp.bfloat16
    rel = float(
        jnp.linalg.norm(back.astype(jnp.float32) - w.astype(jnp.float32))
        / jnp.linalg.norm(w.astype(jnp.float32))
    )
    assert rel < 0.02, rel


def test_holder_quant_through_fused_postnorm_tail(monkeypatch):
    """Family-A fused postnorm-tail (holder-read LN/fc params) must
    serve from the int8 table through the interceptor: the Pallas
    kernel consumes computed (dequantized) weight values, interpret
    mode on CPU."""
    from sfc_vit_tpu.models import simple_vit as sv
    from sfc_vit_tpu.models.layers import TransformerSeqEncoder
    from sfc_vit_tpu.quant import discover_dense_paths

    m = TransformerSeqEncoder(
        dim=128, n_heads=2, hidden_dim=256, n_layers=1, dropout_rate=0.0
    )
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 12, 128)), jnp.float32)
    params = m.init({"params": jax.random.key(3)}, x)

    monkeypatch.setattr(sv, "_FORCE_FUSED", True)
    paths = discover_dense_paths(m, params, x)
    names = {p[-1] for p in paths}
    # fused tail engaged: linear1/linear2 are holder reads now
    assert ("layer_0", "linear1") in paths, sorted(paths)
    assert "in_proj" in names

    table = quantize_dense_params(params, paths=paths)
    ref = m.apply(params, x)
    stripped = strip_quantized_kernels(params, table)
    got = quantized_apply(m, stripped, table, x)
    rel = float(
        jnp.linalg.norm(ref - got) / (jnp.linalg.norm(ref) + 1e-9)
    )
    assert rel < 0.05, rel


def test_holder_apply_mode_matches_inline_gemm():
    """`_DenseParams(x)` (apply mode) must equal the inline
    `x @ kernel + bias` the callers used to write — same cast rule."""
    from sfc_vit_tpu.models.simple_vit import _DenseParams

    m = _DenseParams(24, 40)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 7, 24)), jnp.bfloat16)
    params = m.init(jax.random.key(0))
    w, b = m.apply(params)
    ref = x @ w.astype(x.dtype) + b.astype(x.dtype)
    got = m.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    assert got.dtype == x.dtype


def test_holder_apply_mode_routes_to_int8_dense(monkeypatch):
    """On the family-A packed inference path the in/out projections are
    holder APPLY calls: the interceptor must run the true int8 MXU GEMM
    there (not a dequantized weight view) — that's the serving
    throughput lever (+46% raw vs +15.8% dequant-view,
    results/r3_int8_serving.json vs r3_serving_onchip.json)."""
    from sfc_vit_tpu.models.layers import TransformerSeqEncoder
    from sfc_vit_tpu.quant import discover_dense_paths, int8
    m = TransformerSeqEncoder(
        dim=64, n_heads=2, hidden_dim=96, n_layers=1, dropout_rate=0.0
    )
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, 12, 64)), jnp.float32)
    params = m.init({"params": jax.random.key(7)}, x)

    paths = discover_dense_paths(m, params, x)
    table = quantize_dense_params(params, paths=paths)

    hits = []
    real = int8.int8_dense

    def spy(*args, **kwargs):
        hits.append(args[1].shape)  # w_i8 shape
        return real(*args, **kwargs)

    monkeypatch.setattr(int8, "int8_dense", spy)
    ref = m.apply(params, x)
    got = quantized_apply(m, strip_quantized_kernels(params, table),
                          table, x)
    # in_proj [64,192] and out_proj [64,64] ran as int8 GEMMs
    assert (64, 192) in hits and (64, 64) in hits, hits
    cos = float(
        jnp.sum(ref * got)
        / (jnp.linalg.norm(ref) * jnp.linalg.norm(got) + 1e-9)
    )
    assert cos > 0.99, cos


def test_calibration_shape_keyed_key_order():
    """jit caches by batch shape and the observer only runs at trace
    time: when shape-gated branches observe DIFFERENT module sets per
    shape, a cache-hit batch must zip its amax values against the key
    list snapshotted at ITS OWN trace — not whatever shape traced last
    (review finding: A,B,A batch order misassigned A's values to B's
    keys)."""
    import flax.linen as nn

    from sfc_vit_tpu.quant import calibrate_activations

    class Gated(nn.Module):
        @nn.compact
        def __call__(self, x):
            # small batches route through an EXTRA Dense -> the traced
            # module-call set differs between the two batch shapes
            if x.shape[0] <= 2:
                x = nn.Dense(8, name="small_only")(x)
            return nn.Dense(4, name="shared")(x)

    m = Gated()
    params = m.init(jax.random.key(0), jnp.ones((2, 8)))
    big = jnp.full((5, 8), 100.0)       # traces WITHOUT small_only
    small = jnp.full((2, 8), 1.0)       # traces WITH small_only
    big2 = jnp.full((5, 8), 300.0)      # cache HIT on big's executable

    scales = calibrate_activations(m, params, [big, small, big2])
    names = {k[-2] if len(k) > 1 else k[0] for k in scales}
    assert {"small_only", "shared"} <= names, scales
    # big2 (amax 300) must land on `shared`, not on small_only's slot
    by_name = {k[0]: float(v) for k, v in scales.items()}
    assert by_name["shared"] == pytest.approx(300.0 / 127.0)
    assert by_name["small_only"] == pytest.approx(1.0 / 127.0)


def test_calibration_handles_inputs_keyword():
    """nn.Dense invoked as dense(inputs=x) must still be observed (its
    parameter is named `inputs`, not `x`)."""
    import flax.linen as nn

    from sfc_vit_tpu.quant import calibrate_activations

    class KwCall(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4, name="kw")(inputs=x)

    m = KwCall()
    params = m.init(jax.random.key(0), jnp.ones((2, 8)))
    scales = calibrate_activations(m, params, [jnp.full((2, 8), 2.0)])
    assert scales and float(next(iter(scales.values()))) == \
        pytest.approx(2.0 / 127.0)


def test_holder_apply_mode_honors_out_dtype():
    """intercept_dense(out_dtype=...) must apply to holder APPLY-mode
    GEMMs the same way it does to nn.Dense (review finding: the holder
    branch hardcoded x.dtype)."""
    import flax.linen as nn

    from sfc_vit_tpu.models.simple_vit import _DenseParams
    from sfc_vit_tpu.quant.int8 import intercept_dense

    m = _DenseParams(16, 8)
    params = m.init(jax.random.key(0))
    table = quantize_dense_params(
        params, paths={()}
    )
    # holder path is () at top level; re-key the table to the module
    # path intercept_dense sees (top-level module -> path ())
    x = jnp.ones((3, 16), jnp.bfloat16)
    with nn.intercept_methods(
        intercept_dense(table, out_dtype=jnp.float32)
    ):
        out = m.apply(params, x)
    assert out.dtype == jnp.float32
