"""ServingEngine: AOT-compiled fixed-shape inference (serving.py) —
padding-exact batching, int8-resident weights, export round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfc_vit_tpu.models import SimpleViT
from sfc_vit_tpu.serving import ServingEngine, deserialize_forward


@pytest.fixture(scope="module")
def tiny():
    model = SimpleViT(
        image_size=16, patch_size=4, num_classes=7, dim=64, depth=2,
        heads=2, mlp_dim=96, dim_head=32, attn_impl="xla",
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((13, 16, 16, 3)),
        jnp.float32,
    )
    params = model.init({"params": jax.random.key(0)}, x[:1])
    return model, params, x


def test_predict_matches_direct_apply(tiny):
    model, params, x = tiny
    eng = ServingEngine(model, params, image_shape=(16, 16, 3),
                        batch_sizes=(4, 8))
    got = eng.predict(x)  # 13 = 8 + padded-tail(5 -> 8)
    want = np.asarray(model.apply(params, x, deterministic=True))
    assert got.shape == (13, 7)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    # single image (auto-unsqueeze) pads to the smallest batch
    one = eng.predict(x[0])
    np.testing.assert_allclose(one, want[:1], rtol=2e-5, atol=2e-6)
    # classes helper
    assert eng.predict_classes(x).shape == (13,)
    # shape validation
    with pytest.raises(ValueError, match="expected images"):
        eng.predict(np.zeros((2, 8, 8, 3), np.float32))


def test_int8_weights_shrink_and_stay_close(tiny):
    model, params, x = tiny
    native = ServingEngine(model, params, image_shape=(16, 16, 3),
                           batch_sizes=(8,))
    quant = ServingEngine(model, params, image_shape=(16, 16, 3),
                          batch_sizes=(8,), weights="int8")
    # every Dense is interceptor-reachable on CPU (no fused kernels), so
    # stripping must shrink resident weight memory
    assert quant.weight_bytes() < native.weight_bytes()
    a = native.predict(x[:8])
    b = quant.predict(x[:8])
    # per-channel int8 weight quantization: logits track closely
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.05, rel
    # and the top-1 decisions agree on this easy case
    assert (a.argmax(-1) == b.argmax(-1)).mean() >= 0.75


def test_data_parallel_serving_matches_single(tiny):
    """data_parallel=4 on the 8-CPU mesh: params replicated, batch
    sharded, per-example logits identical to the unsharded engine."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    model, params, x = tiny
    plain = ServingEngine(model, params, image_shape=(16, 16, 3),
                          batch_sizes=(8,))
    dp = ServingEngine(model, params, image_shape=(16, 16, 3),
                       batch_sizes=(8,), data_parallel=4)
    np.testing.assert_allclose(
        dp.predict(x), plain.predict(x), rtol=2e-5, atol=2e-6)
    with pytest.raises(ValueError, match="not divisible"):
        ServingEngine(model, params, image_shape=(16, 16, 3),
                      batch_sizes=(6,), data_parallel=4)


def test_export_roundtrip(tiny):
    model, params, x = tiny
    eng = ServingEngine(model, params, image_shape=(16, 16, 3),
                        batch_sizes=(4,))
    blobs = eng.export_serialized()
    assert set(blobs) == {4}
    f = deserialize_forward(blobs[4])
    got = np.asarray(f(eng.variables, eng._qtable, jnp.asarray(
        x[:4], jnp.float32)))
    want = eng.predict(x[:4])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_int8_data_parallel_and_export_compose(tiny):
    """int8-resident weights compose with the data-parallel mesh mode
    (qtable replicated alongside params) and with jax.export — the
    full deployment matrix, not just each feature alone."""
    model, params, x = tiny
    dp8 = ServingEngine(model, params, image_shape=(16, 16, 3),
                        batch_sizes=(8,), data_parallel=4,
                        weights="int8")
    single = ServingEngine(model, params, image_shape=(16, 16, 3),
                           batch_sizes=(8,), weights="int8")
    np.testing.assert_allclose(
        dp8.predict(x[:8]), single.predict(x[:8]), rtol=2e-5, atol=2e-6)
    assert dp8.weight_bytes() == single.weight_bytes()

    blobs = single.export_serialized()
    f = deserialize_forward(blobs[8])
    got = np.asarray(f(single.variables, single._qtable,
                       jnp.asarray(x[:8], jnp.float32)))
    np.testing.assert_allclose(
        got, single.predict(x[:8]), rtol=2e-5, atol=2e-6)


def test_int8_static_calibration_close_and_static_scales(tiny):
    """calibration= bakes static x_scales into the side-table for every
    activation-carrying read — nn.Dense calls AND holder APPLY calls
    (family-A in/out projections) — and logits stay close to native.
    Weight-mode holder reads have no activation and stay dynamic-free
    (the kernel consumes a dequantized weight view)."""
    from sfc_vit_tpu.models.layers import TransformerSeqEncoder

    model = TransformerSeqEncoder(
        dim=64, n_heads=2, hidden_dim=96, n_layers=2, dropout_rate=0.0
    )
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((13, 12, 64)), jnp.float32)
    params = model.init({"params": jax.random.key(9)}, x[:1])

    native = ServingEngine(model, params, image_shape=(12, 64),
                           batch_sizes=(8,))
    static = ServingEngine(model, params, image_shape=(12, 64),
                           batch_sizes=(8,), weights="int8",
                           calibration=[x[:8], x[8:][:5]])
    scaled = {p[-1] for p, e in static._qtable.items() if "x_scale" in e}
    # apply-mode holders and plain Denses all calibrated
    assert {"in_proj", "out_proj", "linear1", "linear2"} <= scaled, scaled
    a = native.predict(x[:8])
    b = static.predict(x[:8])
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.06, rel
    assert (a.argmax(-1) == b.argmax(-1)).mean() >= 0.75
    # calibration without int8 weights is a configuration error
    with pytest.raises(ValueError, match="calibration"):
        ServingEngine(model, params, image_shape=(12, 64),
                      batch_sizes=(8,), calibration=[x[:8]])


def test_predict_empty_batch(tiny):
    """N=0 returns a (0, num_classes) array instead of crashing in
    np.concatenate (review finding)."""
    model, params, x = tiny
    eng = ServingEngine(model, params, image_shape=(16, 16, 3),
                        batch_sizes=(4,))
    out = eng.predict(np.zeros((0, 16, 16, 3), np.float32))
    ref = eng.predict(x[:4])
    assert out.shape == (0, ref.shape[-1]) and out.dtype == ref.dtype


def test_export_data_parallel_raises(tiny):
    """Exporting a data-parallel engine would bake this host's mesh
    into the artifact — must raise with guidance, not serialize a
    topology-pinned blob (review finding)."""
    model, params, x = tiny
    dp = ServingEngine(model, params, image_shape=(16, 16, 3),
                       batch_sizes=(4,), data_parallel=4)
    with pytest.raises(ValueError, match="data_parallel"):
        dp.export_serialized()


def test_strip_removes_biases_too():
    """The interceptor serves bias from the qtable entry in every mode,
    so stripping must drop the params-tree bias copy as well — keeping
    it would double-count HBM in weight_bytes (review finding)."""
    from sfc_vit_tpu.models.layers import TransformerSeqEncoder
    from sfc_vit_tpu.quant import (
        discover_dense_paths,
        quantize_dense_params,
        quantized_apply,
        strip_quantized_kernels,
    )

    m = TransformerSeqEncoder(
        dim=32, n_heads=2, hidden_dim=48, n_layers=1, dropout_rate=0.0
    )
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 8, 32)), jnp.float32
    )
    params = m.init({"params": jax.random.key(0)}, x)
    paths = discover_dense_paths(m, params, x)
    table = quantize_dense_params(params, paths=paths)
    stripped = strip_quantized_kernels(params, table)

    flat = dict(jax.tree_util.tree_flatten_with_path(stripped)[0])
    n_placeholder_bias = sum(
        1 for kp, leaf in flat.items()
        if "bias" in str(kp) and leaf.shape == (1,)
    )
    assert n_placeholder_bias >= len(
        [e for e in table.values() if e.get("bias") is not None]
    )
    got = quantized_apply(m, stripped, table, x)
    want = quantized_apply(m, params, table, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_schedule_model_serves_and_quantizes():
    """Hybrid per-layer attention schedules flow through the engine:
    predict matches direct apply, and int8 weight discovery still
    reaches every holder (the schedule changes attention dispatch, not
    the param tree)."""
    model = SimpleViT(
        image_size=16, patch_size=4, num_classes=7, dim=64, depth=2,
        heads=2, mlp_dim=96, dim_head=32, attn_impl=("local", "xla"),
    )
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((5, 16, 16, 3)),
        jnp.float32,
    )
    params = model.init({"params": jax.random.key(0)}, x[:1])
    eng = ServingEngine(model, params, image_shape=(16, 16, 3),
                        batch_sizes=(5,))
    want = np.asarray(model.apply(params, x, deterministic=True))
    np.testing.assert_allclose(eng.predict(x), want, rtol=2e-5, atol=2e-6)
    quant = ServingEngine(model, params, image_shape=(16, 16, 3),
                          batch_sizes=(5,), weights="int8")
    assert quant.weight_bytes() < eng.weight_bytes()
    rel = np.linalg.norm(quant.predict(x) - want) / np.linalg.norm(want)
    assert rel < 0.05
