"""Post-training int8 quantization for serving.

TPU v5e's MXU runs int8 matmuls at 2x the bf16 rate (394 vs 197
TOPS peak), so a GEMM-bound ViT forward has real headroom beyond
bf16.  This module adds a *post-training* int8 path that needs no
model-code changes and no retraining:

  * weights: per-output-channel symmetric int8 (max-abs calibration,
    computed once at quantization time, host- or device-side);
  * activations: per-token dynamic symmetric int8 (max-abs over the
    feature axis, computed in-graph -- a cheap VPU reduction XLA fuses
    into the surrounding elementwise work);
  * matmul: ``lax.dot_general(int8, int8, preferred_element_type=
    int32)`` -- the XLA lowering the MXU's int8 mode wants -- followed
    by the fp32 rescale ``(x_scale * w_scale)`` and bias add.

Integration is a flax *method interceptor* (:func:`quantized_apply` /
:func:`intercept_dense`): every ``nn.Dense.__call__`` whose kernel was
quantized is redirected to :func:`int8_dense`, so all model families
(torch-parity ViTs, SimpleViT/CurveViT, retrofit) get the path without
threading a flag through each module.  The original (unquantized)
params tree is still what ``apply`` receives -- bypassed Dense kernels
are simply never read -- which keeps checkpoints, param sharding and
the fp/bf16 path untouched.

Params consumed by the fused Pallas kernels are held in
``_DenseParams`` holder modules (``models/simple_vit.py``) rather than
``nn.Dense`` -- the kernel, not a Dense call, does the GEMM.  Those
are intercepted at the *holder*: the interceptor returns the
dequantized weight ``w_i8 * scale`` (weight-only quantization,
:func:`dequantize_weight`), so the resident copy is int8 and the
kernel consumes a transient bf16/fp32 view.  This keeps the full
int8 residency win under ``attn_impl='auto'`` (family-A in/out
projections are 54% of the ViT-B-width flagship's weights).

The reference has no quantization story (it serves fp32/amp torch,
``main.py:158-159``); this is new TPU-native serving capability, kept
opt-in (``bench.py --quant int8``; accuracy evidence: the argmax/cosine
assertions in ``tests/test_quant.py`` and the measured logit rel-L2 in
``results/r3_serving_onchip.json``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import unfreeze

__all__ = [
    "quantize_weight",
    "dynamic_quantize",
    "int8_dense",
    "quantize_dense_params",
    "calibrate_activations",
    "intercept_dense",
    "quantized_apply",
    "dequantize_weight",
]


def _holder_type():
    """The fused-kernel param-holder module class (lazy import: quant
    must stay importable without pulling the model stack at module
    import time)."""
    from ..models.simple_vit import _DenseParams

    return _DenseParams


def quantize_weight(
    w: jnp.ndarray, axis: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a Dense kernel.

    ``w`` is a flax Dense kernel ``[d_in, d_out]``; the scale is
    per-output-channel (max-abs over ``axis`` = the contraction axis),
    the standard PTQ weight scheme.  Returns ``(w_i8, scale_f32)`` with
    ``w ~= w_i8 * scale``.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale.squeeze(axis)


def dynamic_quantize(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token (last-axis-row) dynamic symmetric int8 quantization.

    Returns ``(x_i8, scale)`` with ``scale`` shaped like ``x`` minus the
    last axis (keepdims), fp32.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    x_i8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_i8, scale


def int8_dense(
    x: jnp.ndarray,
    w_i8: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    out_dtype: jnp.dtype,
    x_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``x @ W + b`` with the GEMM on the int8 MXU path.

    ``x``: [..., d_in] float; ``w_i8``: [d_in, d_out] int8; ``w_scale``:
    [d_out] fp32.  Two activation-quantization modes:

    * dynamic (``x_scale=None``): per-token max-abs, computed in-graph.
      Zero calibration, but the row reduce is an extra HBM pass over
      the activations — measured a net LOSS at ViT-B batch 256
      (RESULTS.md round 2).
    * static (``x_scale`` = calibrated scalar): the quantize is pure
      elementwise, so XLA fuses it into the producer's epilogue and the
      activation streams to the GEMM as int8 — half the HBM traffic
      AND the 2x int8 MXU rate.  This is the serving configuration;
      get scales from :func:`calibrate_activations`.
    """
    if x_scale is None:
        x_i8, row_scale = dynamic_quantize(x)
    else:
        xf = x.astype(jnp.float32)
        x_i8 = jnp.clip(
            jnp.round(xf / x_scale), -127, 127
        ).astype(jnp.int8)
        row_scale = x_scale
    acc = jax.lax.dot_general(
        x_i8,
        w_i8,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * row_scale * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _walk(tree: Dict[str, Any], path: Tuple[str, ...], out: Dict):
    if isinstance(tree, dict):
        keys = set(tree.keys())
        if "kernel" in keys and getattr(tree["kernel"], "ndim", 0) == 2:
            out[path] = tree
        else:
            for k, v in tree.items():
                _walk(v, path + (k,), out)


def quantize_dense_params(
    params: Dict[str, Any],
    skip: Tuple[str, ...] = (),
    act_scales=None,
    paths=None,
    *,
    model: Optional[nn.Module] = None,
    sample=None,
    **apply_kwargs,
) -> Dict[Tuple[str, ...], Dict[str, jnp.ndarray]]:
    """Build the quantization side-table from a params tree.

    Walks ``params['params']`` (or ``params`` directly) and quantizes
    2-D ``kernel`` leaves (= ``nn.Dense``; Convs have 3-D+ kernels and
    are skipped).  ``skip`` drops any module whose path contains one of
    the given names (e.g. ``('out',)`` to keep the classifier head in
    bf16).

    Which leaves, exactly, is governed by ``paths``:

    * ``paths=<set of module paths>`` — quantize only those (the output
      of :func:`discover_dense_paths`, evaluated on the SAME backend
      you serve on: the fused-kernel gates are backend-dependent, so
      CPU-discovered paths differ from TPU's).
    * ``paths=None`` with ``model=`` (+ ``sample=``) — auto-discovers
      via :func:`discover_dense_paths` on the current backend.
    * ``paths="all"`` — every 2-D kernel leaf.  Fused-kernel holder
      params (``to_qkv``/``in_proj``/...) are fine under discovery
      (the interceptor serves them weight-only at the holder), but
      "all" also sweeps in 2-D kernels that are NEITHER Dense nor
      holder reads (e.g. mixer einsum params) — quantizing those is a
      silent no-op and stripping them hands the model zeroed
      placeholders.  Keep discovery-gated unless you know the tree.

    ``paths=None`` without a model raises (the warn-and-proceed
    combination was exactly the broken case above).

    Returns ``{module_path: {'w': int8 kernel, 'scale': [d_out] f32,
    'bias': original bias or None}}`` keyed by the flax module path
    tuple, as reported by ``module.path`` during apply.
    """
    if paths is None:
        if model is None or sample is None:
            raise ValueError(
                "quantize_dense_params needs to know which kernels the "
                "serving path actually reads through nn.Dense: pass "
                "paths=discover_dense_paths(model, params, x) evaluated "
                "on the serving backend, or model=/sample= to "
                "auto-discover here, or paths='all' to (unsafely) "
                "quantize every 2-D kernel leaf (see docstring)."
            )
        paths = discover_dense_paths(model, params, sample, **apply_kwargs)
    if paths == "all":
        paths = None  # enumerate everything (explicitly requested)
    tree = unfreeze(params)
    if "params" in tree and isinstance(tree["params"], dict):
        tree = tree["params"]
    found: Dict[Tuple[str, ...], Dict] = {}
    _walk(tree, (), found)
    table = {}
    for path, leaf in found.items():
        if any(s in path for s in skip):
            continue
        if paths is not None and path not in paths:
            # not an interceptor-reachable nn.Dense (e.g. fused-kernel
            # params); see discover_dense_paths
            continue
        kernel = jnp.asarray(leaf["kernel"])
        w_i8, scale = quantize_weight(kernel)
        table[path] = {
            "w": w_i8,
            "scale": scale,
            "bias": jnp.asarray(leaf["bias"]) if "bias" in leaf else None,
            # 0-d dtype marker: holder interception must hand back the
            # ORIGINAL kernel dtype or callers' promote_types(x, w)
            # would silently upgrade bf16 serving to fp32 GEMMs.
            "wdt": jnp.zeros((), kernel.dtype),
        }
        if act_scales and path in act_scales:
            table[path]["x_scale"] = jnp.asarray(
                act_scales[path], jnp.float32
            )
    return table


def discover_dense_paths(model: nn.Module, params, sample, **apply_kwargs):
    """Set of module paths the int8 interceptor can serve.

    Two kinds of quantizable weight reads exist:

    * ``nn.Dense.__call__`` — redirected to :func:`int8_dense`
      (int8×int8 MXU GEMM past the crossover, else dequant-into-dot).
    * ``_DenseParams.__call__`` — the param *holders* the fused Pallas
      kernels (and their surrounding packed GEMMs) read directly.
      These are served weight-only: the interceptor returns
      ``dequantize_weight(entry)`` so only the int8 copy is resident.

    Anything else (3-D einsum params, conv kernels, LN) is out of
    scope; ``quantize_dense_params(paths='all')`` would quantize such
    2-D kernels into a table nothing reads — keep discovery-gated.
    Evaluate on the SAME backend you serve on: which branch a module
    takes (Dense vs holder) is backend/impl-dependent.
    """
    seen = set()
    holder = _holder_type()

    def observer(next_fun, args, kwargs, context):
        if (
            type(context.module) in (nn.Dense, holder)
            and context.method_name == "__call__"
        ):
            seen.add(context.module.path)
        return next_fun(*args, **kwargs)

    # Interceptors fire during TRACING, so an abstract trace records
    # the same paths with zero device work — an eager apply would
    # dispatch every primitive over the remote tunnel at ~40 ms each
    # just to throw the outputs away.
    def traced(params_, sample_):
        with nn.intercept_methods(observer):
            return model.apply(params_, sample_, **apply_kwargs)

    jax.eval_shape(traced, params, sample)
    return seen


def dequantize_weight(entry, dtype=None):
    """Reconstruct the bf16/fp32 kernel view of a qtable entry.

    ``w_i8 [d_in, d_out] * scale [d_out]`` in fp32, cast back to the
    original kernel dtype (the ``wdt`` marker) so downstream
    ``promote_types`` sees exactly what the unquantized tree had.
    """
    w = entry["w"].astype(jnp.float32) * entry["scale"]
    dt = dtype or (
        entry["wdt"].dtype if "wdt" in entry else jnp.float32
    )
    return w.astype(dt)


def calibrate_activations(
    model: nn.Module,
    params,
    batches,
    paths=None,
    margin: float = 1.0,
    **apply_kwargs,
):
    """Collect static per-tensor activation scales for int8 serving.

    Runs ``model.apply(params, batch)`` for each batch with an
    observing interceptor and records the max-abs input seen by every
    ``nn.Dense`` (optionally restricted to ``paths``).  Returns
    ``{module_path: scalar fp32 scale}`` with
    ``scale = margin * max_abs / 127`` — merge into a quantization
    table via ``quantize_dense_params(..., act_scales=...)`` or set
    ``entry['x_scale']`` directly.

    Max-abs calibration is the conservative choice (no clipping of
    calibration data); pass ``margin < 1`` for percentile-style
    clipping if outlier tokens dominate the range.

    The whole per-batch observation is ONE jitted executable (the
    interceptor records traced amax values during tracing and they
    come back as the function's outputs): on the remote backend an
    eager apply would dispatch every primitive over HTTP at ~40 ms
    each.  Same-shaped batches reuse the compiled executable.

    Both ``nn.Dense`` inputs and holder APPLY-mode inputs
    (``_DenseParams(x)`` — routed to :func:`int8_dense` at serving
    time) are recorded; weight-mode holder reads have no activation
    to calibrate.
    """
    observed: Dict[Tuple[str, ...], float] = {}
    holder = _holder_type()
    key_order: list = []

    def observe_apply(params_, batch):
        pending: Dict[Tuple[str, ...], list] = {}

        def observer(next_fun, args, kwargs, context):
            mod = context.module
            is_dense = type(mod) is nn.Dense
            is_holder_apply = (
                type(mod) is holder
                and ((args and args[0] is not None)
                     or kwargs.get("x") is not None)
            )
            if (
                (is_dense or is_holder_apply)
                and context.method_name == "__call__"
            ):
                if paths is None or mod.path in paths:
                    x = args[0] if args else kwargs.get("x")
                    if x is None:  # nn.Dense spells it `inputs=`
                        x = kwargs["inputs"]
                    pending.setdefault(mod.path, []).append(
                        jnp.max(jnp.abs(x.astype(jnp.float32)))
                    )
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(observer):
            model.apply(params_, batch, **apply_kwargs)
        keys = sorted(pending)
        key_order[:] = keys  # read back right after each fresh trace
        if not keys:
            return jnp.zeros((0,), jnp.float32)
        return jnp.stack([jnp.max(jnp.stack(pending[k])) for k in keys])

    # jit caches by batch shape/dtype, and the observer only runs at
    # trace time — so the key list must be snapshotted per cache entry
    # (a cache HIT leaves `key_order` holding the keys of whatever
    # shape traced LAST, which may differ if shape-gated branches
    # observe different module sets).
    jitted = jax.jit(observe_apply)
    keys_by_shape: Dict[tuple, list] = {}
    for batch in batches:
        batch = jnp.asarray(batch)
        ck = (batch.shape, str(batch.dtype))
        stacked = jax.device_get(jitted(params, batch))
        keys = keys_by_shape.setdefault(ck, list(key_order))
        if len(keys) != stacked.shape[0]:  # pragma: no cover - guard
            raise RuntimeError(
                "calibration key/value mismatch: "
                f"{len(keys)} keys vs {stacked.shape[0]} values"
            )
        for k, amax in zip(keys, stacked):
            observed[k] = max(observed.get(k, 0.0), float(amax))
    return {
        k: jnp.float32(max(v, 1e-8) * margin / 127.0)
        for k, v in observed.items()
    }


def intercept_dense(qtable, out_dtype=None):
    """A flax method interceptor routing quantized Denses to int8_dense.

    Use via :func:`quantized_apply`, or directly:

        with nn.intercept_methods(intercept_dense(qtable)):
            logits = model.apply(params, x)
    """

    holder = _holder_type()

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__" or mod.path not in qtable:
            return next_fun(*args, **kwargs)
        entry = qtable[mod.path]
        if type(mod) is nn.Dense:
            x = args[0] if args else kwargs["inputs"]
            if out_dtype is not None:
                dt = out_dtype
            elif mod.dtype is not None:
                dt = mod.dtype
            else:
                # flax dtype=None rule: promote(inputs, kernel[, bias]).
                # The entry carries the ORIGINAL kernel dtype as 'wdt';
                # using x.dtype here would flip e.g. a bf16-in/fp32-param
                # Dense to bf16 out and change every downstream dtype.
                wdt = entry["wdt"].dtype if "wdt" in entry else jnp.float32
                parts = [x.dtype, wdt]
                if mod.use_bias and entry.get("bias") is not None:
                    parts.append(entry["bias"].dtype)
                dt = jnp.result_type(*parts)
            return int8_dense(
                x, entry["w"], entry["scale"], entry["bias"], dt,
                x_scale=entry.get("x_scale"),
            )
        if type(mod) is holder:
            x = args[0] if args else kwargs.get("x")
            if x is not None:
                # apply mode (`holder(x)`, an XLA GEMM outside any
                # Pallas kernel): run the full int8 MXU path — same as
                # the nn.Dense routing, which measured +46% on the
                # all-Dense flagship (results/r3_int8_serving.json)
                # vs +15.8% when these projections were served as
                # dequantized weight views (results/r3_serving_onchip
                # .json); the view costs a weight-materialization pass
                # per call that the int8 dot avoids.
                return int8_dense(
                    x, entry["w"], entry["scale"],
                    entry["bias"] if mod.use_bias else None,
                    out_dtype or x.dtype,  # holders have no mod.dtype
                    x_scale=entry.get("x_scale"),
                )
            # weight mode: hand the caller (a fused Pallas kernel or a
            # packed GEMM) a dequantized transient view; next_fun is
            # NOT called — the tree leaf may be a stripped placeholder,
            # and self.param on it would raise a shape error.
            w = dequantize_weight(entry)
            if not mod.use_bias:
                return w
            return w, entry["bias"]
        return next_fun(*args, **kwargs)

    return interceptor


def build_int8_serving_tables(
    model: nn.Module,
    variables,
    sample,
    calibration=None,
    margin: float = 1.0,
    **apply_kwargs,
):
    """The canonical int8 serving build, in one place.

    Discovery-gated paths (every interceptor-reachable nn.Dense AND
    holder read — deriving paths from calibration output instead would
    leave weight-mode holder reads unquantized), optional static
    activation calibration as an OVERLAY on those paths, quantize,
    strip.  Returns ``(qtable, stripped_variables)``.  Shared by
    :class:`~sfc_vit_tpu.serving.ServingEngine` and ``bench.py`` so the
    two builds cannot drift.
    """
    paths = discover_dense_paths(model, variables, sample, **apply_kwargs)
    act_scales = None
    if calibration is not None:
        act_scales = calibrate_activations(
            model, variables, calibration,
            paths=paths, margin=margin, **apply_kwargs,
        )
        if not act_scales:
            raise ValueError(
                "calibration observed no activation scales — the "
                "iterable was empty/already consumed, or no quantized "
                "read on this model carries an activation. Pass a "
                "non-empty list of sample batches, or calibration=None "
                "for dynamic quantization"
            )
    qtable = quantize_dense_params(
        variables, paths=paths, act_scales=act_scales
    )
    return qtable, strip_quantized_kernels(variables, qtable)


def quantized_apply(model: nn.Module, params, qtable, *args, **kwargs):
    """``model.apply(params, *args)`` with int8 Dense layers.

    Jittable: close over ``model`` and pass ``(params, qtable, inputs)``
    as arguments (the side-table is a pytree of int8/f32 arrays).
    Kernels present in ``qtable`` are never read from ``params`` --
    serving processes can swap those leaves for placeholders to halve
    resident weight memory (:func:`strip_quantized_kernels`).
    """
    with nn.intercept_methods(intercept_dense(qtable)):
        return model.apply(params, *args, **kwargs)


def strip_quantized_kernels(params, qtable):
    """Replace quantized kernels/biases in ``params`` with placeholders.

    The interceptor serves BOTH the weight and the bias from the
    qtable entry in every mode (Dense, holder apply, holder weight
    view), so neither leaf is ever read; shrinking them makes int8 the
    only resident copy (bf16 originals + int8 copies -> int8 only) and
    keeps ``weight_bytes`` accounting honest.  Returns a new tree.
    """
    tree = unfreeze(params)
    root = tree["params"] if "params" in tree else tree
    for path, entry in qtable.items():
        node = root
        for k in path:
            node = node[k]
        node["kernel"] = jnp.zeros((1,), jnp.bfloat16)
        if "bias" in node and entry.get("bias") is not None:
            node["bias"] = jnp.zeros((1,), jnp.bfloat16)
    return tree
