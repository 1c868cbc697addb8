"""Production serving: ahead-of-time-compiled fixed-shape inference.

The reference ships no serving path (its product is the training script,
``/root/reference/main.py:269-324``); this module is the TPU-native
deployment story for the same models:

* **Compile once, serve forever.**  Every batch shape is lowered and
  compiled ahead of time (``jax.jit(...).lower(...).compile()``) at
  engine build; requests run pre-built executables with zero tracing or
  compile-cache lookups on the hot path.  On the remote-XLA backend a
  ViT-B compile is minutes (CLAUDE.md), so serving processes must never
  trace at request time.
* **Fixed shapes.**  Ragged request batches are padded up to the
  smallest compiled batch size (XLA executables are shape-specialized;
  padding is the TPU-native answer to dynamic batch sizes).
* **int8-resident weights** (``weights='int8'``): Dense kernels are
  discovered on the live backend (:func:`~sfc_vit_tpu.quant.int8.
  discover_dense_paths` — fused-kernel params are backend-dependent and
  must not be stripped), quantized per-channel, and the bf16 originals
  replaced with placeholders.  Measured on-chip: **0.52× weight memory
  AND +46% img/s** on the memory-bound flagship config
  (``results/r3_int8_serving.json``, RESULTS.md round 3).
* **Process-separated deployment** via :func:`jax.export`: the compiled
  computation serializes to bytes (StableHLO), so a build farm can
  compile and version executables while servers just deserialize and
  call.  Weights travel separately through the Orbax checkpoints the
  training stack already writes (``training/checkpoint.py``).

Params are always passed as executable *arguments*, never baked as
constants — constants ship inside the HLO on every compile RPC (HTTP
413 at ViT-B size, CLAUDE.md) and defeat weight hot-swap.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _as_variables(params) -> dict:
    """Normalize to a flax variables dict ``{'params': ...}``."""
    if isinstance(params, dict) and "params" in params:
        return dict(params)
    return {"params": params}


def _cast_floats(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def _tree_nbytes(tree) -> int:
    return int(sum(
        a.size * a.dtype.itemsize
        for a in jax.tree_util.tree_leaves(tree)
        if hasattr(a, "dtype")
    ))


def _sds(tree):
    def one(a):
        sh = a.sharding if isinstance(a, jax.Array) else None
        return jax.ShapeDtypeStruct(
            jnp.shape(a), jnp.asarray(a).dtype, sharding=sh
        )

    return jax.tree_util.tree_map(one, tree)


class ServingEngine:
    """AOT-compiled inference over a fixed set of batch sizes.

    Args:
      model: any model in this framework (``SimpleViT``, ``CurveViT``,
        ``VisionTransformer1D``, ...) whose ``__call__`` takes
        ``(images, deterministic=...)``.
      params: flax params (``{'params': ...}`` or the inner tree), e.g.
        restored from an Orbax checkpoint.
      image_shape: per-image ``(H, W, C)``.
      batch_sizes: batch shapes to compile.  Each costs one XLA compile
        at build; requests pad to the smallest covering size.
      dtype: cast floating params (and inputs) to this dtype; default
        keeps them as passed (use ``jnp.bfloat16`` on TPU).
      weights: ``'native'`` serves the params as-is; ``'int8'`` builds a
        per-channel int8 side-table for every ``nn.Dense`` the serving
        path actually reads and strips the originals.
      calibration: optional iterable of sample image batches (only with
        ``weights='int8'``).  Runs :func:`~sfc_vit_tpu.quant.int8.
        calibrate_activations` at build and bakes STATIC per-tensor
        activation scales into the side-table: the quantize becomes a
        pure elementwise op XLA fuses into the producer's epilogue, so
        activations stream to the GEMMs as int8 (half the HBM traffic)
        instead of paying a dynamic per-token max-abs pass.  Without it
        activations quantize dynamically (zero-setup default).
      data_parallel: shard every batch over this many chips (params
        replicated, inputs split on the leading axis — each chip runs
        its slice with no collectives).  Batch sizes must be divisible
        by it.
      compile_cache: optional directory for the persistent XLA
        compilation cache (:func:`~sfc_vit_tpu.utils.compile_cache.
        enable_compile_cache`): engine restarts with the same model /
        batch sizes skip the cold AOT compile — the dominant cost of
        a serving-process restart on the remote backend.
      apply_kwargs: extra kwargs for ``model.apply`` (merged over
        ``deterministic=True``).
    """

    def __init__(
        self,
        model,
        params,
        image_shape: Tuple[int, int, int],
        batch_sizes: Sequence[int] = (256,),
        dtype: Optional[jnp.dtype] = None,
        weights: str = "native",
        calibration=None,
        data_parallel: int = 1,
        compile_cache=None,
        **apply_kwargs,
    ):
        if not batch_sizes:
            raise ValueError("need at least one batch size to compile")
        if compile_cache is not None:
            from .utils import enable_compile_cache

            enable_compile_cache(compile_cache)
        if weights not in ("native", "int8"):
            raise ValueError(f"weights={weights!r}: 'native' or 'int8'")
        self.model = model
        self.image_shape = tuple(image_shape)
        self.batch_sizes = tuple(sorted(set(int(b) for b in batch_sizes)))
        self.dtype = dtype
        self._kw = {"deterministic": True, **apply_kwargs}
        if data_parallel > 1:
            bad = [b for b in self.batch_sizes if b % data_parallel]
            if bad:
                raise ValueError(
                    f"batch sizes {bad} not divisible by "
                    f"data_parallel={data_parallel}"
                )
            from .parallel.mesh import (
                batch_sharding, make_mesh, replicated,
            )

            self.mesh = make_mesh(
                data=data_parallel,
                devices=jax.devices()[:data_parallel],
            )
            self._x_sharding = batch_sharding(self.mesh)
            self._param_sharding = replicated(self.mesh)
        else:
            self.mesh = None
            self._x_sharding = None
            self._param_sharding = None

        variables = _as_variables(params)
        if dtype is not None:
            variables = _cast_floats(variables, dtype)

        if weights == "int8":
            from .quant.int8 import build_int8_serving_tables

            sample = jnp.zeros(
                (1, *self.image_shape), dtype or jnp.float32
            )
            self._qtable, variables = build_int8_serving_tables(
                model, variables, sample,
                calibration=(
                    None if calibration is None else
                    (jnp.asarray(b, dtype or jnp.float32)
                     for b in calibration)
                ),
                **self._kw,
            )
            variables = _as_variables(variables)
        else:
            self._qtable = {}
            if calibration is not None:
                raise ValueError(
                    "calibration= only applies with weights='int8'"
                )

        if self._param_sharding is not None:
            self.variables = jax.device_put(
                variables, self._param_sharding
            )
            self._qtable = jax.device_put(
                self._qtable, self._param_sharding
            )
        else:
            self.variables = jax.device_put(variables)
            self._qtable = jax.device_put(self._qtable)

        model_ref = model
        kw = self._kw

        def forward(vars_, qtable, x):
            if qtable:
                from .quant.int8 import quantized_apply

                return quantized_apply(model_ref, vars_, qtable, x, **kw)
            return model_ref.apply(vars_, x, **kw)

        self._forward = forward
        self._jitted = jax.jit(forward)
        self._compiled: Dict[int, jax.stages.Compiled] = {}
        self.compile()

    # -- build ---------------------------------------------------------

    def _input_sds(self, bs: int):
        return jax.ShapeDtypeStruct(
            (bs, *self.image_shape), self.dtype or jnp.float32,
            sharding=self._x_sharding,
        )

    def compile(self) -> None:
        """AOT-compile one executable per batch size (idempotent)."""
        for bs in self.batch_sizes:
            if bs not in self._compiled:
                self._compiled[bs] = self._jitted.lower(
                    _sds(self.variables), _sds(self._qtable),
                    self._input_sds(bs),
                ).compile()

    def weight_bytes(self) -> int:
        """Resident weight memory: params tree + int8 side-table."""
        return _tree_nbytes(self.variables) + _tree_nbytes(self._qtable)

    # -- serve ---------------------------------------------------------

    def _covering_bs(self, n: int) -> int:
        for bs in self.batch_sizes:
            if bs >= n:
                return bs
        return self.batch_sizes[-1]

    def _run(self, xs: jnp.ndarray) -> jnp.ndarray:
        if self._x_sharding is not None:
            xs = jax.device_put(xs, self._x_sharding)
        return self._compiled[xs.shape[0]](
            self.variables, self._qtable, xs
        )

    def predict(self, images) -> np.ndarray:
        """Logits for ``images`` ``[N, H, W, C]`` (any N ≥ 0).

        Full chunks run at the largest compiled batch size; the ragged
        tail pads to the smallest covering compiled size and the pad
        rows are dropped from the output.  The request stays HOST-side
        and ships one compiled-size chunk at a time: a request larger
        than HBM (or than the tunnel wants in one upload) must never be
        materialized on-device whole.
        """
        x = np.asarray(images, self.dtype or jnp.float32)
        if x.ndim == len(self.image_shape):  # single image
            x = x[None]
        if x.shape[1:] != self.image_shape:
            raise ValueError(
                f"expected images of shape {self.image_shape}, got "
                f"{x.shape[1:]}"
            )
        n = x.shape[0]
        if n == 0:
            big = self.batch_sizes[-1]
            info = jax.tree_util.tree_leaves(
                self._compiled[big].out_info
            )[0]
            return np.zeros((0, *info.shape[1:]), info.dtype)
        big = self.batch_sizes[-1]
        outs = []
        i = 0
        while n - i >= big:
            outs.append(self._run(x[i:i + big]))
            i += big
        if i < n:
            rem = n - i
            bs = self._covering_bs(rem)
            tail = np.zeros((bs, *self.image_shape), x.dtype)
            tail[:rem] = x[i:]
            outs.append(self._run(tail)[:rem])
        return np.concatenate([np.asarray(o) for o in outs], axis=0)

    def predict_classes(self, images) -> np.ndarray:
        return np.argmax(self.predict(images), axis=-1)

    # -- export --------------------------------------------------------

    def export_serialized(self) -> Dict[int, bytes]:
        """StableHLO bytes per batch size (``jax.export``).

        Servers rebuild the callable with :func:`deserialize_forward`
        and feed it the checkpointed params — the serialized artifact
        contains the *computation* only (no weights baked in).

        The int8 qtable is keyed by module-path TUPLES, which
        ``jax.export`` cannot serialize (string dict keys only) — the
        exported signature takes the qtable with ``"/"``-joined string
        keys instead; :func:`mangle_qtable` converts.
        """
        from jax import export as jexport

        if self.mesh is not None:
            raise ValueError(
                "export_serialized() of a data_parallel engine would "
                "bake this host's device mesh into the artifact (the "
                "server would need an identical topology). Export a "
                "single-device engine and shard on the serving host "
                "instead (ServingEngine(..., data_parallel=N) there)."
            )

        fwd = self._forward

        def forward_strkeys(vars_, qtable_str, x):
            return fwd(vars_, unmangle_qtable(qtable_str), x)

        blobs = {}
        for bs in self.batch_sizes:
            exp = jexport.export(jax.jit(forward_strkeys))(
                _sds(self.variables), _sds(mangle_qtable(self._qtable)),
                self._input_sds(bs),
            )
            blobs[bs] = exp.serialize()
        return blobs


def mangle_qtable(qtable):
    """Module-path tuple keys -> "/"-joined strings (export-safe)."""
    return {"/".join(k): v for k, v in qtable.items()}


def unmangle_qtable(qtable_str):
    """Inverse of :func:`mangle_qtable`."""
    return {tuple(k.split("/")): v for k, v in qtable_str.items()}


def deserialize_forward(blob: bytes):
    """Rebuild a serving callable ``f(variables, qtable, images)`` from
    :meth:`ServingEngine.export_serialized` output.

    ``qtable`` may be tuple-keyed (an engine's ``_qtable``) or already
    string-keyed; keys are mangled to the exported signature."""
    from jax import export as jexport

    exp = jexport.deserialize(blob)

    def call(variables, qtable, images):
        if qtable and not all(isinstance(k, str) for k in qtable):
            qtable = mangle_qtable(qtable)
        return exp.call(variables, qtable, images)

    return call
