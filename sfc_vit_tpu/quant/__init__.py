"""Post-training int8 quantization for TPU serving (new capability;
the torch reference serves fp32/amp only, ``main.py:158-159``)."""

from .int8 import (
    build_int8_serving_tables,
    calibrate_activations,
    dequantize_weight,
    discover_dense_paths,
    dynamic_quantize,
    int8_dense,
    intercept_dense,
    quantize_dense_params,
    quantize_weight,
    quantized_apply,
    strip_quantized_kernels,
)

__all__ = [
    "build_int8_serving_tables",
    "calibrate_activations",
    "dequantize_weight",
    "discover_dense_paths",
    "dynamic_quantize",
    "int8_dense",
    "intercept_dense",
    "quantize_dense_params",
    "quantize_weight",
    "quantized_apply",
    "strip_quantized_kernels",
]
