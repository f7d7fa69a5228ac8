from .api import export_stablehlo, load_exported, ExportedModel
from .quantization import (
    calibrate_activations,
    dequantize_variables,
    quantization_error,
    quantize_variables,
)

__all__ = [
    "ExportedModel",
    "calibrate_activations",
    "dequantize_variables",
    "export_stablehlo",
    "load_exported",
    "quantization_error",
    "quantize_variables",
]
