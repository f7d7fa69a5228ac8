from .api import export_stablehlo, load_exported, ExportedModel

__all__ = ["ExportedModel", "export_stablehlo", "load_exported"]
