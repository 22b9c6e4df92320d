"""Model DAG: registry, compilation, selection, materialization."""

from .registry import Model, ModelRegistry, CompilationError, CycleError, RefNotFoundError
from .materialize import Materialization

__all__ = [
    "Model",
    "ModelRegistry",
    "Materialization",
    "CompilationError",
    "CycleError",
    "RefNotFoundError",
]
