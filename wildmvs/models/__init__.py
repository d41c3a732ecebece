from .api import MODEL_REGISTRY, build_model, register_model  # noqa: F401
from . import mvsnet  # noqa: F401  (registers "mvsnet")

__all__ = ["MODEL_REGISTRY", "build_model", "register_model"]
