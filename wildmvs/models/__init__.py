from .api import MODEL_REGISTRY, build_model, register_model  # noqa: F401
from . import mvsnet  # noqa: F401  (registers "mvsnet")
from . import vis_mvsnet  # noqa: F401  (registers "vis_mvsnet")
from . import cvp_mvsnet  # noqa: F401  (registers "cvp_mvsnet")

__all__ = ["MODEL_REGISTRY", "build_model", "register_model"]
