"""Training-model layer (the reference's L4: src/models/ +
BasicSR/basicsr/models/)."""

from ..utils.registry import MODEL_REGISTRY
from .ood_model import OODFaceGANModel


def build_model(opt: dict):
    """Reference build_model (BasicSR/basicsr/models/__init__.py:19)."""
    return MODEL_REGISTRY.get(opt["model_type"])(opt)
