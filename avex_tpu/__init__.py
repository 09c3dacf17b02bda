"""avex-tpu: TPU-native bioacoustics representation-learning framework.

A ground-up JAX/XLA/Pallas re-design with the capability surface of the
reference avex library: model registry + ``load_model``, layer-wise embedding
extraction, probes, training, and benchmark evaluation. The public API mirrors
``avex/__init__.py:11-51`` so reference users can switch with an import swap.
"""

from avex_tpu.models.factory import build_model, build_model_from_spec
from avex_tpu.models.load import load_label_mapping, load_model
from avex_tpu.models.registry import (
    describe_model,
    get_checkpoint_path,
    get_model_class,
    get_model_spec,
    list_model_classes,
    list_model_layers,
    list_models,
    register_model,
    register_model_class,
)

__version__ = "0.1.0"

__all__ = [
    # Model loading
    "load_model",
    # Registry management
    "register_model",
    "get_model_spec",
    "list_models",
    "describe_model",
    "list_model_layers",
    # Model class management
    "register_model_class",
    "get_model_class",
    "list_model_classes",
    # Model factory
    "build_model",
    "build_model_from_spec",
    # Checkpoint management
    "get_checkpoint_path",
    # Label mapping management
    "load_label_mapping",
]
