"""avex-tpu: TPU-native bioacoustics representation-learning framework.

A ground-up JAX/XLA/Pallas re-design with the capability surface of the
reference avex library (model registry + load_model, layer-wise embedding
extraction, probes, training, benchmark evaluation). Public API mirrors
``avex/__init__.py:11-51``.
"""

__version__ = "0.1.0"
