"""Base handle for all avex-tpu models.

TPU-native counterpart of ``avex/models/base_model.py``. The reference relies
on torch forward hooks (a mutation side-channel); here intermediate capture is
**functional**: every linen model returns ``(output, aux)`` where
``aux["intermediates"]`` maps layer names to activations. ``ModelBase`` pairs
the linen module with its variables and re-creates the reference API surface —
layer discovery/indexing (``register_hooks_for_layers`` with int / ``all`` /
``last_layer`` selectors, base_model.py:101-200), ``extract_embeddings`` with
mean/max/cls aggregation and multi-layer concat (base_model.py:342-457),
``process_audio`` and ``batch_inference`` — on top of jit-compiled apply
functions that are cached per (layer-set, aggregation) signature.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.configs import AudioConfig
from avex_tpu.ops.frontend import AudioProcessor

logger = logging.getLogger(__name__)


class ModelBase:
    """Pairs a linen module with its variables behind the reference model API.

    Subclasses set ``self.module`` (a linen module whose ``__call__`` returns
    ``(output, aux)``) and ``self.variables``, and implement
    ``_discover_embedding_layers`` returning the architecture's embedding
    allow-list (≈ per-model ``_discover_embedding_layers`` overrides in the
    reference model zoo).
    """

    def __init__(
        self,
        device: str = "tpu",
        audio_config: Optional[Union[AudioConfig, Dict[str, Any]]] = None,
    ) -> None:
        if isinstance(audio_config, dict):
            audio_config = AudioConfig(**audio_config)
        self.device = device
        self.audio_config = audio_config
        self.audio_processor = AudioProcessor(audio_config) if audio_config is not None else None
        self.module = None
        self.variables: Optional[Dict[str, Any]] = None
        self.label_mapping: Optional[Dict[str, Any]] = None
        self.num_classes: Optional[int] = None
        self._layer_names: List[str] = []
        self._hook_layers: List[str] = []
        self._jit_cache: Dict[Any, Any] = {}
        self._training = False

    # ------------------------------------------------------------------
    # Layer discovery / selection (base_model.py:39-253)
    # ------------------------------------------------------------------

    def _discover_embedding_layers(self) -> None:
        raise NotImplementedError

    def get_model_layers(self) -> List[str]:
        """All discoverable embedding layer names, in forward order."""
        self._discover_embedding_layers()
        return list(self._layer_names)

    def get_model_layer_map(self) -> Dict[int, str]:
        """Index → layer-name mapping for int-based selection."""
        return dict(enumerate(self.get_model_layers()))

    def _get_last_non_classification_layer(self) -> Optional[str]:
        if not self._layer_names:
            return None
        for name in reversed(self._layer_names):
            if any(tag in name.lower() for tag in ("classifier", "head")):
                continue
            return name
        return self._layer_names[-1]

    def register_hooks_for_layers(self, target_layers: List[Union[str, int]]) -> List[str]:
        """Resolve layer selectors and record them as the active capture set.

        Selector semantics match base_model.py:101-200: 0-based (negative OK)
        indices into :meth:`get_model_layers`, the literals ``all`` (every
        discoverable layer) and ``last_layer`` (last non-classification layer),
        order-preserving dedup. No runtime hooks exist in the functional
        design — this just selects which intermediates later calls read.
        """
        self._discover_embedding_layers()
        resolved: List[str] = []
        for layer in target_layers:
            if isinstance(layer, bool):
                raise TypeError("target_layers entries must be str or int (bool is not allowed).")
            if isinstance(layer, int):
                try:
                    resolved.append(self._layer_names[layer])
                except IndexError as err:
                    n = len(self._layer_names)
                    raise ValueError(
                        f"Layer index {layer} is out of range for {n} layers"
                    ) from err
            else:
                resolved.append(layer)

        if "all" in resolved:
            resolved = [name for name in resolved if name != "all"] + list(self._layer_names)
        if "last_layer" in resolved:
            last = self._get_last_non_classification_layer()
            if not last:
                raise ValueError("No layers available for 'last_layer'")
            resolved = [last if name == "last_layer" else name for name in resolved]

        seen: set = set()
        unique = [n for n in resolved if not (n in seen or seen.add(n))]
        for name in unique:
            if name not in self._layer_names:
                raise ValueError(
                    f"Layer '{name}' not found in model. Available: {self._layer_names}"
                )
        self._hook_layers = unique
        return unique

    def ensure_hooks_registered(self) -> None:
        """API-parity no-op: functional capture cannot be lost (cf. base_model.py:202)."""

    def deregister_all_hooks(self) -> None:
        """Clear the active capture-layer selection."""
        self._hook_layers = []

    # ------------------------------------------------------------------
    # Forward / audio processing
    # ------------------------------------------------------------------

    def _apply_kwargs(self) -> Dict[str, Any]:
        """Extra kwargs for module.apply; subclasses may override."""
        return {}

    def _jit(self, key: Any, fn):
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def _init_variables(self, *dummy_args, seed: int = 0):
        """Jit-compiled module.init — eager init dispatches thousands of
        individual ops, which is pathological over a remote-TPU transport."""
        return jax.jit(self.module.init)(jax.random.PRNGKey(seed), *dummy_args)

    def process_audio(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply the configured audio frontend (≈ base_model.py:278-299)."""
        if self.audio_processor is None:
            return x
        return self.audio_processor(jnp.asarray(x))

    def forward(
        self, x: jnp.ndarray, padding_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Primary model output (logits or features)."""

        def fwd(variables, x, padding_mask):
            out, _ = self.module.apply(variables, x, padding_mask, **self._apply_kwargs())
            return out

        has_mask = padding_mask is not None
        fn = self._jit(("forward", has_mask), fwd)
        return fn(self.variables, jnp.asarray(x), padding_mask)

    def __call__(self, x, padding_mask=None):
        return self.forward(x, padding_mask)

    def batch_inference(self, batched_samples: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """Run :meth:`forward` over pre-batched chunks and concatenate
        (≈ base_model.py:316-340)."""
        outs = []
        for batch in batched_samples:
            out = self.forward(self.process_audio(jnp.asarray(batch)))
            if out.ndim == 1:
                out = out[None]
            outs.append(np.asarray(out))
        return jnp.asarray(np.concatenate(outs, axis=0))

    # ------------------------------------------------------------------
    # Embedding extraction (base_model.py:342-457)
    # ------------------------------------------------------------------

    @staticmethod
    def _aggregate(emb: jnp.ndarray, aggregation: str) -> jnp.ndarray:
        if emb.ndim == 2:
            return emb
        if emb.ndim == 3:
            if aggregation == "mean":
                return emb.mean(axis=1)
            if aggregation == "max":
                return emb.max(axis=1)
            if aggregation == "cls_token":
                return emb[:, 0, :]
            raise ValueError(f"Unsupported aggregation method: {aggregation}")
        raise ValueError(f"Unexpected embedding dimension: {emb.ndim}. Expected 2 or 3.")

    def extract_fn(self, layers: Tuple[str, ...], aggregation: str):
        """Pure (variables, x, padding_mask) → embeddings extraction function.

        Encodes the reference's output contract (base_model.py:426-453):
        ``aggregation == "none"`` yields per-layer activations (single array
        or tuple); otherwise layers are pooled and concatenated into one
        feature vector. Usable directly inside jitted train steps.
        """

        def extract(variables, x, padding_mask):
            _, aux = self.module.apply(variables, x, padding_mask, **self._apply_kwargs())
            return self._select_intermediates(aux["intermediates"], layers, aggregation)

        return extract

    @classmethod
    def _select_intermediates(
        cls, inter: Dict[str, jnp.ndarray], layers: Tuple[str, ...], aggregation: str
    ):
        """Pick requested layers from an intermediates dict and pool/concat
        them per the output contract (base_model.py:426-453)."""
        missing = [name for name in layers if name not in inter]
        if missing:
            raise ValueError(
                f"Some requested layers did not produce outputs: {missing}. "
                f"Available: {list(inter.keys())}"
            )
        embs = [inter[name] for name in layers]
        if aggregation == "none":
            return embs[0] if len(embs) == 1 else tuple(embs)
        embs = [cls._aggregate(e, aggregation) for e in embs]
        return embs[0] if len(embs) == 1 else jnp.concatenate(embs, axis=1)

    def extract_embeddings(
        self,
        x: Union[jnp.ndarray, Dict[str, jnp.ndarray]],
        *,
        padding_mask: Optional[jnp.ndarray] = None,
        aggregation: str = "none",
        freeze_backbone: bool = True,
    ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        """Capture the selected layers' activations in one compiled forward.

        Returns a single array when one layer is selected (or aggregation is
        active → layers are pooled then concatenated on the feature axis);
        a list of per-layer arrays for multi-layer ``aggregation="none"``.
        ``freeze_backbone`` is accepted for API parity; gradient flow is decided
        by the surrounding jax transform, not here.
        """
        if not self._hook_layers:
            raise ValueError("No hooks registered. Call register_hooks_for_layers() first.")
        if isinstance(x, dict):
            padding_mask = x.get("padding_mask", padding_mask)
            x = x["raw_wav"]
        layers = tuple(self._hook_layers)
        has_mask = padding_mask is not None
        fn = self._jit(
            ("extract", layers, aggregation, has_mask), self.extract_fn(layers, aggregation)
        )
        out = fn(self.variables, jnp.asarray(x), padding_mask)
        return list(out) if isinstance(out, tuple) else out

    def embedding_shapes(
        self, input_shape: Tuple[int, ...], aggregation: str = "none"
    ) -> List[Tuple[int, ...]]:
        """Per-selected-layer embedding shapes, via ``jax.eval_shape`` (free).

        Replaces the reference's dummy-forward shape inference
        (base_probes.py:121-157) — no FLOPs, no RNG, exact shapes.
        """
        if not self._hook_layers:
            raise ValueError("No hooks registered. Call register_hooks_for_layers() first.")
        layers = tuple(self._hook_layers)
        extract = self.extract_fn(layers, aggregation)

        def shapes_fn(variables, x):
            out = extract(variables, x, None)
            return out if isinstance(out, tuple) else (out,)

        out = jax.eval_shape(
            shapes_fn, self.variables, jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32)
        )
        return [tuple(s.shape) for s in out]

    # ------------------------------------------------------------------
    # torch-API compat shims
    # ------------------------------------------------------------------

    def to(self, device: str) -> "ModelBase":
        """Placement is controlled by the jax mesh; kept for API parity."""
        self.device = device
        return self

    def eval(self) -> "ModelBase":
        """torch-API shim: switch to inference mode."""
        self._training = False
        return self

    def train(self, mode: bool = True) -> "ModelBase":
        """torch-API shim: toggle training mode flag."""
        self._training = mode
        return self

    def enable_gradient_checkpointing(self) -> None:
        """Rebuild with per-layer rematerialization; see model subclasses."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support gradient checkpointing."
        )

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False) -> None:
        """Install converted reference-checkpoint weights; see subclasses."""
        raise NotImplementedError

    def quantize(self, mode: str = "int8") -> None:
        """Convert to a quantized inference mode (see ``avex_tpu.quant``).

        Supported by the transformer-encoder architectures; one-way and
        inference-only.
        """
        raise NotImplementedError(
            f"{type(self).__name__} does not support quantization."
        )

    @property
    def params(self):
        """The trainable parameter subtree of ``variables``."""
        return self.variables["params"] if self.variables else None
