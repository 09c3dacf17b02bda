"""Probe base: shape planning, layer projectors, learned layer weights.

TPU-native counterpart of ``avex/models/probes/base_probes.py``. The torch
version sizes its head by pushing a random clip through the backbone
(``_setup_projections_and_infer_dim``, base_probes.py:121-157); here the same
inference costs zero FLOPs via ``jax.eval_shape``. Multi-layer handling
mirrors the reference exactly:

- per-layer linear projectors to a common dim (majority-vote, else max —
  base_probes.py:254-289/:332-368), identity when dims already agree;
- learned softmax ``layer_weights`` combination when >1 layer
  (base_probes.py:150, ``_sum`` :197-206);
- 2D probes flatten everything to ``(B, F)``; 3D probes normalize to
  ``(B, T, F)`` including the 4D ``(b,c,h,w) → (b,w,h*c)`` transpose and
  linear-interpolation alignment of differing sequence lengths
  (base_probes.py:370-411).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.probes.heads import (
    AttentionHead,
    LinearHead,
    LSTMHead,
    MLPHead,
    MoEHead,
    TransformerHead,
)

HEAD_CLASSES = {
    "linear": LinearHead,
    "mlp": MLPHead,
    "lstm": LSTMHead,
    "attention": AttentionHead,
    "transformer": TransformerHead,
    "moe": MoEHead,  # avex-tpu extension: expert-parallel routed MLP
}

#: heads operating on pooled (B, F) inputs vs sequence (B, T, F) inputs.
HEAD_DIMENSIONALITY = {
    "linear": 2,
    "mlp": 2,
    "lstm": 3,
    "attention": 3,
    "transformer": 3,
    "moe": 2,
}


def _majority_or_max(values: Sequence[int]) -> int:
    from collections import Counter

    most, count = Counter(values).most_common(1)[0]
    return most if count > len(values) / 2 else max(values)


@dataclasses.dataclass(frozen=True)
class ProbePlan:
    """Static description of how embeddings feed the head (hashable for jit)."""

    expected_dim: int  # 2 or 3
    input_shapes: Tuple[Tuple[int, ...], ...]  # per-layer shapes, no batch dim
    target_feat: int
    needs_projector: Tuple[bool, ...]
    target_seq: Optional[int] = None  # 3D only: min seq, interp target

    @property
    def num_layers(self) -> int:
        """Number of embedding layers feeding the probe."""
        return len(self.input_shapes)


def make_probe_plan(expected_dim: int, shapes: Sequence[Tuple[int, ...]]) -> ProbePlan:
    """Derive projector/combination plan from per-layer embedding shapes."""
    shapes = tuple(tuple(int(d) for d in s) for s in shapes)
    if expected_dim == 2:
        flat = [int(np.prod(s)) for s in shapes]
        target = _majority_or_max(flat)
        needs = tuple(d != target for d in flat)
        return ProbePlan(2, shapes, target, needs)

    info: List[Tuple[int, int]] = []  # (seq, feat) after normalization
    for s in shapes:
        if len(s) == 2:  # (T, F)
            info.append((s[0], s[1]))
        elif len(s) == 3:  # (C, H, W) -> seq W, feat H*C
            info.append((s[2], s[0] * s[1]))
        elif len(s) == 1:  # (F,) -> seq F, feat 1
            info.append((s[0], 1))
        else:
            raise ValueError(f"Unsupported embedding shape {s} for 3D probe")
    target_feat = _majority_or_max([f for _, f in info])
    target_seq_vote = _majority_or_max([t for t, _ in info])
    needs = tuple(f != target_feat or t != target_seq_vote for t, f in info)
    min_seq = min(t for t, _ in info)
    return ProbePlan(3, shapes, target_feat, needs, target_seq=min_seq)


def _format_to_seq_feat(emb: jnp.ndarray) -> jnp.ndarray:
    """Normalize any embedding to (B, T, F) (base_probes.py:370-378)."""
    if emb.ndim == 3:
        return emb
    if emb.ndim == 4:
        b, c, h, w = emb.shape
        return jnp.transpose(emb, (0, 3, 2, 1)).reshape(b, w, h * c)
    if emb.ndim == 2:
        return emb[:, :, None]
    raise ValueError(f"Unsupported embedding rank {emb.ndim} for 3D probe")


class ProbeNet(nn.Module):
    """Projectors + layer combination + head as one linen module.

    Inputs are the ordered tuple of captured embeddings (batch-leading). The
    whole probe — projection, interpolation alignment, softmax layer mixing,
    head — is one jit-able function.
    """

    plan: ProbePlan
    probe_type: str
    num_classes: int
    head_kwargs: Tuple[Tuple[str, Any], ...] = ()

    @nn.compact
    def __call__(
        self,
        embeddings: Union[jnp.ndarray, Sequence[jnp.ndarray]],
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        plan = self.plan
        if isinstance(embeddings, (jnp.ndarray, np.ndarray)):
            embeddings = [embeddings]
        embeddings = list(embeddings)
        if len(embeddings) != plan.num_layers:
            raise ValueError(
                f"Probe built for {plan.num_layers} layers, got {len(embeddings)}"
            )

        processed: List[jnp.ndarray] = []
        for i, emb in enumerate(embeddings):
            if plan.expected_dim == 2:
                flat = emb.reshape(emb.shape[0], -1)
                if plan.needs_projector[i]:
                    flat = nn.Dense(plan.target_feat, name=f"projector_{i}")(flat)
                processed.append(flat)
            else:
                seq = _format_to_seq_feat(emb)
                if plan.needs_projector[i]:
                    seq = nn.Dense(plan.target_feat, name=f"projector_{i}")(seq)
                processed.append(seq)

        if plan.expected_dim == 3 and len({p.shape[1] for p in processed}) > 1:
            # Align differing sequence lengths by linear interpolation to the
            # shortest (base_probes.py:397-411). jax.image linear resize uses
            # half-pixel sampling, matching F.interpolate(align_corners=False).
            target = min(p.shape[1] for p in processed)
            processed = [
                p
                if p.shape[1] == target
                else jax.image.resize(p, (p.shape[0], target, p.shape[2]), method="linear")
                for p in processed
            ]

        if len(processed) > 1:
            layer_weights = self.param(
                "layer_weights", nn.initializers.zeros, (len(processed),)
            )
            weights = jax.nn.softmax(layer_weights)
            combined = sum(w * p for w, p in zip(weights, processed))
        else:
            combined = processed[0]

        head_cls = HEAD_CLASSES[self.probe_type]
        head = head_cls(num_classes=self.num_classes, **dict(self.head_kwargs), name="head")
        if plan.expected_dim == 3:
            return head(combined, padding_mask=padding_mask, deterministic=deterministic)
        return head(combined, deterministic=deterministic)


class Probe:
    """Python-side probe handle: online (backbone-attached) or offline.

    API mirrors the reference probes' forward contract
    (``probe(x, padding_mask) -> logits``): in online mode ``x`` is raw audio
    and embeddings come from ``base_model.extract_embeddings``; in offline
    (feature) mode ``x`` already is the cached embedding (or list thereof).
    """

    def __init__(
        self,
        probe_type: str,
        num_classes: int,
        base_model=None,
        layers: Optional[List[Union[str, int]]] = None,
        feature_mode: bool = False,
        input_dim: Optional[Union[int, Tuple[int, ...], List[Tuple[int, ...]]]] = None,
        aggregation: str = "mean",
        target_length: Optional[int] = None,
        freeze_backbone: bool = True,
        seed: int = 0,
        **head_kwargs: Any,
    ) -> None:
        if probe_type not in HEAD_CLASSES:
            raise ValueError(f"Unknown probe type {probe_type!r}; known: {sorted(HEAD_CLASSES)}")
        self.probe_type = probe_type
        self.num_classes = num_classes
        self.base_model = base_model
        self.feature_mode = feature_mode
        self.aggregation = aggregation
        self.freeze_backbone = freeze_backbone
        self.target_length = target_length
        self.layers = layers or ["last_layer"]
        expected = HEAD_DIMENSIONALITY[probe_type]

        shapes = self._infer_embedding_shapes(expected, input_dim)
        self.plan = make_probe_plan(expected, shapes)
        self.module = ProbeNet(
            plan=self.plan,
            probe_type=probe_type,
            num_classes=num_classes,
            head_kwargs=tuple(sorted(head_kwargs.items())),
        )
        dummy = [jnp.zeros((1,) + s, jnp.float32) for s in self.plan.input_shapes]
        self.variables = jax.jit(self.module.init)(jax.random.PRNGKey(seed), dummy)
        self._jit_cache: Dict[Any, Any] = {}

    # -- shape inference ------------------------------------------------

    def _infer_target_length(self) -> int:
        if self.target_length is not None:
            return int(self.target_length)
        ac = getattr(self.base_model, "audio_config", None)
        if ac is not None and ac.target_length_seconds is not None:
            return int(ac.target_length_seconds * ac.sample_rate)
        # Reasonable default: 1 second at 16 kHz, like the reference's dummy.
        return 16000

    def _infer_embedding_shapes(self, expected: int, input_dim) -> List[Tuple[int, ...]]:
        if self.feature_mode and input_dim is not None:
            if isinstance(input_dim, int):
                # int input_dim: (F,) for 2D heads, (1, F) for 3D heads
                # (base_probes.py:93-105).
                return [(input_dim,)] if expected == 2 else [(1, input_dim)]
            if isinstance(input_dim, tuple):
                return [tuple(input_dim)]
            return [tuple(s) for s in input_dim]
        if self.base_model is None:
            raise ValueError("input_dim must be provided when feature_mode=True and base_model is None")

        self.base_model.register_hooks_for_layers(self.layers)
        length = self._infer_target_length()
        shapes = self.base_model.embedding_shapes((1, length), aggregation=self.aggregation)
        return [tuple(s[1:]) for s in shapes]

    # -- forward --------------------------------------------------------

    def _get_embeddings(self, x, padding_mask):
        if self.feature_mode:
            if isinstance(x, dict):
                if "raw_wav" in x:
                    return x["raw_wav"]
                keys = [k for k in x if k not in ("label", "padding_mask", "text_label")]
                return x[keys[0]] if len(keys) == 1 else [x[k] for k in keys]
            return x
        if isinstance(x, dict):
            padding_mask = x.get("padding_mask", padding_mask)
            x = x["raw_wav"]
        embs = self.base_model.extract_embeddings(
            x, padding_mask=padding_mask, aggregation=self.aggregation
        )
        if self.freeze_backbone:
            embs = jax.lax.stop_gradient(embs)
        return embs

    def __call__(self, x, padding_mask=None):
        return self.forward(x, padding_mask)

    def forward(self, x, padding_mask=None) -> jnp.ndarray:
        """Probe logits for raw audio (online) or embeddings (offline)."""
        embs = self._get_embeddings(x, padding_mask)
        if not isinstance(embs, (list, tuple)):
            embs = [embs]
        return self.module.apply(self.variables, list(embs), padding_mask)

    def apply(self, variables, embeddings, padding_mask=None, deterministic=True, rngs=None):
        """Pure apply for use inside jitted train steps."""
        if not isinstance(embeddings, (list, tuple)):
            embeddings = [embeddings]
        return self.module.apply(
            variables,
            list(embeddings),
            padding_mask,
            deterministic=deterministic,
            rngs=rngs,
        )

    def get_learned_weights_table(self) -> str:
        """Human-readable learned layer-weight table (base_probes.py:208-241)."""
        params = self.variables["params"]
        if "layer_weights" not in params:
            return "No learned weights found. This probe does not use weighted sum of embeddings."
        raw = np.asarray(params["layer_weights"])
        norm = np.asarray(jax.nn.softmax(raw))
        lines = ["Learned Layer Weights:", "=" * 50]
        lines.append(f"{'Layer':<15} {'Raw Weight':<12} {'Normalized':<12} {'Percentage':<12}")
        lines.append("-" * 50)
        for i, (r, n) in enumerate(zip(raw, norm)):
            lines.append(f"Layer_{i:<9} {r:<12.4f} {n:<12.4f} {n * 100:<12.2f}%")
        lines.append("-" * 50)
        lines.append("Sum of normalized weights: %.6f" % norm.sum())
        lines.append("Number of layers: %d" % len(raw))
        return "\n".join(lines)
