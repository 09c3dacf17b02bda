"""CLIP/CLAP audio-text model in Flax: EfficientNet audio + RoBERTa text.

TPU-native counterpart of ``avex/models/clip.py``: EfficientNet-B0/B1 audio
encoder (features-only), a RoBERTa-base text encoder (implemented here with
HF-checkpoint key conversion — the reference pulls ``roberta-base`` via
transformers, clip.py:42), two 2-layer MLP projection heads into a shared
512-d space, and a learnable ``logit_scale`` clamped at ln(100)
(clip.py:61-66,137-139).

Deviation noted: the reference applies its Linear projection directly to the
4-D EfficientNet feature map (clip.py:92-94), which only type-checks for
pooled features; here the spatial map is global-average-pooled first, which
is the functional CLAP formulation.

Tokenization is host-side: an HF tokenizer when available, else a
deterministic hashing tokenizer (useful offline/tests). Max length 70 as in
the reference (clip.py:108-114).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.models.base import ModelBase
from avex_tpu.models.efficientnet import EfficientNetModel
from avex_tpu.ops.attention import dot_product_attention
from avex_tpu.ops.frontend import AudioProcessor
from avex_tpu.utils.tree import merge_converted_params

__all__ = ["RobertaEncoder", "CLIPModule", "Model", "SimpleTokenizer", "convert_roberta_state_dict"]

MAX_TEXT_LEN = 70
LOGIT_SCALE_MAX = math.log(100.0)


class RobertaEncoder(nn.Module):
    """RoBERTa-base text encoder (12-layer post-norm BERT with learned
    positions offset by padding_idx+1, GELU FFN)."""

    vocab_size: int = 50265
    dim: int = 768
    layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 514
    pad_token_id: int = 1
    type_vocab_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        bsz, seq = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.dim, name="word_embeddings")(input_ids)
        # RoBERTa position ids: cumulative count of non-pad tokens + pad idx.
        if attention_mask is None:
            attention_mask = (input_ids != self.pad_token_id).astype(jnp.int32)
        position_ids = jnp.cumsum(attention_mask, axis=1) * attention_mask + self.pad_token_id
        pos = nn.Embed(self.max_positions, self.dim, name="position_embeddings")(position_ids)
        typ = nn.Embed(self.type_vocab_size, self.dim, name="token_type_embeddings")(
            jnp.zeros_like(input_ids)
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="emb_layer_norm")(tok + pos + typ)

        bias = jnp.where(attention_mask[:, None, None, :] == 0, -jnp.inf, 0.0)
        head_dim = self.dim // self.heads
        for i in range(self.layers):
            name = f"layer_{i}"
            residual = h
            q = nn.Dense(self.dim, dtype=self.dtype, name=f"{name}_q")(h)
            k = nn.Dense(self.dim, dtype=self.dtype, name=f"{name}_k")(h)
            v = nn.Dense(self.dim, dtype=self.dtype, name=f"{name}_v")(h)
            q = q.reshape(bsz, seq, self.heads, head_dim).transpose(0, 2, 1, 3)
            k = k.reshape(bsz, seq, self.heads, head_dim).transpose(0, 2, 1, 3)
            v = v.reshape(bsz, seq, self.heads, head_dim).transpose(0, 2, 1, 3)
            # bf16 compute runs the softmax chain in bf16 too (see ops.attention).
            attn = dot_product_attention(
                q, k, v, bias=bias, scale=head_dim**-0.5,
                logits_dtype=jnp.float32 if self.dtype == jnp.float32 else self.dtype,
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(bsz, seq, self.dim)
            attn = nn.Dense(self.dim, dtype=self.dtype, name=f"{name}_attn_out")(attn)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"{name}_attn_ln")(
                residual + attn
            )
            residual = h
            ff = nn.Dense(self.ffn_dim, dtype=self.dtype, name=f"{name}_ff1")(h)
            ff = jax.nn.gelu(ff, approximate=False)
            ff = nn.Dense(self.dim, dtype=self.dtype, name=f"{name}_ff2")(ff)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"{name}_ff_ln")(residual + ff)
        return h


class _Projection(nn.Module):
    """Two-layer MLP projection head (Linear → ReLU → Linear)."""

    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class CLIPModule(nn.Module):
    """Joint audio-text module returning contrastive features."""

    efficientnet_variant: str = "b0"
    projection_dim: int = 512
    temperature: float = 0.07
    #: overrides for the text tower (e.g. smaller configs for tests),
    #: as a hashable tuple of (field, value) pairs.
    text_encoder_kwargs: tuple = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        audio: jnp.ndarray,          # preprocessed spectrogram image (B, 3, F, T)
        text_tokens: jnp.ndarray,    # (B, L) token ids
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        _, audio_aux = EfficientNetModel(
            variant=self.efficientnet_variant, num_classes=None, dtype=self.dtype,
            name="audio_encoder",
        )(audio, train=not deterministic, deterministic=deterministic)
        audio_feat = audio_aux["pooled"]  # (B, 1280)
        audio_emb = _Projection(
            self.projection_dim, self.projection_dim, self.dtype, name="audio_projection"
        )(audio_feat)

        text_hidden = RobertaEncoder(
            dtype=self.dtype, name="text_encoder", **dict(self.text_encoder_kwargs)
        )(text_tokens, deterministic=deterministic)
        text_feat = text_hidden[:, 0, :]  # [CLS]
        text_emb = _Projection(
            self.projection_dim, self.projection_dim, self.dtype, name="text_projection"
        )(text_feat)

        logit_scale = self.param(
            "logit_scale",
            lambda _rng: jnp.asarray(np.log(1.0 / self.temperature), jnp.float32),
        )
        audio_emb = audio_emb / jnp.maximum(jnp.linalg.norm(audio_emb, axis=-1, keepdims=True), 1e-12)
        text_emb = text_emb / jnp.maximum(jnp.linalg.norm(text_emb, axis=-1, keepdims=True), 1e-12)
        out = {
            "audio_features": audio_emb,
            "text_features": text_emb,
            "logit_scale": jnp.clip(logit_scale, max=LOGIT_SCALE_MAX),
        }
        # Audio-tower taps exposed for layer-wise extraction (exceeds the
        # reference, whose CLIP extract_embeddings ignores the layer list —
        # clip.py:143-190). Conv maps (B,C,H,W) flatten to (B, HW, C) so the
        # standard mean/max aggregation applies.
        inter = {"audio_projection": audio_emb, "text_projection": text_emb,
                 "audio_pooled": audio_feat}
        for name, value in audio_aux.get("intermediates", {}).items():
            if value.ndim == 4:  # NCHW
                b, c = value.shape[0], value.shape[1]
                value = jnp.transpose(value, (0, 2, 3, 1)).reshape(b, -1, c)
            inter[f"audio_encoder.{name}"] = value
        aux = {"intermediates": inter}
        return out, aux


class SimpleTokenizer:
    """Deterministic offline fallback tokenizer (hashing; RoBERTa special ids).

    Used when the HF ``roberta-base`` tokenizer is unavailable (no network).
    Not vocabulary-compatible with real RoBERTa — fine for training from
    scratch or testing; checkpointed text towers need the real tokenizer.
    """

    bos, eos, pad = 0, 2, 1

    def __init__(self, vocab_size: int = 50265) -> None:
        self.vocab_size = vocab_size

    def __call__(self, texts: List[str], max_length: int = MAX_TEXT_LEN) -> np.ndarray:
        import hashlib

        batch = []
        for text in texts:
            ids = [self.bos]
            for word in str(text).lower().split()[: max_length - 2]:
                h = int(hashlib.md5(word.encode()).hexdigest(), 16)
                ids.append(4 + (h % (self.vocab_size - 4)))
            ids.append(self.eos)
            batch.append(ids)
        length = min(max(len(i) for i in batch), max_length)
        out = np.full((len(batch), length), self.pad, dtype=np.int32)
        for row, ids in enumerate(batch):
            out[row, : len(ids)] = ids[:length]
        return out


def convert_roberta_state_dict(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF ``roberta-base`` state dict → flax params for :class:`RobertaEncoder`."""
    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = jnp.asarray(np.asarray(value, np.float32))

    prefix = "roberta." if any(k.startswith("roberta.") for k in state) else ""
    emb = f"{prefix}embeddings"
    put(("word_embeddings", "embedding"), state[f"{emb}.word_embeddings.weight"])
    put(("position_embeddings", "embedding"), state[f"{emb}.position_embeddings.weight"])
    put(("token_type_embeddings", "embedding"), state[f"{emb}.token_type_embeddings.weight"])
    put(("emb_layer_norm", "scale"), state[f"{emb}.LayerNorm.weight"])
    put(("emb_layer_norm", "bias"), state[f"{emb}.LayerNorm.bias"])

    i = 0
    while f"{prefix}encoder.layer.{i}.attention.self.query.weight" in state:
        base = f"{prefix}encoder.layer.{i}"
        pairs = [
            (f"{base}.attention.self.query", f"layer_{i}_q"),
            (f"{base}.attention.self.key", f"layer_{i}_k"),
            (f"{base}.attention.self.value", f"layer_{i}_v"),
            (f"{base}.attention.output.dense", f"layer_{i}_attn_out"),
            (f"{base}.intermediate.dense", f"layer_{i}_ff1"),
            (f"{base}.output.dense", f"layer_{i}_ff2"),
        ]
        for torch_name, flax_name in pairs:
            put((flax_name, "kernel"), state[f"{torch_name}.weight"].T)
            put((flax_name, "bias"), state[f"{torch_name}.bias"])
        put((f"layer_{i}_attn_ln", "scale"), state[f"{base}.attention.output.LayerNorm.weight"])
        put((f"layer_{i}_attn_ln", "bias"), state[f"{base}.attention.output.LayerNorm.bias"])
        put((f"layer_{i}_ff_ln", "scale"), state[f"{base}.output.LayerNorm.weight"])
        put((f"layer_{i}_ff_ln", "bias"), state[f"{base}.output.LayerNorm.bias"])
        i += 1
    return {"params": params}


class Model(ModelBase):
    """CLIP/CLAP wrapper registered as ``clip`` (≈ avex/models/clip.py)."""

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = False,
        audio_config: Optional[Dict[str, Any]] = None,
        text_model_name: str = "roberta-base",
        projection_dim: int = 512,
        temperature: float = 0.07,
        efficientnet_variant: str = "b0",
        extra_config: Optional[Dict[str, Any]] = None,
        compute_dtype: str = "float32",
        seed: int = 0,
        **_ignored: Any,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        self.projection_dim = projection_dim
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        text_kwargs = tuple(sorted(((extra_config or {}).get("text_encoder") or {}).items()))
        self.module = CLIPModule(
            efficientnet_variant=efficientnet_variant,
            projection_dim=projection_dim,
            temperature=temperature,
            text_encoder_kwargs=text_kwargs,
            dtype=dtype,
        )
        vocab_size = dict(text_kwargs).get("vocab_size", 50265)
        self.tokenizer = self._load_tokenizer(text_model_name, vocab_size)
        dummy_audio = jnp.zeros((1, 3, 128, 64), jnp.float32)
        dummy_text = jnp.ones((1, 4), jnp.int32)
        self.variables = self._init_variables(dummy_audio, dummy_text, seed=seed)

    @staticmethod
    def _load_tokenizer(name: str, vocab_size: int = 50265):
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(name, local_files_only=True)
        except Exception:
            return SimpleTokenizer(vocab_size)

    def _apply_kwargs(self) -> Dict[str, Any]:
        return {"deterministic": True}

    def _discover_embedding_layers(self) -> None:
        if not self._layer_names:
            # Audio-side layers only: text_projection from dummy tokens would
            # be meaningless in audio extraction, so it is not selectable.
            dummy_audio = jax.ShapeDtypeStruct((1, 3, 128, 64), jnp.float32)
            dummy_text = jax.ShapeDtypeStruct((1, 4), jnp.int32)
            _, aux = jax.eval_shape(
                lambda v, a, t: self.module.apply(v, a, t, **self._apply_kwargs()),
                self.variables, dummy_audio, dummy_text,
            )
            names = [n for n in aux["intermediates"] if n.startswith("audio_encoder.")]
            self._layer_names = names + ["audio_pooled", "audio_projection"]

    def tokenize(self, texts: List[str]) -> np.ndarray:
        """Texts → padded token-id batch (HF tokenizer or offline fallback)."""
        if isinstance(self.tokenizer, SimpleTokenizer):
            return self.tokenizer(texts)
        tokens = self.tokenizer(
            list(texts), padding=True, truncation=True, max_length=MAX_TEXT_LEN, return_tensors="np"
        )
        return tokens["input_ids"].astype(np.int32)

    def process_audio(self, x: jnp.ndarray) -> jnp.ndarray:
        """Waveform -> spectrogram (AudioConfig frontend) -> 3-channel image."""
        x = AudioProcessor(self.audio_config)(jnp.asarray(x, jnp.float32)) if self.audio_config else jnp.asarray(x)
        if x.ndim == 3:
            x = jnp.repeat(x[:, None, :, :], 3, axis=1)
        if x.ndim == 2:
            raise ValueError(
                "CLIP's audio tower consumes spectrograms: pass a spectrogram "
                "audio_config (the official 'clip' spec sets one) or feed "
                "pre-computed (B, C, F, T) features, not raw waveforms."
            )
        return x

    def forward(self, audio, text=None, padding_mask=None):
        """(audio_embeddings, text_embeddings, exp(logit_scale)) like the
        reference forward (clip.py:121-142); audio-only calls return the
        projected audio embedding."""
        spec = self.process_audio(audio)
        if text is None:
            tokens = jnp.ones((spec.shape[0], 2), jnp.int32)
        else:
            tokens = jnp.asarray(self.tokenize(text))
        out, _aux = self.module.apply(self.variables, spec, tokens, **self._apply_kwargs())
        if text is None:
            return out["audio_features"]
        return out["audio_features"], out["text_features"], jnp.exp(out["logit_scale"])

    __call__ = forward

    def extract_fn(self, layers, aggregation):
        """Audio-only extraction: frontend + both towers trace into one jitted
        fn; the text tower runs on a 2-token dummy (its output is never
        selected — discovery exposes audio-side layers only)."""

        def extract(variables, wav, padding_mask):
            spec = self.process_audio(wav)
            tokens = jnp.ones((spec.shape[0], 2), jnp.int32)
            _, aux = self.module.apply(variables, spec, tokens, **self._apply_kwargs())
            return self._select_intermediates(aux["intermediates"], layers, aggregation)

        return extract

    def extract_embeddings(self, x, padding_mask=None, aggregation="none", **_kwargs):
        """Layer-wise extraction honoring registered hooks; defaults to the projected audio features (clip.py:143-190)."""
        if isinstance(x, dict):
            padding_mask = x.get("padding_mask", padding_mask)
            x = x["raw_wav"]
        if not self._hook_layers:
            # Reference default (clip.py:143-190): projected audio features.
            return self.forward(x)
        layers = tuple(self._hook_layers)
        fn = self._jit(("extract", layers, aggregation), self.extract_fn(layers, aggregation))
        out = fn(self.variables, jnp.asarray(x), None)
        return list(out) if isinstance(out, tuple) else out

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False) -> None:
        """Load a CLIP/CLAP checkpoint (audio tower, text tower, projections)."""
        from avex_tpu.models.efficientnet import convert_efficientnet_state_dict

        converted: Dict[str, Any] = {"params": {}, "batch_stats": {}}
        audio_state = {
            k[len("audio_encoder.") :]: v for k, v in state.items() if k.startswith("audio_encoder.")
        }
        if audio_state:
            audio = convert_efficientnet_state_dict(audio_state)
            converted["params"]["audio_encoder"] = audio["params"]
            converted["batch_stats"]["audio_encoder"] = audio["batch_stats"]
        text_state = {
            k[len("text_encoder.") :]: v for k, v in state.items() if k.startswith("text_encoder.")
        }
        if text_state:
            converted["params"]["text_encoder"] = convert_roberta_state_dict(text_state)["params"]
        for proj in ("audio_projection", "text_projection"):
            w0 = state.get(f"{proj}.0.weight")
            if w0 is not None:
                converted["params"][proj] = {
                    "fc1": {"kernel": jnp.asarray(w0.T), "bias": jnp.asarray(state[f"{proj}.0.bias"])},
                    "fc2": {
                        "kernel": jnp.asarray(state[f"{proj}.2.weight"].T),
                        "bias": jnp.asarray(state[f"{proj}.2.bias"]),
                    },
                }
        if "logit_scale" in state:
            converted["params"]["logit_scale"] = jnp.asarray(state["logit_scale"]).reshape(())
        self.variables = merge_converted_params(self.variables, converted, strict=strict)
        self._jit_cache.clear()
