"""Register a user-defined JAX model with the avex-tpu plugin API.

The reference framework demonstrates this with torch modules + forward hooks
(examples/03_custom_model_registration.py there); the avex-tpu equivalent is
a *functional capture contract* — jit-compatible by construction:

1. Your Flax module's ``__call__(x, padding_mask=None, ...)`` returns
   ``(output, aux)`` where ``aux["intermediates"]`` maps layer names to the
   activations you want to expose for embedding extraction.
2. Your wrapper subclasses :class:`avex_tpu.models.base.ModelBase`, sets
   ``self.module`` + ``self.variables``, and lists those layer names in
   ``_discover_embedding_layers``.
3. ``register_model_class(arch_name, Wrapper)`` makes the architecture
   buildable; ``register_model(registry_key, ModelSpec(name=arch_name, ...))``
   gives users a named registry entry for ``build_model``/``load_model``.

Everything downstream (layer selection, aggregations, probes, the embedding
cache, `avex-tpu embed`, serving) then works on the custom model unchanged.
"""

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

import avex_tpu
from avex_tpu.configs import ModelSpec, ProbeConfig
from avex_tpu.models.base import ModelBase
from avex_tpu.probes import build_probe_from_config


# ---------------------------------------------------------------------------
# 1. The architecture: a small conv encoder over log-mel patches
# ---------------------------------------------------------------------------


class SoundCNNModule(nn.Module):
    """Two conv stages + pooled feature head; exposes each stage's output."""

    width: int = 32
    num_classes: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, padding_mask=None, train: bool = False):
        # x: (B, n_mels, frames) mel spectrogram -> NHWC image
        x = x[..., None]
        intermediates: Dict[str, jnp.ndarray] = {}
        for i, width in enumerate((self.width, self.width * 2), start=1):
            x = nn.Conv(width, (3, 3), strides=(2, 2), name=f"conv{i}")(x)
            x = nn.gelu(x)
            # capture as (B, T, F): flatten the mel axis into features so
            # sequence probes (LSTM/attention) can consume the layer
            intermediates[f"stage{i}"] = x.reshape(x.shape[0], x.shape[1], -1)
        pooled = x.mean(axis=(1, 2))
        intermediates["pooled"] = pooled
        aux = {"intermediates": intermediates}
        if self.num_classes is None:
            return pooled, aux
        return nn.Dense(self.num_classes, name="classifier")(pooled), aux


# ---------------------------------------------------------------------------
# 2. The wrapper: ModelBase glue (frontend, init, layer list)
# ---------------------------------------------------------------------------


class SoundCNN(ModelBase):
    """avex-tpu wrapper for :class:`SoundCNNModule`."""

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = False,
        audio_config: Optional[Dict[str, Any]] = None,
        width: int = 32,
        seed: int = 0,
        **_: Any,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        self.num_classes = num_classes
        self.module = SoundCNNModule(width=width, num_classes=num_classes)
        n_mels = self.audio_config.n_mels if self.audio_config else 128
        dummy = jnp.zeros((1, n_mels, 64), jnp.float32)
        self.variables = self._init_variables(dummy, seed=seed)

    def _discover_embedding_layers(self) -> None:
        if not self._layer_names:
            self._layer_names = ["stage1", "stage2", "pooled"]

    def forward(self, x, padding_mask=None):
        """Waveform -> mel (host of the audio_config frontend) -> module."""
        return super().forward(self.process_audio(x), None)

    def extract_fn(self, layers, aggregation):
        """Fuse the mel frontend into the jitted extraction program."""
        inner = super().extract_fn(layers, aggregation)

        def extract(variables, x, padding_mask):
            if x.ndim == 2:  # raw waveform
                x = self.process_audio(x)
            return inner(variables, x, None)

        return extract


def main() -> None:
    """Register, build, extract, and probe the custom model."""
    # 3. Register the architecture class and a named spec
    avex_tpu.register_model_class("sound_cnn", SoundCNN)
    avex_tpu.register_model(
        "my_sound_cnn",
        ModelSpec(
            name="sound_cnn",
            pretrained=False,
            init_config={"width": 32},
            audio_config={
                "representation": "mel_spectrogram",
                "n_mels": 64,
                "n_fft": 512,
                "target_length_seconds": 1,
            },
        ),
        overwrite=True,
    )

    # The registry now serves it like any built-in model
    model = avex_tpu.build_model("my_sound_cnn", num_classes=4)
    print("layers:", model.get_model_layers())

    wav = np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32) * 0.1
    logits = model.forward(wav)
    print("logits:", logits.shape)

    # Layer-wise embeddings: identical API to the built-in zoo
    model.register_hooks_for_layers(["stage2", "pooled"])
    emb = model.extract_embeddings(wav, aggregation="mean")
    print("stage2+pooled embedding:", np.asarray(emb).shape)

    # A linear probe over the frozen custom backbone (online mode)
    probe = build_probe_from_config(
        ProbeConfig(probe_type="linear", target_layers=["pooled"]),
        num_classes=4,
        base_model=model,
    )
    print("probe logits:", np.asarray(probe(wav)).shape)


if __name__ == "__main__":
    main()
