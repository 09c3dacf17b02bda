"""Bird-MAE (masked-autoencoder ViT for bird audio) in Flax.

TPU-native counterpart of ``avex/models/birdmae.py:17-67`` (which loads the
HF remote-code ``DBD-research-group/Bird-MAE-{base,huge}``). The encoder is
an AudioMAE-style ViT over a 128-mel spectrogram of 32 kHz audio:

- frontend: Kaldi fbank (Hann window) at 32 kHz, 128 mels, padded/truncated
  to 1024 frames, per-dataset normalization;
- ViT trunk: 16x16 patches, fixed 2-D sin-cos positions, CLS token,
  pre-norm blocks — base (768 x 12) or huge (1280 x 32, 16 heads; the
  reference reports 1280-d embeddings, birdmae.py:42).

Weight conversion accepts timm/MAE-style naming (``patch_embed.proj``,
``blocks.{i}.attn.qkv`` …).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from avex_tpu.models.base import ModelBase
from avex_tpu.models.eat import _Block, apply_vit_blocks, sincos_2d_positions  # noqa: F401
from avex_tpu.ops.fbank import KaldiFbank
from avex_tpu.utils.tree import merge_converted_params

__all__ = ["BirdMAEModel", "Model", "convert_birdmae_state_dict", "MAE_VARIANTS"]

#: model_id suffix → (dim, depth, heads)
MAE_VARIANTS = {
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
    "huge": (1280, 32, 16),
}


class BirdMAEModel(nn.Module):
    """AudioMAE-style ViT encoder over 32 kHz 128-mel spectrograms."""

    dim: int = 1280
    depth: int = 32
    heads: int = 16
    target_length: int = 1024
    sample_rate: float = 32000.0
    norm_mean: float = -7.2
    norm_std: float = 4.43
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32
    #: nn.scan-stacked block params — the layout pipeline/SP shard
    #: (see models/eat.py apply_vit_blocks).
    scan_layers: bool = False
    layer_runner: Optional[Callable] = None
    #: ring-attention mesh for long windows (see models/eat.py _Block).
    ring_mesh: Any = None
    #: fused-QKV Pallas attention override (models/eat.py _Block; None=auto).
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        if x.ndim == 2:  # raw waveform at 32 kHz
            fbank = KaldiFbank(
                num_mel_bins=128, sample_frequency=self.sample_rate, window_type="hanning"
            )
            mel = fbank(x.astype(jnp.float32))  # (B, F, 128)
            frames = mel.shape[1]
            if frames < self.target_length:
                mel = jnp.pad(mel, ((0, 0), (0, self.target_length - frames), (0, 0)))
            else:
                mel = mel[:, : self.target_length]
            spec = (mel - self.norm_mean) / (2.0 * self.norm_std)  # (B, T, 128)
        else:
            spec = x
        img = spec[:, :, :, None].astype(self.dtype)  # (B, T, 128, 1)
        h = nn.Conv(
            self.dim, (16, 16), strides=(16, 16), padding="VALID", dtype=self.dtype,
            name="patch_embed",
        )(img)
        bsz, gh, gw, _ = h.shape
        tokens = h.reshape(bsz, gh * gw, self.dim)
        pos = jnp.asarray(sincos_2d_positions(self.dim, gh, gw))
        tokens = tokens + pos[None].astype(self.dtype)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, self.dim), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (bsz, 1, self.dim)), tokens], axis=1
        )

        tokens, intermediates = apply_vit_blocks(
            self, tokens, key_prefix="model.blocks.", deterministic=deterministic
        )
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)

        aux = {"intermediates": intermediates, "features": tokens, "pooled": tokens[:, 0]}
        if self.num_classes is None:
            return tokens, aux
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(aux["pooled"])
        return logits, aux


def convert_birdmae_state_dict(
    state: Dict[str, np.ndarray],
    num_classes: Optional[int] = None,
    scan_layers: bool = False,
) -> Dict[str, Any]:
    """timm/MAE-style ViT state dict → flax params."""
    from avex_tpu.models.eat import convert_eat_state_dict

    # The MAE naming is the same ViT block naming EAT uses; reuse its
    # converter (it also strips decoder/_ema keys).
    return convert_eat_state_dict(state, num_classes=num_classes, scan_layers=scan_layers)


class Model(ModelBase):
    """Bird-MAE wrapper registered as ``birdmae`` (≈ avex/models/birdmae.py)."""

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = False,
        audio_config: Optional[Dict[str, Any]] = None,
        model_id: str = "DBD-research-group/Bird-MAE-huge",
        return_features_only: bool = False,
        compute_dtype: str = "float32",
        depth: Optional[int] = None,
        dim: Optional[int] = None,
        heads: Optional[int] = None,
        target_length: int = 1024,
        scan_layers: bool = False,
        seed: int = 0,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        self.model_id = model_id
        self.target_sample_rate = 32000
        variant = "huge"
        for key in MAE_VARIANTS:
            if key in model_id.lower():
                variant = key
        v_dim, v_depth, v_heads = MAE_VARIANTS[variant]
        dim, depth, heads = dim or v_dim, depth or v_depth, heads or v_heads
        self.depth = depth
        self.scan_layers = bool(scan_layers)
        self.num_classes = None if return_features_only else num_classes
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self._module_kwargs = dict(
            dim=dim,
            depth=depth,
            heads=heads,
            target_length=target_length,
            num_classes=self.num_classes,
            dtype=dtype,
            scan_layers=self.scan_layers,
        )
        self.module = BirdMAEModel(**self._module_kwargs)
        dummy = jnp.zeros((1, 32000), jnp.float32)
        self.variables = self._init_variables(dummy, seed=seed)

    def _apply_kwargs(self) -> Dict[str, Any]:
        return {"deterministic": True}

    def _discover_embedding_layers(self) -> None:
        if not self._layer_names:
            self._layer_names = [f"model.blocks.{i}.attn.proj" for i in range(self.depth)]

    def _require_scan_layout(self, what: str) -> None:
        if not self.scan_layers:
            raise ValueError(
                f"{what} needs the stacked (scan_layers=True) parameter "
                "layout; construct the model with "
                'init_config={"scan_layers": True}'
            )

    def enable_pipeline(self, mesh, num_microbatches: Optional[int] = None) -> None:
        """GPipe pipeline over ``mesh``'s model axis (parallel/pipeline.py);
        same contract as ``models/beats.py``/``models/eat.py``."""
        from avex_tpu.parallel.pipeline import make_pipeline_runner

        self._require_scan_layout("pipeline parallelism")
        self.module = BirdMAEModel(
            **{**self._module_kwargs,
               "layer_runner": make_pipeline_runner(mesh, num_microbatches=num_microbatches)}
        )
        self._jit_cache.clear()

    def enable_sequence_parallel(self, mesh) -> None:
        """Megatron-SP over ``mesh``'s model axis (parallel/sequence.py)."""
        from avex_tpu.parallel.sequence import make_sequence_parallel_runner

        self._require_scan_layout("sequence parallelism")
        self.module = BirdMAEModel(
            **{**self._module_kwargs, "layer_runner": make_sequence_parallel_runner(mesh)}
        )
        self._jit_cache.clear()

    def enable_ring_attention(self, mesh, axis: str = "model") -> None:
        """Rebuild the module with ring attention over ``mesh``'s model axis
        (ops/ring_attention.py) — long-window inference mode."""
        self.module = BirdMAEModel(**{**self._module_kwargs, "ring_mesh": mesh})
        self._jit_cache.clear()

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False) -> None:
        """Load a timm/MAE-style Bird-MAE state dict."""
        converted = convert_birdmae_state_dict(
            state, num_classes=self.num_classes, scan_layers=self.scan_layers
        )
        self.variables = merge_converted_params(self.variables, converted, strict=strict)
        self._jit_cache.clear()
