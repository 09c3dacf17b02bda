"""ATST-Frame (frame-level Audio Spectrogram Transformer) in Flax.

TPU-native counterpart of ``avex/models/atst_frame/`` (FrameAST ViT at
atst_frame.py:759, encoder wrapper at atst_encoder.py:18):

- frontend: MelSpectrogram(16 kHz, f_min 60, f_max 7800, n_fft/win 1024,
  hop 160, 64 mels) → power-dB with top_db=80 → MinMax to [-1, 1] with the
  published constants (atst_frame.py:1784-1794);
- FrameAST-base: per-frame patch embedding (64 freq x 4 frame patches →
  one token per 4 frames), learned positions ("cut" to the input length),
  12 pre-norm ViT blocks (qkv_bias=False);
- timestamp embeddings: per-frame concat over the last ``n_blocks`` block
  outputs (``embed_dim * 12`` features, atst_frame.py:1859+); scene
  embedding = concat of per-block mean+max pools.

Weight conversion accepts the reference ``.ckpt`` encoder state dict naming
(``blocks.{i}...``, ``patch_embed.proj``, ``pos_embed``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.models.base import ModelBase
from avex_tpu.ops.attention import dot_product_attention
from avex_tpu.ops.frontend import htk_mel_banks, stft_power
from avex_tpu.utils.tree import merge_converted_params

__all__ = ["FrameASTModel", "Model", "convert_atst_state_dict", "atst_frontend"]

N_BLOCKS = 12
_MINMAX = (-79.6482, 50.6842)


def atst_frontend(wav: jnp.ndarray, precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Waveform → normalized 64-mel dB spectrogram ``(B, 64, frames)``."""
    power = stft_power(wav, n_fft=1024, hop_length=160, win_length=1024, precision=precision)
    mel_fb = jnp.asarray(
        htk_mel_banks(513, 64, 16000.0, f_min=60.0, f_max=7800.0).astype(np.float32)
    )
    mel = jnp.einsum("bkf,km->bmf", power, mel_fb, precision=precision)
    # AmplitudeToDB(stype="power", top_db=80)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.maximum(db, jnp.max(db, axis=(1, 2), keepdims=True) - 80.0)
    lo, hi = _MINMAX
    return (db - lo) / (hi - lo) * 2.0 - 1.0


class _Block(nn.Module):
    dim: int = 768
    heads: int = 12
    qkv_bias: bool = False
    dtype: Any = jnp.float32
    #: fused-QKV Pallas attention (ops/pallas_attention.py). None = auto: on
    #: for real-TPU traces at T >= 248 (the measured in-model crossover of
    #: the bias-free fused boundary) — fires for 10 s windows (T=250,
    #: measured +17%: 2,108 vs 1,795 clips/s, B=128 bf16 v5e) and stays XLA
    #: at the 5 s T=125 (measured 0.92x); training routes the VMEM backward
    #: kernel (EAT step +44% at T=513, neutral at T=249) —
    #: scripts/bench_fused_qkv_ab.py.
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bsz, seq, dim = x.shape
        head_dim = dim // self.heads
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(h)
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = seq >= 248 and jax.default_backend() == "tpu"
        from avex_tpu.ops.pallas_attention import fused_qkv_compatible

        if use_pallas and fused_qkv_compatible(dim, self.heads):
            from avex_tpu.ops.pallas_attention import fused_qkv_attention

            attn = fused_qkv_attention(qkv, heads=self.heads, scale=head_dim**-0.5)
        else:
            qkv = qkv.reshape(bsz, seq, 3, self.heads, head_dim)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            # bf16 compute runs the softmax chain in bf16 too (the [B,H,T,T]
            # stream dominates HBM traffic; fp32 keeps the parity softmax).
            attn = dot_product_attention(
                q, k, v, scale=head_dim**-0.5,
                logits_dtype=jnp.float32 if self.dtype == jnp.float32 else self.dtype,
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(bsz, seq, dim)
        x = x + nn.Dense(dim, dtype=self.dtype, name="proj")(attn)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * dim, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class FrameASTModel(nn.Module):
    """FrameAST: per-frame ViT over the mel spectrogram."""

    embed_dim: int = 768
    depth: int = 12
    heads: int = 12
    patch_h: int = 64
    patch_w: int = 4
    max_frames: int = 1001
    num_classes: Optional[int] = None
    n_blocks_out: int = N_BLOCKS
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None  # threaded to every _Block

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        if x.ndim == 2:  # raw waveform
            # bf16 trunk -> bf16-operand rDFT/mel matmuls (fp32 accumulate);
            # fp32 keeps the torch-parity HIGHEST path (test_atst_parity.py).
            spec = atst_frontend(
                x,
                precision=jax.lax.Precision.HIGHEST
                if self.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT,
            )
        else:
            spec = x  # (B, 64, T)
        # Patch over (freq=64, time=4): conv with kernel (64, 4) on (B, F, T, 1).
        img = spec[:, :, :, None]  # (B, 64, T, 1)
        h = nn.Conv(
            self.embed_dim,
            (self.patch_h, self.patch_w),
            strides=(self.patch_h, self.patch_w),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(img)  # (B, 1, T//4, D)
        tokens = h[:, 0]  # (B, N, D)
        n = tokens.shape[1]

        max_patches = self.max_frames // self.patch_w
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, max_patches, self.embed_dim),
            jnp.float32,
        )
        tokens = tokens + pos[:, :n].astype(self.dtype)  # "cut" positional type

        # Shared final LayerNorm (norm_frame): get_intermediate_layers applies
        # it to EVERY tapped block output (atst_frame.py:1084-1099), not just
        # the last — declare once, reuse per block.
        norm_frame = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")

        intermediates: Dict[str, jnp.ndarray] = {}
        block_outputs: List[jnp.ndarray] = []
        for i in range(self.depth):
            tokens = _Block(dim=self.embed_dim, heads=self.heads, dtype=self.dtype,
                            use_pallas=self.use_pallas,
                            name=f"blocks_{i}")(tokens, deterministic)
            intermediates[f"atst.blocks.{i}"] = tokens
            if self.depth - i <= self.n_blocks_out:
                block_outputs.append(norm_frame(tokens))

        # timestamp embedding: concat of the last n_blocks_out normed block
        # outputs (atst_frame.py:1859-1901, scene=False path); scene embedding
        # = per-block mean pool (scene=True path, nprompt=0).
        timestamp = jnp.concatenate(block_outputs, axis=-1)
        scene = jnp.concatenate([b.mean(axis=1) for b in block_outputs], axis=-1)
        aux = {
            "intermediates": intermediates,
            "timestamp_embedding": timestamp,
            "scene_embedding": scene,
            "features": block_outputs[-1],
        }
        aux["pooled"] = timestamp.mean(axis=1)
        if self.num_classes is None:
            return timestamp, aux
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(aux["pooled"])
        return logits, aux


def convert_atst_state_dict(
    state: Dict[str, np.ndarray], num_classes: Optional[int] = None
) -> Dict[str, Any]:
    """Reference FrameAST encoder state dict → flax params."""
    normalized = {}
    for k, v in state.items():
        for prefix in ("model.teacher.encoder.", "teacher.encoder.", "encoder.", "atst."):
            if k.startswith(prefix):
                k = k[len(prefix) :]
                break
        normalized[k] = v
    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = jnp.asarray(np.asarray(value, np.float32))

    for key, value in normalized.items():
        if key == "patch_embed.proj.weight":  # CNN patch embed (Conv2d DCHW)
            put(("patch_embed", "kernel"), np.transpose(value, (2, 3, 1, 0)))
        elif key == "patch_embed.patch_embed.weight":
            # Linear patch embed (PatchEmbed_v2, atst_frame.py:705-758): the
            # Rearrange packs features as (p1=freq, p2=time, c) — exactly the
            # (H, W, C) minor dims of our conv kernel, so W.T reshapes in.
            v = np.asarray(value, np.float32)  # (D, 64*4*1)
            put(("patch_embed", "kernel"), v.T.reshape(64, 4, 1, v.shape[0]))
        elif key in ("patch_embed.proj.bias", "patch_embed.patch_embed.bias"):
            put(("patch_embed", "bias"), value)
        elif key == "pos_embed":
            # Reference pos_embed carries a class-token slot at index 0 that
            # the "cut" path skips (pos_embed[:, 1:T+1], atst_frame.py:914).
            put(("pos_embed",), np.asarray(value)[:, 1:])
        elif key in ("norm.weight", "norm.bias", "norm_frame.weight", "norm_frame.bias"):
            put(("norm", "scale" if key.endswith("weight") else "bias"), value)
        elif key.startswith("blocks."):
            parts = key.split(".")
            idx, sub = parts[1], parts[2:]
            base = (f"blocks_{idx}",)
            if sub[0] in ("norm1", "norm2"):
                put(base + (sub[0], "scale" if sub[1] == "weight" else "bias"), value)
            elif sub[0] == "attn" and sub[1] in ("qkv", "proj"):
                which = "kernel" if sub[2] == "weight" else "bias"
                put(base + (sub[1], which), value.T if which == "kernel" else value)
            elif sub[0] == "mlp" and sub[1] in ("fc1", "fc2"):
                which = "kernel" if sub[2] == "weight" else "bias"
                put(base + (sub[1], which), value.T if which == "kernel" else value)
        elif key.startswith("classifier.") and num_classes is not None:
            which = "kernel" if key.endswith("weight") else "bias"
            put(("classifier", which), value.T if which == "kernel" else value)
    return {"params": params}


class Model(ModelBase):
    """ATST wrapper registered as ``atst`` (≈ atst_encoder.py:18)."""

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = False,
        audio_config: Optional[Dict[str, Any]] = None,
        atst_model_path: Optional[str] = None,
        return_features_only: bool = True,
        compute_dtype: str = "float32",
        use_pallas: Optional[bool] = None,
        seed: int = 0,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        self.num_classes = None if return_features_only else num_classes
        self.depth = 12
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.module = FrameASTModel(
            num_classes=self.num_classes, dtype=dtype, use_pallas=use_pallas
        )
        dummy = jnp.zeros((1, 16000), jnp.float32)
        self.variables = self._init_variables(dummy, seed=seed)
        if atst_model_path:
            from avex_tpu.utils.loaders import process_state_dict, universal_load

            self.load_state_dict(process_state_dict(universal_load(atst_model_path)))

    def _apply_kwargs(self) -> Dict[str, Any]:
        return {"deterministic": True}

    def _discover_embedding_layers(self) -> None:
        if not self._layer_names:
            self._layer_names = [f"atst.blocks.{i}" for i in range(self.depth)]

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False) -> None:
        """Load a converted ATST torch checkpoint into the Flax variables."""
        converted = convert_atst_state_dict(state, num_classes=self.num_classes)
        self.variables = merge_converted_params(self.variables, converted, strict=strict)
        self._jit_cache.clear()
