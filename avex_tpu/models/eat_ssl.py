"""EAT self-supervised pretraining (data2vec-2.0 style) in Flax.

The reference's ``EATSSLStrategy`` (training_strategies.py:213-274) expects a
model that returns ``{"losses": ..., "sample_size": ...}`` — but the backing
data2vec-multi SSL model lives in external fairseq checkpoints, outside the
reference repo (SURVEY §2.6). This module supplies a TPU-native
implementation of that recipe so ``label_type="self_supervised"`` runs
end-to-end:

- the **student** encodes only the *visible* patches of the fbank image
  (MAE-style efficiency) and a light transformer decoder predicts
  representations at the masked positions;
- the **teacher** is an EMA of the student encoder (held in the ``ema``
  variable collection, updated by the Trainer after each step — the jax
  analogue of fairseq's ``set_num_updates`` EMA cadence) and produces the
  regression target: the average of its top-k layer outputs, instance-normed;
- loss: mean-squared regression over masked positions, reported as
  ``{"losses": {"regression": ...}, "sample_size": n_masked}``.

Masking is rng-driven (``make_rng("mask")``) with a static mask *count* so
all shapes stay jit-constant.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avex_tpu.models.base import ModelBase
from avex_tpu.models.eat import _Block, sincos_2d_positions
from avex_tpu.ops.fbank import KaldiFbank, eat_fbank

__all__ = ["EATSSLModule", "Model", "ema_update"]


class _Encoder(nn.Module):
    """ViT trunk applied to an arbitrary token subset (positions pre-added)."""

    dim: int = 768
    depth: int = 12
    heads: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True):
        layer_outputs = []
        for i in range(self.depth):
            tokens, _ = _Block(
                dim=self.dim, heads=self.heads, dtype=self.dtype, name=f"blocks_{i}"
            )(tokens, deterministic)
            layer_outputs.append(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        return tokens, layer_outputs


class EATSSLModule(nn.Module):
    """Student-teacher masked prediction over fbank patches."""

    dim: int = 768
    depth: int = 12
    heads: int = 12
    decoder_dim: int = 384
    decoder_depth: int = 4
    mask_ratio: float = 0.8
    target_layers: int = 8  # average of the teacher's top-k layers
    target_length: int = 1024
    norm_mean: float = -4.268
    norm_std: float = 4.569
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
    ):
        if x.ndim == 2:
            spec = eat_fbank(
                x,
                target_length=self.target_length,
                norm_mean=self.norm_mean,
                norm_std=self.norm_std,
                fbank=KaldiFbank(window_type="hanning"),
            )  # (B, 128, T)
        else:
            spec = x
        img = spec[:, :, :, None].astype(self.dtype)
        patches = nn.Conv(
            self.dim, (16, 16), strides=(16, 16), padding="VALID", dtype=self.dtype,
            name="patch_embed",
        )(img)
        bsz, gh, gw, _ = patches.shape
        n = gh * gw
        tokens = patches.reshape(bsz, n, self.dim)
        pos = jnp.asarray(sincos_2d_positions(self.dim, gh, gw))[None].astype(self.dtype)
        tokens = tokens + pos

        # Random masking with a static mask count: argsort of uniform noise.
        n_masked = int(self.mask_ratio * n)
        n_visible = n - n_masked
        if deterministic:
            order = jnp.broadcast_to(jnp.arange(n), (bsz, n))
        else:
            noise = jax.random.uniform(self.make_rng("mask"), (bsz, n))
            order = jnp.argsort(noise, axis=1)
        visible_idx = order[:, :n_visible]  # (B, V)
        masked_idx = order[:, n_visible:]  # (B, M)

        take = jax.vmap(lambda t, i: t[i])
        student_in = take(tokens, visible_idx)

        student_out, _ = _Encoder(
            dim=self.dim, depth=self.depth, heads=self.heads, dtype=self.dtype, name="student"
        )(student_in, deterministic)

        if deterministic:
            # Inference path: student over all patches, features out.
            aux = {"intermediates": {"student.norm": student_out}, "features": student_out}
            return student_out, aux

        # Decoder: visible tokens + learned mask tokens at masked positions.
        dec_in_vis = nn.Dense(self.decoder_dim, dtype=self.dtype, name="decoder_embed")(student_out)
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, self.decoder_dim), jnp.float32
        )
        dec_pos = jnp.asarray(sincos_2d_positions(self.decoder_dim, gh, gw))[None].astype(self.dtype)
        dec_vis = dec_in_vis + take(jnp.broadcast_to(dec_pos, (bsz, n, self.decoder_dim)), visible_idx)
        dec_mask = (
            jnp.broadcast_to(mask_token.astype(self.dtype), (bsz, n_masked, self.decoder_dim))
            + take(jnp.broadcast_to(dec_pos, (bsz, n, self.decoder_dim)), masked_idx)
        )
        dec_tokens = jnp.concatenate([dec_vis, dec_mask], axis=1)
        for i in range(self.decoder_depth):
            dec_tokens, _ = _Block(
                dim=self.decoder_dim, heads=max(self.decoder_dim // 64, 1), dtype=self.dtype,
                name=f"decoder_blocks_{i}",
            )(dec_tokens, deterministic)
        predictions = nn.Dense(self.dim, dtype=self.dtype, name="decoder_pred")(
            dec_tokens[:, n_visible:]
        )  # (B, M, dim)

        # Teacher: EMA encoder over ALL patches; target = mean of top-k
        # layers, instance-normalized (the data2vec target recipe). The
        # teacher's params live under the ``teacher`` scope — excluded from
        # the optimizer and EMA-refreshed by the Trainer after each step.
        teacher = _Encoder(
            dim=self.dim, depth=self.depth, heads=self.heads, dtype=self.dtype, name="teacher"
        )
        _t_out, t_layers = teacher(tokens, True)
        top = jnp.stack(t_layers[-self.target_layers :], axis=0).mean(axis=0)  # (B, N, dim)
        mean = top.mean(axis=-1, keepdims=True)
        var = top.var(axis=-1, keepdims=True)
        target = (top - mean) / jnp.sqrt(var + 1e-6)
        target = jax.lax.stop_gradient(take(target, masked_idx))

        diff = (predictions.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        regression = diff.mean(axis=-1).sum()  # summed over masked tokens
        sample_size = bsz * n_masked
        result = {
            "losses": {"regression": regression},
            "sample_size": sample_size,
            "predictions": predictions,
        }
        aux = {"intermediates": {}}
        return result, aux


def ema_update(params: Dict[str, Any], decay: float) -> Dict[str, Any]:
    """teacher ← decay·teacher + (1-decay)·student over the shared trunk.

    Trainer-side helper: both live inside the same ``params`` tree (keys
    ``student`` and ``teacher``); returns the updated tree.
    """
    student = params["student"]
    teacher = params["teacher"]
    new_teacher = jax.tree_util.tree_map(
        lambda t, s: decay * t + (1.0 - decay) * s, teacher, student
    )
    return {**params, "teacher": new_teacher}


class Model(ModelBase):
    """EAT-SSL wrapper (registerable as a custom class for pretraining runs).

    ``pretraining_mode=True`` in the ModelSpec selects this path in the
    reference's run_train (run_train.py:98-100); register it via
    ``register_model_class("eat_ssl", Model)`` or use it directly with the
    Trainer's ``self_supervised`` label type.
    """

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = False,
        audio_config: Optional[Dict[str, Any]] = None,
        eat_cfg: Optional[Dict[str, Any]] = None,
        compute_dtype: str = "float32",
        seed: int = 0,
        **_ignored: Any,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        cfg = eat_cfg or {}
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.ema_decay = float(cfg.pop("ema_decay", 0.999))
        self.module = EATSSLModule(dtype=dtype, **cfg)
        dummy = jnp.zeros((1, 16000), jnp.float32)
        self.variables = jax.jit(
            lambda rng, x: self.module.init({"params": rng, "mask": rng}, x, deterministic=False)
        )(jax.random.PRNGKey(seed), dummy)
        # Teacher starts as a materialized copy of the student trunk (fresh
        # buffers — aliased arrays would break the train step's donation).
        params = dict(self.variables["params"])
        params["teacher"] = jax.tree_util.tree_map(jnp.array, params["student"])
        self.variables = {**self.variables, "params": params}

    #: excluded from the optimizer (EMA-managed, see post_optimizer_step).
    frozen_param_keys = ("teacher",)

    def _apply_kwargs(self) -> Dict[str, Any]:
        return {"deterministic": True}

    def _discover_embedding_layers(self) -> None:
        if not self._layer_names:
            self._layer_names = ["student.norm"]

    def post_optimizer_step(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """EMA teacher refresh; the Trainer calls this after each update."""
        return ema_update(params, self.ema_decay)
