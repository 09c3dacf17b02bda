"""Probe head modules (linear / MLP / LSTM / attention / transformer).

Linen counterparts of the five reference probe heads
(avex/models/probes/{linear,mlp,lstm,attention,transformer}_probe.py). These
heads are trained from scratch, so behavioral equivalence (same structure,
pooling, and capacity) is what matters — not elementwise parity with torch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_ACTIVATIONS = {
    "relu": nn.relu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "tanh": jnp.tanh,
    "swish": nn.swish,
}


class LinearHead(nn.Module):
    """Single linear classifier (linear_probe.py:16)."""

    num_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return nn.Dense(self.num_classes, name="classifier")(x)


class MLPHead(nn.Module):
    """MLP with configurable hiddens/activation/dropout (mlp_probe.py:51-73)."""

    num_classes: int
    hidden_dims: Tuple[int, ...] = (512, 256)
    activation: str = "relu"
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        act = _ACTIVATIONS[self.activation]
        for i, width in enumerate(self.hidden_dims):
            x = nn.Dense(width, name=f"hidden_{i}")(x)
            x = act(x)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes, name="classifier")(x)


class MoEHead(nn.Module):
    """Mixture-of-experts MLP probe head (avex-tpu extension — the reference
    has no MoE anywhere): top-k routed experts over pooled embeddings with
    dense TPU dispatch (``ops/moe.py``). Pass ``mesh`` + ``expert_axis`` to
    run expert-parallel — each device holds and computes its slice of the
    expert set."""

    num_classes: int
    num_experts: int = 4
    moe_hidden_dim: int = 256
    moe_k: int = 2
    capacity_factor: float = 2.0
    dropout_rate: float = 0.1
    mesh: object = None
    expert_axis: Optional[str] = "model"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from avex_tpu.ops.moe import MoEMLP

        h = MoEMLP(
            num_experts=self.num_experts,
            hidden_dim=self.moe_hidden_dim,
            out_dim=self.moe_hidden_dim,
            k=self.moe_k,
            capacity_factor=self.capacity_factor,
            mesh=self.mesh,
            expert_axis=self.expert_axis,
            name="moe",
        )(x)
        h = jax.nn.gelu(h, approximate=False)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.num_classes, name="classifier")(h)


class LSTMHead(nn.Module):
    """(bi)LSTM over the sequence, mean-pooled outputs → classifier
    (lstm_probe.py:57-104). Hidden size follows the reference's
    short-sequence heuristic ``max(max_seq_len/4, lstm_hidden_size)``."""

    num_classes: int
    lstm_hidden_size: int = 256
    num_layers: int = 1
    bidirectional: bool = False
    dropout_rate: float = 0.1
    max_sequence_length: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        hidden = int(np.maximum(int((self.max_sequence_length or 4) / 4), self.lstm_hidden_size))
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(hidden), name=f"lstm_fwd_{i}")(x)
            if self.bidirectional:
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(hidden), reverse=True, keep_order=True,
                    name=f"lstm_bwd_{i}",
                )(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
            if self.dropout_rate > 0 and i < self.num_layers - 1:
                x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        pooled = x.mean(axis=1)
        if self.dropout_rate > 0:
            pooled = nn.Dropout(self.dropout_rate)(pooled, deterministic=deterministic)
        return nn.Dense(self.num_classes, name="classifier")(pooled)


def _sinusoidal_encoding(length: int, dim: int) -> np.ndarray:
    """Fixed sinusoidal positional table (attention_probe.py:74-82)."""
    pe = np.zeros((length, dim), dtype=np.float32)
    position = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * (-np.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)[:, : pe[:, 1::2].shape[1]]
    return pe


class AttentionHead(nn.Module):
    """Residual MHA blocks + mean pool + classifier (attention_probe.py:57-120)."""

    num_classes: int
    num_heads: int = 8
    num_layers: int = 2
    dropout_rate: float = 0.1
    use_positional_encoding: bool = False
    max_sequence_length: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # heads must divide the feature dim; degrade like the reference does.
        num_heads = self.num_heads
        while x.shape[-1] % num_heads != 0 and num_heads > 1:
            num_heads -= 1
        if self.use_positional_encoding:
            pe = jnp.asarray(
                _sinusoidal_encoding(self.max_sequence_length or 1000, x.shape[-1])
            )
            x = x + pe[None, : x.shape[1]]
        attn_mask = None
        if padding_mask is not None and padding_mask.shape[1] == x.shape[1]:
            attn_mask = ~padding_mask[:, None, None, :]  # True = attend
        for i in range(self.num_layers):
            attn_out = nn.MultiHeadDotProductAttention(
                num_heads=num_heads,
                dropout_rate=self.dropout_rate,
                deterministic=deterministic,
                name=f"attention_{i}",
            )(x, x, mask=attn_mask)
            x = nn.LayerNorm(name=f"layer_norm_{i}")(x + attn_out)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        pooled = x.mean(axis=1)
        if self.dropout_rate > 0:
            pooled = nn.Dropout(self.dropout_rate)(pooled, deterministic=deterministic)
        return nn.Dense(self.num_classes, name="classifier")(pooled)


class TransformerHead(nn.Module):
    """Post-norm transformer encoder stack + mean pool + classifier
    (transformer_probe.py:56-80; block layout follows torch's
    TransformerEncoderLayer post-norm default with relu FFN)."""

    num_classes: int
    num_heads: int = 8
    num_layers: int = 2
    attention_dim: int = 512  # feed-forward width, like the reference wiring
    dropout_rate: float = 0.1
    use_positional_encoding: bool = False
    max_sequence_length: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        dim = x.shape[-1]
        num_heads = self.num_heads
        while dim % num_heads != 0 and num_heads > 1:
            num_heads -= 1
        if self.use_positional_encoding:
            pos = self.param(
                "pos_encoding",
                nn.initializers.normal(1.0),
                (1, self.max_sequence_length or 1000, dim),
            )
            x = x + pos[:, : x.shape[1]]
        attn_mask = None
        if padding_mask is not None and padding_mask.shape[1] == x.shape[1]:
            attn_mask = ~padding_mask[:, None, None, :]
        for i in range(self.num_layers):
            attn_out = nn.MultiHeadDotProductAttention(
                num_heads=num_heads,
                dropout_rate=self.dropout_rate,
                deterministic=deterministic,
                name=f"block_{i}_attn",
            )(x, x, mask=attn_mask)
            x = nn.LayerNorm(name=f"block_{i}_norm1")(
                x + nn.Dropout(self.dropout_rate)(attn_out, deterministic=deterministic)
            )
            h = nn.Dense(self.attention_dim, name=f"block_{i}_ff1")(x)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
            h = nn.Dense(dim, name=f"block_{i}_ff2")(h)
            x = nn.LayerNorm(name=f"block_{i}_norm2")(
                x + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
            )
        pooled = x.mean(axis=1)
        if self.dropout_rate > 0:
            pooled = nn.Dropout(self.dropout_rate)(pooled, deterministic=deterministic)
        return nn.Dense(self.num_classes, name="classifier")(pooled)
