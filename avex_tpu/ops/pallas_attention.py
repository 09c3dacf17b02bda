"""Pallas TPU kernel: attention fused with gated relative-position bias.

The BEATs attention (backbone.py:541-568) applies a per-layer gate to a
shared T5 bias: ``softmax(q·kᵀ·scale + gate ⊙ pos_bias + pad) · v``. The XLA
path materializes ``gate * pos_bias`` as a ``[B, H, T, T]`` fp32 tensor in
HBM per layer (~188 MB at B=64, T=248) plus the logits/softmax intermediates
— the dominant HBM traffic of the whole model, since the matmuls themselves
are small at these sequence lengths.

This kernel keeps everything in VMEM: for each (batch, head) grid cell it
loads q/k/v tiles and the *shared* ``[T, T]`` bias slice (batch-independent —
read once per head, B× less traffic), applies the scalar-per-query gate and
padding mask in registers, and runs the softmax+PV matmul without touching
HBM. Sequence lengths here are short (≤ ~1k tokens), so the full ``[T, T]``
logits tile fits VMEM comfortably and no online-softmax tiling is needed.

Inputs are padded to TPU tile multiples by the wrapper; numerical behavior
matches :func:`avex_tpu.ops.attention.dot_product_attention` (fp32 softmax).

Status — measured verdict (v5e, B=128/H=12/T=248/D=64, fp32, round 2):

    XLA fused path      36,100 clips/s
    pallas block_b=8    23,205 clips/s   (0.66x)
    pallas block_b=4    22,331 clips/s   (0.62x)
    pallas block_b=16   VMEM overflow

The v2 batch-packed grid (``block_b`` batch items per cell amortize the
shared [T, T] bias load and grid overhead) closed none of the gap: the
binding constraints are (a) the D=64 contraction uses half the 128-wide MXU
regardless of packing — a cost XLA pays too but hides behind better
cross-head pipelining — and (b) XLA fuses the gate x bias chain into the
logits computation without materializing it in HBM at these sequence
lengths, so the kernel has no memory-traffic win to harvest.

Round 3 also measured JAX's own tuned TPU flash-attention kernel
(jax.experimental.pallas.ops.tpu.flash_attention) at the same shapes in
bf16: it only accepts a *materialized* ``[B, H, T, T]`` additive bias
(``ab``), so the gate x shared-bias product must round-trip HBM — the very
traffic the XLA path fuses away — and it lands at **0.437x XLA** (21,449
vs 49,094 clips/s of attention; this kernel 0.668x). Flash-style online
softmax only pays when the logits tile exceeds VMEM; at T=248 everything
already fits, so the pipelining advantage cannot offset the bias stream.

Reproduce with ``python scripts/bench_attention.py --dtype bfloat16``. The
kernel stays OFF by default (``BEATsConfig.use_pallas``); it remains correct
(parity-tested vs the XLA path at 12 heads incl. masks/gates) and is the
right starting point if sequence lengths ever grow past VMEM (online-softmax
tiling would then also be needed).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gated_bias_attention"]


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, pad_ref, out_ref, *, scale):
    """One (batch-block, head) cell: `block_b` batch items share one bias load.

    The shared ``[T, T]`` bias slice is the largest input per cell; packing
    batch items amortizes it (and the grid overhead) ``block_b``×. The per-
    item matmuls run as a fori_loop over 2-D dots (Mosaic maps each to the
    MXU; a batched 3-D dot_general lowers to the same loop).
    """
    nb = q_ref.shape[0]
    bias = bias_ref[0].astype(jnp.float32)  # [T, T], loaded once per cell

    def body(i, _):
        q = q_ref[i, 0].astype(jnp.float32)  # [T, D]
        k = k_ref[i, 0].astype(jnp.float32)
        v = v_ref[i, 0]
        logits = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale
        gate = gate_ref[i, 0].astype(jnp.float32)  # [T, 1]
        logits = logits + gate * bias
        logits = logits + pad_ref[i].astype(jnp.float32)  # [1, T] over queries

        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out_ref[i, 0] = jax.lax.dot_general(
            weights,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nb, body, 0, unroll=True)


def gated_bias_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_bias: jnp.ndarray,
    gate: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    block_b: int = 8,
) -> jnp.ndarray:
    """Fused ``softmax(q·kᵀ·scale + gate ⊙ bias + pad) · v``.

    Args:
        q, k, v: ``[B, H, T, D]``.
        pos_bias: shared bias ``[H, T, T]`` (batch-independent).
        gate: per-query gate ``[B, H, T]`` (or None for plain bias).
        key_padding_mask: ``[B, T]`` boolean, True = padded key.
        scale: logit scale, default ``1/sqrt(D)``.
        interpret: run in the Pallas interpreter (CPU testing).
        block_b: batch items per grid cell (shared-bias amortization).

    Returns:
        ``[B, H, T, D]`` in the dtype of ``v``.
    """
    bsz, heads, seq, dim = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(dim)
    if interpret is None:
        # Mosaic kernels only compile for TPU; anywhere else (CPU tests,
        # use_pallas=True models under the virtual mesh) runs the interpreter.
        interpret = jax.default_backend() != "tpu"
    while bsz % block_b:
        block_b //= 2
    block_b = max(block_b, 1)

    # Pad to TPU tile multiples: sublane 8, lane 128.
    seq_p = _round_up(seq, 8)
    dim_p = _round_up(dim, 128)
    pad_seq, pad_dim = seq_p - seq, dim_p - dim
    if pad_seq or pad_dim:
        widths4 = ((0, 0), (0, 0), (0, pad_seq), (0, pad_dim))
        q = jnp.pad(q, widths4)
        k = jnp.pad(k, widths4)
        v = jnp.pad(v, widths4)
        pos_bias = jnp.pad(pos_bias, ((0, 0), (0, pad_seq), (0, pad_seq)))

    if gate is None:
        gate = jnp.ones((bsz, heads, seq_p), q.dtype)
    elif pad_seq:
        gate = jnp.pad(gate, ((0, 0), (0, 0), (0, pad_seq)))
    gate = gate[..., None]  # [B, H, T, 1]

    # Additive key mask: padded keys (incl. tile padding) get -inf.
    valid = jnp.arange(seq_p) < seq
    if key_padding_mask is not None:
        if pad_seq:
            key_padding_mask = jnp.pad(
                key_padding_mask, ((0, 0), (0, pad_seq)), constant_values=True
            )
        key_valid = (~key_padding_mask) & valid[None, :]
    else:
        key_valid = jnp.broadcast_to(valid[None, :], (bsz, seq_p))
    pad_bias = jnp.where(key_valid, 0.0, -jnp.inf).astype(jnp.float32)[:, None, :]  # [B,1,T]

    grid = (bsz // block_b, heads)
    nb = block_b
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, 1, seq_p, dim_p), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, seq_p, dim_p), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, seq_p, dim_p), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq_p, seq_p), lambda b, h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, seq_p, 1), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, seq_p), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, 1, seq_p, dim_p), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, heads, seq_p, dim_p), v.dtype),
        interpret=interpret,
    )(q, k, v, pos_bias, gate, pad_bias[:, :, :])
    if pad_seq or pad_dim:
        out = out[:, :, :seq, :dim]
    return out
