"""Ring attention: sequence-parallel SDPA over a mesh axis.

Sequence parallelism for attention itself — the time axis of ``q/k/v`` shards
over a mesh axis, so a sequence S× longer fits in the same per-device memory.
Each device keeps its query chunk resident while the key/value chunks rotate
around the device ring via ``lax.ppermute`` (nearest-neighbor hops — the
cheapest collective on a TPU torus); softmax is accumulated **online**
(flash-attention-style running max / sum / weighted accumulator in fp32), so
the result is the exact softmax — no approximation — and the full
``[B, H, T, T]`` score matrix never exists anywhere.

This is the long-sequence escape hatch the single-device paths can't offer:
`ops/pallas_attention.py` keeps the score tile in VMEM but still needs the
whole sequence on one chip; ring attention removes that bound entirely. The
op is differentiable (``ppermute`` transposes to the reverse ring;
``tests/unittests/test_ring_attention.py`` pins grad parity) and mirrors
``ops/attention.dot_product_attention``'s bias semantics so the two are
drop-in twins.

The torch reference has no sequence parallelism of any kind (NCCL DDP only —
/root/reference/avex/training/distributed.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention"]


def _vary(v: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Mark a scan-carry initializer as device-varying over every mesh axis
    (VMA types must match the loop outputs, which depend on axis_index)."""
    missing = tuple(a for a in mesh.axis_names if a not in jax.typeof(v).vma)
    return lax.pcast(v, missing, to="varying") if missing else v


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    *,
    mesh: Mesh,
    axis: str = "model",
    data_axis: Optional[str] = "data",
    gate: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Exact SDPA with the sequence axis sharded over ``axis``.

    Args:
      q, k, v: ``[B, H, T, D]``. ``T`` must divide by the ring size
        ``mesh.shape[axis]``; the batch shards over ``data_axis`` when that
        axis is in the mesh.
      bias: optional additive bias ``[B|1, H|1, T, T]`` (relative position
        bias, etc. — same semantics as ``dot_product_attention``). Its query
        axis shards with ``q``; its key axis stays whole per device and is
        sliced per ring step (per-device bias memory is ``T/S × T``).
      scale: logit scale; default ``1/sqrt(D)``.
      gate: optional multiplicative per-query gate ``[B, H, T, 1]`` applied
        to ``bias`` (BEATs' GRU-gated relative position bias,
        backbone.py:543-551). Computing ``gate * bias`` INSIDE the ring is
        the memory point: the gated bias is ``[B, H, T, T]`` if materialized
        up front, but only ``[B, H, T/S, T/S]`` per step here. Shards with
        ``q``.
      key_padding_mask: optional boolean ``[B, T]`` (True = padded key).
        Applied as ``-inf`` per ring step — never expanded to ``[B, .., T, T]``.

    Returns ``[B, H, T, D]`` in ``v``'s dtype, equal to
    ``dot_product_attention(q, k, v, gate * bias + pad)`` to fp32 roundoff.
    """
    if q.ndim != 4:
        raise ValueError(f"ring_attention expects [B, H, T, D] inputs, got {q.shape}")
    if gate is not None and bias is None:
        raise ValueError("ring_attention: gate without bias has nothing to gate")
    ring = int(mesh.shape[axis])
    seq = int(q.shape[2])
    if seq % ring:
        raise ValueError(f"sequence length {seq} not divisible by ring size {ring}")
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    if ring == 1:
        from avex_tpu.ops.attention import dot_product_attention

        full_bias = bias
        if gate is not None:
            full_bias = gate * bias
        if key_padding_mask is not None:
            pad = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, 0.0)
            full_bias = pad if full_bias is None else full_bias + pad
        return dot_product_attention(q, k, v, bias=full_bias, scale=scale)

    data = data_axis if (data_axis is not None and data_axis in mesh.axis_names) else None
    qkv_spec = P(data, None, axis, None)
    bias_spec = None
    if bias is not None:
        if bias.shape[-2] != seq or bias.shape[-1] != seq:
            raise ValueError(
                f"ring_attention bias must have concrete [.., T, T] = {seq} "
                f"trailing dims, got {bias.shape}"
            )
        bias_spec = P(
            data if bias.shape[0] != 1 else None,
            None,
            axis,
            None,  # key axis whole: sliced per ring step
        )
    gate_spec = P(data, None, axis, None) if gate is not None else None
    # Key positions rotate around the ring, so the mask stays whole per
    # device ([B, T] — tiny) and columns are sliced per step like the bias.
    mask_spec = P(data, None) if key_padding_mask is not None else None

    def body(q_l, k_l, v_l, bias_l, gate_l, mask_l):
        me = lax.axis_index(axis)
        chunk = k_l.shape[2]
        m0 = _vary(jnp.full(q_l.shape[:3], -1e30, jnp.float32), mesh)
        l0 = _vary(jnp.zeros(q_l.shape[:3], jnp.float32), mesh)
        acc0 = _vary(
            jnp.zeros(q_l.shape[:3] + (v_l.shape[-1],), jnp.float32), mesh
        )
        perm = [(i, (i + 1) % ring) for i in range(ring)]

        def step(carry, s):
            m, l, acc, k_c, v_c = carry
            # After s hops of the i -> i+1 ring, this device holds the chunk
            # that started on device (me - s).
            src = (me - s) % ring
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q_l, k_c, preferred_element_type=jnp.float32
            ) * jnp.float32(scale)
            if bias_l is not None:
                b = lax.dynamic_slice_in_dim(bias_l, src * chunk, chunk, axis=3)
                b = b.astype(jnp.float32)
                if gate_l is not None:
                    b = gate_l.astype(jnp.float32) * b
                logits = logits + b
            if mask_l is not None:
                mask_c = lax.dynamic_slice_in_dim(mask_l, src * chunk, chunk, axis=1)
                logits = jnp.where(mask_c[:, None, None, :], -jnp.inf, logits)
            m_new = jnp.maximum(m, logits.max(axis=-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new[..., None])
            l_new = l * alpha + p.sum(axis=-1)
            acc_new = acc * alpha[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_c.astype(jnp.float32)
            )
            return (m_new, l_new, acc_new, lax.ppermute(k_c, axis, perm),
                    lax.ppermute(v_c, axis, perm)), None

        (m, l, acc, _k, _v), _ = lax.scan(
            step, (m0, l0, acc0, k_l, v_l), jnp.arange(ring)
        )
        # Fully-masked query rows (l == 0) divide 0/0; emit 0 like the
        # reference's masked positions.
        safe_l = jnp.maximum(l, jnp.finfo(jnp.float32).tiny)
        return (acc / safe_l[..., None]).astype(v_l.dtype)

    operands = [q, k, v]
    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    optional = [(bias, bias_spec), (gate, gate_spec), (key_padding_mask, mask_spec)]
    present = [op is not None for op, _ in optional]
    for op, spec in optional:
        if op is not None:
            operands.append(op)
            in_specs.append(spec)

    def wrapper(*args):
        q_l, k_l, v_l, *rest = args
        rest = iter(rest)
        opts = [next(rest) if there else None for there in present]
        return body(q_l, k_l, v_l, *opts)

    return jax.shard_map(
        wrapper,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=qkv_spec,
    )(*operands)
