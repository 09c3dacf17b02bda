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
) -> jnp.ndarray:
    """Exact SDPA with the sequence axis sharded over ``axis``.

    Args:
      q, k, v: ``[B, H, T, D]``. ``T`` must divide by the ring size
        ``mesh.shape[axis]``; the batch shards over ``data_axis`` when that
        axis is in the mesh.
      bias: optional additive bias ``[B|1, H|1, T, T]`` (gated relative
        position bias, ``-inf`` key padding, etc. — same semantics as
        ``dot_product_attention``). Its query axis shards with ``q``; its key
        axis stays whole per device and is sliced per ring step (per-device
        bias memory is ``T/S × T``).
      scale: logit scale; default ``1/sqrt(D)``.

    Returns ``[B, H, T, D]`` in ``v``'s dtype, equal to
    ``dot_product_attention(q, k, v, bias)`` to fp32 roundoff.
    """
    if q.ndim != 4:
        raise ValueError(f"ring_attention expects [B, H, T, D] inputs, got {q.shape}")
    ring = int(mesh.shape[axis])
    seq = int(q.shape[2])
    if seq % ring:
        raise ValueError(f"sequence length {seq} not divisible by ring size {ring}")
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    if ring == 1:
        from avex_tpu.ops.attention import dot_product_attention

        return dot_product_attention(q, k, v, bias=bias, scale=scale)

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

    def body(q_l, k_l, v_l, bias_l):
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
                logits = logits + b.astype(jnp.float32)
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
        return (acc / l[..., None]).astype(v_l.dtype)

    if bias is None:

        def body_nobias(q_l, k_l, v_l):
            return body(q_l, k_l, v_l, None)

        return jax.shard_map(
            body_nobias,
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec),
            out_specs=qkv_spec,
        )(q, k, v)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
        out_specs=qkv_spec,
    )(q, k, v, bias)
