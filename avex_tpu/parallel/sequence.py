"""Sequence parallelism (Megatron-SP) for scanned layer stacks.

Shards the **activation time axis** over a mesh axis through the encoder's
elementwise regions. Between transformer blocks, activations are
``[B, T, E]`` and every op at the boundary (LayerNorm, residual adds,
dropout, the FFN's position-wise matmuls) is independent per position — so
pinning ``T`` sharded there lets XLA run all of that work sequence-sharded
and insert the gather only where attention genuinely needs the full
sequence. This is the GSPMD expression of Megatron-LM's sequence
parallelism: one ``with_sharding_constraint`` per layer boundary, collectives
chosen by the compiler (all-gather before QKV, reduce-scatter after the
out-projection when the same axis also shards kernels tensor-parallel).

It composes with tensor parallelism on the **same** mesh axis — Megatron's
actual deployment layout — which `__graft_entry__.dryrun_multichip` cell 7
exercises: TP-sharded FFN/projection kernels + sequence-sharded activations,
loss-parity-checked against a single device.

For attention itself at sequences too long for one device, use
``ops/ring_attention.py`` (the K/V rotate around the ring and the score
matrix never materializes); this module is the cheap everything-else half of
sequence parallelism.

The torch reference has neither (NCCL DDP only —
/root/reference/avex/training/distributed.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_sequence_parallel_runner"]


def make_sequence_parallel_runner(
    mesh: Mesh,
    axis: str = "model",
    data_axis: Optional[str] = "data",
) -> Callable:
    """A layer-stack runner (the ``layer_runner`` contract of
    ``models/beats.py``) that re-shards ``[B, T, E]`` activations with ``T``
    over ``axis`` at every layer boundary and runs the layers sequentially.

    Values are untouched — GSPMD sharding never changes semantics — so the
    output is bit-identical to the plain scan; what changes is where the
    elementwise work runs and which collectives XLA inserts.
    """
    data = data_axis if (data_axis is not None and data_axis in mesh.axis_names) else None
    sharding = NamedSharding(mesh, P(data, axis, None))

    def runner(layer_fn, stacked_params, x, batched=(), shared=()):
        batched = tuple(batched)
        shared = tuple(shared)

        def body(h, p):
            h = lax.with_sharding_constraint(h, sharding)
            return layer_fn(p, h, *batched, *shared), None

        y, _ = lax.scan(body, x, stacked_params)
        return lax.with_sharding_constraint(y, sharding)

    return runner
