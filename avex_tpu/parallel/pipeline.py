"""GPipe-style pipeline parallelism over a mesh axis (shard_map + ppermute).

The reference framework's only distribution strategy is NCCL data parallelism
(``/root/reference/avex/training/distributed.py``); pipeline parallelism is a
TPU-native capability it does not have. This module implements the classic
GPipe schedule the JAX way:

- a transformer's **scanned layer stack** (params stacked on a leading layer
  axis, the ``nn.scan`` layout) shards that axis over a mesh axis — each
  device holds ``L / S`` consecutive layers (one *stage*);
- the batch splits into **microbatches** that stream through the stages;
  activations hop stage-to-stage over ICI via ``lax.ppermute`` (a neighbor
  ring — the cheapest collective on a TPU torus);
- the whole schedule is one ``lax.scan`` over ``M + S - 1`` ticks inside one
  ``jax.shard_map``, so it jits into a single XLA program and is
  **differentiable end-to-end** (``ppermute`` transposes to the reverse
  permute; the backward pass is the mirrored pipeline).

When is this the right tool? Not for fitting throughput on models that fit in
one chip's HBM — pure data parallelism has no bubble. Pipelining is for
models whose *parameters + optimizer state* exceed a chip: stage sharding
divides both by ``S`` while keeping per-device compute contiguous. The bubble
fraction is ``(S - 1) / (M + S - 1)``; raise ``num_microbatches`` to amortize
it.

Semantics are exact: the pipelined forward computes bit-for-bit the same math
as the sequential layer loop (same layer order, same params), so loss parity
against a single-device run is asserted in tests and in
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "pipeline_apply",
    "make_pipeline_runner",
    "shard_pipeline_params",
    "pipeline_microbatch_count",
]


def _leading_dim(tree: Any) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        raise ValueError("pipeline_apply: empty parameter stack")
    dim = leaves[0].shape[0]
    for leaf in leaves:
        if leaf.shape[0] != dim:
            raise ValueError(
                "pipeline_apply: stacked params must share their leading "
                f"(layer) axis; got {leaf.shape[0]} vs {dim}"
            )
    return int(dim)


def _sequential(layer_fn, stacked_params, x, batched, shared):
    """Reference semantics: layers applied in order, no pipelining."""

    def body(h, p):
        return layer_fn(p, h, *batched, *shared), None

    y, _ = lax.scan(body, x, stacked_params)
    return y


def pipeline_apply(
    layer_fn: Callable,
    stacked_params: Any,
    x: jnp.ndarray,
    batched: Sequence[Any] = (),
    shared: Sequence[Any] = (),
    *,
    mesh: Mesh,
    axis: str = "model",
    data_axis: Optional[str] = "data",
    num_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """Run ``x`` through a stacked layer sequence, pipelined over ``axis``.

    Args:
      layer_fn: ``(params_slice, h, *batched, *shared) -> h`` — one layer.
        Must preserve ``h``'s shape (residual-block contract).
      stacked_params: pytree whose leaves all have leading dim ``L`` (the
        ``nn.scan`` parameter layout). ``L`` must divide by the stage count.
      x: ``[B, ...]`` activations entering layer 0.
      batched: per-example side inputs (e.g. a key padding mask ``[B, T]``);
        they ride through the pipeline alongside their microbatch, untouched.
      shared: batch-independent side inputs (e.g. a relative-position bias);
        replicated to every stage.
      mesh: the device mesh. ``axis`` is the pipeline-stage axis; its size S
        is the stage count. ``data_axis`` (if present in the mesh) shards the
        batch — every data slice runs its own independent pipeline flow.
        Any FURTHER mesh axis (e.g. a ``tp`` axis) stays GSPMD-automatic
        inside the stage body: shard the stacked params' feature dims over
        it (dp×pp×tp) and XLA inserts the tensor-parallel collectives.
      num_microbatches: microbatch count M (default S). The local batch
        ``B / data_axis_size`` must divide by M.

    Returns: ``[B, ...]`` activations after all L layers, value-identical to
    the sequential loop.
    """
    batched = tuple(batched)
    shared = tuple(shared)
    stages = int(mesh.shape[axis])
    n_layers = _leading_dim(stacked_params)
    if n_layers % stages:
        raise ValueError(
            f"pipeline_apply: {n_layers} layers not divisible into {stages} stages"
        )
    if stages == 1:
        # Degenerate single-stage pipeline: the plain sequential loop (GSPMD
        # handles any data-axis sharding as usual).
        return _sequential(layer_fn, stacked_params, x, batched, shared)

    n_micro = int(num_microbatches or stages)
    data_in_mesh = data_axis is not None and data_axis in mesh.axis_names
    data_size = int(mesh.shape[data_axis]) if data_in_mesh else 1
    batch = int(x.shape[0])
    if batch % data_size:
        raise ValueError(
            f"pipeline_apply: batch {batch} not divisible by data axis {data_size}"
        )
    local_batch = batch // data_size
    if local_batch % n_micro:
        raise ValueError(
            f"pipeline_apply: per-device batch {local_batch} not divisible "
            f"into {n_micro} microbatches"
        )

    batch_spec = P(data_axis) if data_in_mesh else P()
    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    batched_specs = tuple(batch_spec for _ in batched)
    shared_specs = tuple(P() for _ in shared)
    # Only the stage axis (and the data axis, when present) go manual; any
    # OTHER mesh axis stays GSPMD-automatic inside the stage body, so a
    # third axis can tensor-parallel the per-stage kernels (dp×pp×tp) with
    # XLA inserting the matching all-reduces — no manual collectives beyond
    # the stage-hop ppermute.
    manual_axes = frozenset({axis} | ({data_axis} if data_in_mesh else set()))

    def body(params_local, x_local, batched_local, shared_local):
        stage = lax.axis_index(axis)
        mb = x_local.shape[0] // n_micro
        x_mb = x_local.reshape((n_micro, mb) + x_local.shape[1:])
        batched_mb = tuple(
            b.reshape((n_micro, mb) + b.shape[1:]) for b in batched_local
        )

        def apply_local(h, extras):
            def layer_body(carry, p):
                return layer_fn(p, carry, *extras, *shared_local), None

            h, _ = lax.scan(layer_body, h, params_local)
            return h

        # One-layer output template pins the carried activation shape/dtype
        # (e.g. a bf16 block applied to an fp32 input).
        p0 = jax.tree_util.tree_map(lambda a: a[0], params_local)
        out_sds = jax.eval_shape(
            lambda p, h: layer_fn(p, h, *(b[0] for b in batched_mb), *shared_local),
            p0,
            jax.ShapeDtypeStruct(x_mb.shape[1:], x_mb.dtype),
        )
        if out_sds.shape != x_mb.shape[1:]:
            raise ValueError(
                "pipeline_apply: layer_fn must preserve activation shape; got "
                f"{out_sds.shape} from {x_mb.shape[1:]}"
            )

        def vary(v):
            # The scan carry is device-varying (stage-dependent); its zero
            # initializer is not — mark it so the VMA types match. Only the
            # MANUAL axes appear in a vma type; auto (GSPMD) axes must not
            # be pcast over.
            missing = tuple(a for a in manual_axes if a not in jax.typeof(v).vma)
            return lax.pcast(v, missing, to="varying") if missing else v

        h0 = vary(jnp.zeros(out_sds.shape, out_sds.dtype))
        b0 = tuple(vary(jnp.zeros_like(b[0])) for b in batched_mb)
        # Slot M is the write-off target for bubble ticks (no valid output).
        out0 = vary(jnp.zeros((n_micro + 1,) + out_sds.shape, out_sds.dtype))
        perm = [(i, (i + 1) % stages) for i in range(stages)]

        def tick(carry, t):
            h, bstate, outputs = carry
            m_idx = jnp.clip(t, 0, n_micro - 1)
            inj_h = lax.dynamic_index_in_dim(x_mb, m_idx, 0, keepdims=False)
            inj_b = tuple(
                lax.dynamic_index_in_dim(b, m_idx, 0, keepdims=False)
                for b in batched_mb
            )
            first = stage == 0
            h_in = jnp.where(first, inj_h.astype(out_sds.dtype), h)
            b_in = tuple(jnp.where(first, ib, sb) for ib, sb in zip(inj_b, bstate))
            h_out = apply_local(h_in, b_in)
            # The last stage finished microbatch (t - S + 1) this tick.
            out_idx = t - (stages - 1)
            widx = jnp.where(out_idx >= 0, out_idx, n_micro)
            outputs = lax.dynamic_update_index_in_dim(outputs, h_out, widx, 0)
            h_next = lax.ppermute(h_out, axis, perm)
            b_next = tuple(lax.ppermute(b, axis, perm) for b in b_in)
            return (h_next, b_next, outputs), None

        ticks = jnp.arange(n_micro + stages - 1)
        (_h, _b, outputs), _ = lax.scan(tick, (h0, b0, out0), ticks)
        # Only the last stage's buffer holds real outputs; broadcast it.
        mine = jnp.where(stage == stages - 1, outputs[:n_micro], 0)
        y = lax.psum(mine, axis)
        return y.reshape((n_micro * mb,) + y.shape[2:])

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, batch_spec, batched_specs, shared_specs),
        out_specs=batch_spec,
        axis_names=manual_axes,
    )(stacked_params, x, batched, shared)


def make_pipeline_runner(
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
    axis: str = "model",
    data_axis: Optional[str] = "data",
) -> Callable:
    """A layer-stack runner bound to a mesh, in the shape model modules expect
    (see ``models/beats.py`` — ``layer_runner``): called as
    ``runner(layer_fn, stacked_params, x, batched, shared)``."""
    return partial(
        pipeline_apply,
        mesh=mesh,
        axis=axis,
        data_axis=data_axis,
        num_microbatches=num_microbatches,
    )


def pipeline_microbatch_count(mesh: Mesh, axis: str = "model") -> int:
    """Default microbatch count: one per stage (bubble fraction ~50%; raise
    it for real runs — the schedule supports any M the batch divides by)."""
    return int(mesh.shape[axis])


def shard_pipeline_params(
    params: Any,
    mesh: Mesh,
    axis: str = "model",
    marker: Any = ("layers", "blocks"),
    tp_axis: Optional[str] = None,
) -> Any:
    """Place a parameter tree for pipeline parallelism: every leaf living
    under a ``marker`` key (the ``nn.scan`` layer stack — ``layers`` for the
    BEATs encoder, ``blocks`` for the EAT/Bird-MAE ViT stacks; pass a string
    or tuple to override) shards its leading (layer) axis over ``axis``;
    everything else replicates.

    ``tp_axis`` is the documented 3D (dp×pp×tp) recipe as a library entry
    point: stacked kernels additionally shard their LAST (output-feature)
    dim over that mesh axis when divisible, which tensor-parallels the
    per-stage matmuls under GSPMD (``pipeline_apply`` keeps every non-stage
    mesh axis automatic, so XLA inserts the matching collectives).

    The placement matches ``pipeline_apply``'s ``in_specs``, so the stacked
    weights are already distributed one stage per device and shard_map moves
    no parameter bytes at dispatch time.
    """
    from jax.sharding import NamedSharding

    markers = (marker,) if isinstance(marker, str) else tuple(marker)
    stages = int(mesh.shape[axis])
    tp = int(mesh.shape[tp_axis]) if tp_axis is not None else 1

    def place(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if any(m in names for m in markers) and np.ndim(leaf) >= 1 and leaf.shape[0] % stages == 0:
            spec = [axis] + [None] * (np.ndim(leaf) - 1)
            if tp_axis is not None and np.ndim(leaf) >= 2 and leaf.shape[-1] % tp == 0:
                spec[-1] = tp_axis
            return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
