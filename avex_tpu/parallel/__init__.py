"""Device-mesh parallelism: the avex-tpu replacement for torch DDP/NCCL.

The reference's only distribution strategy is NCCL data parallelism
(avex/training/distributed.py, train.py:578-617). Here distribution is a
``jax.sharding.Mesh``: parameters are replicated (or model-sharded) and the
batch is sharded along the ``data`` axis; XLA inserts the gradient psum that
DDP performs with NCCL all-reduce. CLIP's global-batch feature all-gather
(losses.py:88-102 in the reference) falls out of the same mechanism — the
similarity matmul over a data-sharded batch compiles to an all-gather over
ICI.

Multi-host bring-up (SLURM/GKE discovery ≈ distributed.py:104-183) is a thin
shim over ``jax.distributed.initialize``.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "shard_params_fsdp",
    "fsdp_sharding",
    "fsdp_tree_shardings",
    "batch_sharding",
    "replicated_sharding",
    "init_multihost",
    "local_array",
    "local_device_count",
    "is_main_process",
    "P",
    "Mesh",
    "NamedSharding",
]


def make_mesh(
    data: int = -1,
    model: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices.

    ``data=-1`` uses all remaining devices after the model axis. The default
    is pure data parallelism (model=1), matching the reference's DDP-only
    strategy, but the model axis is first-class so tensor-parallel shardings
    compose without re-plumbing.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1:
        raise ValueError("model axis size must be >= 1")
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    mesh_devices = np.asarray(devices).reshape(data, model)
    return Mesh(mesh_devices, axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Sharding for a batch-leading array: data axis sharded, rest replicated."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding over the mesh."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree onto the mesh, sharded along ``data``.

    Non-numeric leaves (e.g. raw text labels kept for tokenization/logging)
    are dropped — only device-typed data crosses the host boundary.

    Multi-host semantics match the reference's DistributedSampler + DDP: each
    process's loader yields a *local* batch (``build_dataloaders`` shards the
    dataset by process), and the global batch is their concatenation —
    assembled with ``jax.make_array_from_process_local_data``, NOT
    ``device_put`` (which would treat each host's local batch as the full
    global array and silently keep only its addressable slice).
    """

    def is_numeric(x) -> bool:
        try:
            return np.issubdtype(np.asarray(x).dtype, np.number) or np.issubdtype(
                np.asarray(x).dtype, np.bool_
            )
        except TypeError:
            return False

    data_size = mesh.shape[mesh.axis_names[0]]
    multihost = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        # Remainder batches (e.g. a drop_last=False tail) that don't divide
        # the data axis are replicated instead — correct, and the odd shape
        # triggers its own jit specialization anyway.
        if x.ndim == 0 or (x.shape[0] * (jax.process_count() if multihost else 1)) % data_size != 0:
            if multihost and x.ndim != 0:
                # Replication of per-process-different local data (and
                # per-process-different step counts) is undefined in
                # multi-controller jax — fail loudly instead of diverging.
                # build_dataloaders drops remainder batches on multi-host.
                raise ValueError(
                    f"multi-host batch of local size {x.shape[0]} does not "
                    f"assemble onto the {data_size}-way data axis; use "
                    "drop_last=True (or pad) so every process contributes "
                    "equal, divisible batches"
                )
            return jax.device_put(x, replicated_sharding(mesh))
        sharding = batch_sharding(mesh, x.ndim)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    if isinstance(batch, dict):
        return {k: put(v) for k, v in batch.items() if is_numeric(v)}
    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def fsdp_sharding(shape: Tuple[int, ...], mesh: Mesh, min_size: int = 2**16) -> NamedSharding:
    """ZeRO-3 placement policy for one tensor shape: shard the largest
    mesh-divisible axis over ``data``; small/indivisible tensors replicate.

    Shape-deterministic on purpose — optimizer moments mirror their params'
    shapes, so the same policy shards them consistently without any sharding
    propagation."""
    axis = mesh.axis_names[0]
    size = mesh.shape[axis]
    n_elems = int(np.prod(shape)) if shape else 1
    if not shape or n_elems < min_size:
        return replicated_sharding(mesh)
    dims = [(d, n) for d, n in enumerate(shape) if n % size == 0]
    if not dims:
        return replicated_sharding(mesh)
    shard_dim = max(dims, key=lambda dn: dn[1])[0]
    spec: list = [None] * len(shape)
    spec[shard_dim] = axis
    return NamedSharding(mesh, P(*spec))


def shard_params_fsdp(params: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """FSDP-style parameter sharding: each large tensor shards its largest
    divisible axis over the ``data`` mesh axis (ZeRO-3 layout).

    XLA's sharding propagation then turns the data-parallel gradient psum
    into reduce-scatter + all-gather over ICI, and parameter/optimizer memory
    drops by the data-axis size — the jax-native equivalent of FSDP/ZeRO,
    which the torch reference does not implement. Small tensors
    (< ``min_size`` elements — biases, norms) stay replicated; so does
    anything with no axis divisible by the mesh.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, fsdp_sharding(np.shape(x), mesh, min_size)), params
    )


def fsdp_tree_shardings(tree: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """Matching tree of :func:`fsdp_sharding` placements for any pytree of
    arrays/ShapeDtypeStructs (used as jit ``out_shardings`` for optimizer
    init, whose zero-moments have no data dependence to propagate from)."""
    return jax.tree_util.tree_map(
        lambda x: fsdp_sharding(tuple(np.shape(x)), mesh, min_size), tree
    )


def local_array(x: Any) -> Any:
    """This process's slice of a (possibly non-addressable) global array.

    Multi-controller jax forbids materializing a global array whose shards
    live on other hosts; host-side consumers (metric calculators pairing
    device outputs with this host's labels) want exactly the local rows.
    Fully-addressable arrays and non-arrays pass through unchanged.
    """
    if not hasattr(x, "is_fully_addressable") or x.is_fully_addressable:
        return x
    # Distinct blocks this host holds, keyed by their full global index
    # (replicas — e.g. over a model axis — collapse to one copy).
    blocks: dict = {}
    for shard in x.addressable_shards:
        key = tuple(
            (0 if sl.start is None else sl.start, dim if sl.stop is None else sl.stop)
            for sl, dim in zip(shard.index, x.shape)
        )
        if key not in blocks:
            blocks[key] = np.asarray(shard.data)
    return stitch_local_blocks(blocks, x.shape, x.dtype)


def stitch_local_blocks(blocks: dict, shape: tuple, dtype: Any) -> np.ndarray:
    """Assemble this host's shard blocks into one dense local array.

    ``blocks`` maps per-axis ``(start, stop)`` global-index tuples to numpy
    data. Stitches along EVERY sharded axis, not just axis 0: under a
    model-axis mesh a tensor can be sharded on a trailing axis (e.g. logits
    on the class axis), and stacking those blocks as extra rows would
    silently corrupt metric/label pairing. Each axis's distinct start
    offsets map to local positions; blocks scatter into a dense buffer.
    """
    if len(blocks) == 1:
        return next(iter(blocks.values()))
    ndim = len(shape)
    axis_offsets = []
    for d in range(ndim):
        extents = {}  # global start -> extent
        for key in blocks:
            start, stop = key[d]
            prev = extents.setdefault(start, stop - start)
            if prev != stop - start:
                raise ValueError(
                    f"local_array: ragged shards along axis {d} of {shape}"
                )
        starts = sorted(extents)
        offsets, pos = {}, 0
        for s in starts:
            offsets[s] = pos
            pos += extents[s]
        axis_offsets.append((offsets, pos))
    local_shape = tuple(total for _offs, total in axis_offsets)
    expect = int(np.prod([len(offs) for offs, _total in axis_offsets]))
    if len(blocks) != expect:
        raise ValueError(
            "local_array: addressable shards do not tile a dense grid "
            f"({len(blocks)} blocks vs {expect} grid cells for {shape})"
        )
    out = np.empty(local_shape, dtype=dtype)
    for key, data in blocks.items():
        slices = tuple(
            slice(
                axis_offsets[d][0][key[d][0]],
                axis_offsets[d][0][key[d][0]] + data.shape[d],
            )
            for d in range(ndim)
        )
        out[slices] = data
    return out


def local_device_count() -> int:
    """Number of devices attached to this host."""
    return jax.local_device_count()


def is_main_process() -> bool:
    """True on the host that should write checkpoints/logs
    (≈ distributed.py:234-244)."""
    return jax.process_index() == 0


def _first_slurm_node(nodelist: str) -> str:
    """First hostname of a SLURM nodelist expression.

    Handles bracketed ranges and hyphenated hostnames:
    ``node[001-004]`` → ``node001``, ``gpu-a[3,17]`` → ``gpu-a3``,
    ``tpu-pod-1`` → ``tpu-pod-1``, ``a1,a2`` → ``a1``.
    """
    depth = 0
    first = nodelist
    for i, ch in enumerate(nodelist):
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "," and depth == 0:  # comma separating whole hostnames
            first = nodelist[:i]
            break
    first = first.strip()
    if "[" in first:
        prefix, rng = first.split("[", 1)
        token = rng.rstrip("]").split(",")[0].split("-")[0]
        return prefix + token
    return first


def _discover_slurm() -> Optional[Dict[str, Any]]:
    """SLURM env → (coordinator, num_processes, process_id)
    (≈ distributed.py:14-28, 104-161, incl. job-id-salted port)."""
    if "SLURM_PROCID" not in os.environ:
        return None
    try:
        process_id = int(os.environ["SLURM_PROCID"])
        num_processes = int(os.environ["SLURM_NTASKS"])
        head = _first_slurm_node(os.environ.get("SLURM_NODELIST", "localhost"))
        job_id = int(os.environ.get("SLURM_JOB_ID", "0"))
        port = 10000 + (job_id % 20000)
        return {
            "coordinator_address": f"{head}:{port}",
            "num_processes": num_processes,
            "process_id": process_id,
        }
    except (KeyError, ValueError):
        return None


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX when running under SLURM/explicit config.

    Single-host runs are a no-op (returns False). The jax runtime handles
    rendezvous/collectives; no backend literal ("nccl") to configure.
    """
    if coordinator_address is None:
        discovered = _discover_slurm()
        if discovered is None:
            return False
        coordinator_address = discovered["coordinator_address"]
        num_processes = discovered["num_processes"]
        process_id = discovered["process_id"]
    if num_processes in (None, 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "multi-host jax initialized: process %d/%d via %s",
        process_id,
        num_processes,
        coordinator_address,
    )
    return True


def gather_metrics(metrics: Dict[str, float]) -> Dict[str, float]:
    """Average scalar metrics across hosts (≈ distributed.py:247-328).

    Single-process runs return the input unchanged; multi-host runs
    all-gather each value and average (the reference's all_reduce-SUM/avg
    metric sync).
    """
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    out = {}
    for key, value in metrics.items():
        gathered = multihost_utils.process_allgather(np.asarray(value, np.float64))
        out[key] = float(np.mean(gathered))
    return out
