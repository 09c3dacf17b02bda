"""Mixture-of-experts MLP with dense TPU dispatch (expert parallelism).

The TPU-native MoE pattern (GShard/Switch): routing is expressed as two
dense one-hot contractions instead of gather/scatter —

  1. a router picks top-k experts per token and a **position within each
     expert's capacity buffer** (a cumulative-sum over the dispatch order,
     not a data-dependent scatter);
  2. ``dispatch``/``combine`` tensors ``[N, X, C]`` move tokens into per-
     expert batches and back via einsums, which XLA turns into the
     all-to-all when the expert axis is sharded.

Everything is static-shaped (capacity ``C`` fixed up front; overflow tokens
are *dropped* — their combine weight is zero, the standard Switch behavior),
so the whole layer jits cleanly and shards by construction: expert parameters
``[X, ...]`` and per-expert activations ``[X, C, ...]`` carry the expert axis
first, and ``expert_axis``/``mesh`` pin it to a mesh axis — **expert
parallelism**: each device holds and computes ``X / |axis|`` experts.

**Scale envelope (dense dispatch).** The one-hot dispatch/combine tensors are
``[k·N, X, C]`` with ``C ≈ k·N·capacity_factor / X`` — total memory
``O(k² · capacity_factor · N²)`` elements, *independent of X*. At probe scale
(N ≤ a few thousand tokens) that is megabytes; at encoder scale
(N = B·T ≈ 10⁵) it is tens of GB and dense dispatch is the wrong tool
(sorted/ragged dispatch or per-chunk routing would be next). ``MoEMLP``
refuses to trace past ``max_dispatch_elements`` (default 2²⁸ ≈ 1 GB fp32)
instead of silently OOMing — raise the cap explicitly or chunk the tokens if
you really mean it (pinned by ``tests/unittests/test_moe.py``).

This is a capability extension over the torch reference (which has no MoE
anywhere); it exists to complete the dp/tp/pp/sp/ep parallelism matrix with a
real routed-compute workload, and surfaces as the ``moe`` probe head
(``probes/heads.py``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MoEMLP", "switch_load_balancing_loss", "shard_moe_params"]

#: expert-major parameter leaves of MoEMLP ([num_experts, ...]).
EXPERT_PARAM_NAMES = frozenset({"w1", "b1", "w2", "b2"})


def shard_moe_params(tree: Any, mesh, axis: str = "model") -> Any:
    """Expert-parallel placement for a pytree containing MoEMLP params:
    every expert-major leaf (``w1/b1/w2/b2`` under a ``moe`` subtree) shards
    its leading (expert) axis over ``axis``; everything else — the router,
    classifier, other heads — replicates. The matching einsums then run one
    expert slice per device by GSPMD propagation."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    size = int(mesh.shape[axis])

    def place(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if (
            "moe" in names
            and names[-1] in EXPERT_PARAM_NAMES
            and np.ndim(leaf) >= 1
            and leaf.shape[0] % size == 0
        ):
            spec = P(axis, *([None] * (np.ndim(leaf) - 1)))
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, tree)


def _constrain_expert_axis(x, mesh, expert_axis: Optional[str]):
    """Pin an expert-major array's leading axis to the mesh's expert axis."""
    if mesh is None or expert_axis is None or expert_axis not in mesh.axis_names:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(expert_axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def switch_load_balancing_loss(router_probs: jnp.ndarray, dispatch_mask: jnp.ndarray) -> jnp.ndarray:
    """Switch-Transformer auxiliary loss: ``X * Σ_i f_i · P_i`` where ``f`` is
    the fraction of tokens dispatched to expert ``i`` and ``P`` the mean
    router probability — minimized by a uniform router."""
    num_experts = router_probs.shape[-1]
    tokens_per_expert = dispatch_mask.sum(axis=-1).mean(axis=0)  # [X] fraction-ish
    prob_per_expert = router_probs.mean(axis=0)  # [X]
    return num_experts * jnp.sum(tokens_per_expert * prob_per_expert)


class MoEMLP(nn.Module):
    """Top-k routed mixture-of-experts MLP over ``[N, E]`` token features.

    Returns ``[N, out_dim]``. With ``capacity_factor`` large enough that no
    token overflows, the output equals the dense per-token mixture
    ``Σ_k w_k · expert_k(x)`` exactly (pinned by test); under overflow the
    dropped (token, expert) pairs contribute zero, Switch-style.

    The auxiliary load-balancing loss is sowed under
    ``intermediates["moe_aux_loss"]``.
    """

    num_experts: int
    hidden_dim: int
    out_dim: int
    k: int = 2
    capacity_factor: float = 2.0
    #: mesh + axis name pin expert-major tensors for expert parallelism.
    mesh: Any = None
    expert_axis: Optional[str] = "model"
    #: trace-time guard on the dense [k·N, X, C] dispatch tensors (see module
    #: docstring): O(k²·capacity_factor·N²) elements. 2**28 ≈ 1 GB fp32.
    max_dispatch_elements: int = 2**28
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim != 2:
            raise ValueError(f"MoEMLP expects [N, E] tokens, got {x.shape}")
        n_tokens, _embed = x.shape
        n_exp, k = self.num_experts, self.k
        if not 1 <= k <= n_exp:
            raise ValueError(f"k={k} must be in [1, num_experts={n_exp}]")
        est_capacity = max(
            1, min(int(np.ceil(k * n_tokens / n_exp * self.capacity_factor)), n_tokens)
        )
        dispatch_elements = k * n_tokens * n_exp * est_capacity
        if dispatch_elements > self.max_dispatch_elements:
            raise ValueError(
                f"MoEMLP dense dispatch would materialize {dispatch_elements:,} "
                f"elements ({dispatch_elements * 4 / 2**30:.1f} GB fp32) for "
                f"N={n_tokens} tokens x {n_exp} experts x capacity "
                f"{est_capacity} — past max_dispatch_elements="
                f"{self.max_dispatch_elements:,}. Dense one-hot dispatch is "
                "O(k^2 * capacity_factor * N^2); chunk the tokens or raise the "
                "cap explicitly if this size is intended."
            )

        # Router (fp32: routing decisions should not depend on compute dtype).
        logits = nn.Dense(n_exp, dtype=jnp.float32, name="router")(
            x.astype(jnp.float32)
        )
        probs = jax.nn.softmax(logits, axis=-1)  # [N, X]
        top_vals, top_idx = jax.lax.top_k(probs, k)  # [N, k]
        weights = top_vals / jnp.maximum(top_vals.sum(-1, keepdims=True), 1e-9)

        capacity = int(np.ceil(k * n_tokens / n_exp * self.capacity_factor))
        capacity = max(1, min(capacity, n_tokens))

        # Dispatch order: choice 0 of every token first, then choice 1 —
        # primary assignments win capacity over secondary ones.
        choice_onehot = jax.nn.one_hot(top_idx, n_exp, dtype=jnp.float32)  # [N, k, X]
        flat = choice_onehot.transpose(1, 0, 2).reshape(k * n_tokens, n_exp)
        position = jnp.cumsum(flat, axis=0) - flat  # position within expert
        pos_row = (position * flat).sum(-1)  # [kN]
        keep = pos_row < capacity
        flat_kept = flat * keep[:, None]
        disp = (
            flat_kept[:, :, None]
            * jax.nn.one_hot(pos_row.astype(jnp.int32), capacity, dtype=jnp.float32)[
                :, None, :
            ]
        )  # [kN, X, C]
        disp = disp.reshape(k, n_tokens, n_exp, capacity)
        dispatch = disp.sum(0)  # [N, X, C] 0/1
        combine = (disp * weights.T[:, :, None, None]).sum(0)  # [N, X, C]

        self.sow(
            "intermediates",
            "moe_aux_loss",
            switch_load_balancing_loss(probs, dispatch),
        )

        w1 = self.param(
            "w1",
            nn.initializers.lecun_normal(),
            (n_exp, x.shape[-1], self.hidden_dim),
            jnp.float32,
        )
        b1 = self.param("b1", nn.initializers.zeros, (n_exp, self.hidden_dim), jnp.float32)
        w2 = self.param(
            "w2",
            nn.initializers.lecun_normal(),
            (n_exp, self.hidden_dim, self.out_dim),
            jnp.float32,
        )
        b2 = self.param("b2", nn.initializers.zeros, (n_exp, self.out_dim), jnp.float32)

        pin = lambda t: _constrain_expert_axis(t, self.mesh, self.expert_axis)  # noqa: E731
        dt = self.dtype
        # Token -> expert batches ([X, C, E]); the einsum is the all-to-all
        # when X is sharded.
        expert_in = pin(jnp.einsum("ne,nxc->xce", x.astype(dt), dispatch.astype(dt)))
        h = jax.nn.gelu(
            pin(jnp.einsum("xce,xeh->xch", expert_in, pin(w1).astype(dt)))
            + pin(b1).astype(dt)[:, None, :]
        )
        y = (
            pin(jnp.einsum("xch,xho->xco", h, pin(w2).astype(dt)))
            + pin(b2).astype(dt)[:, None, :]
        )
        # Expert batches -> tokens, weighted by the renormalized gates.
        return jnp.einsum("xco,nxc->no", y, combine.astype(dt))
