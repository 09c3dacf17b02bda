"""Mixture-of-experts layer (ops/moe.py) + the ``moe`` probe head.

The dense-dispatch construction must equal the naive per-token top-k expert
mixture exactly when capacity is ample, drop overflow tokens Switch-style
when it isn't, and compute identically under expert-parallel sharding
(GSPMD never changes values). avex-tpu extension — the torch reference has
no MoE anywhere."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avex_tpu.ops.moe import MoEMLP, shard_moe_params
from avex_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)

N, E, X, H, O = 16, 12, 4, 24, 10


@pytest.fixture
def tokens(rng):
    return jnp.asarray(rng.standard_normal((N, E)), jnp.float32)


def _naive_topk_mixture(params, x, k):
    """Loop-based oracle: every token routed to its top-k experts, weighted
    by renormalized router probabilities, no capacity limit."""
    logits = x @ params["router"]["kernel"] + params["router"]["bias"]
    probs = jax.nn.softmax(logits, -1)
    top_vals, top_idx = jax.lax.top_k(probs, k)
    weights = top_vals / top_vals.sum(-1, keepdims=True)
    out = np.zeros((x.shape[0], params["w2"].shape[-1]), np.float32)
    for n in range(x.shape[0]):
        for j in range(k):
            e = int(top_idx[n, j])
            h = jax.nn.gelu(x[n] @ params["w1"][e] + params["b1"][e])
            out[n] += np.asarray(weights[n, j] * (h @ params["w2"][e] + params["b2"][e]))
    return out


@pytest.mark.parametrize("k", [1, 2])
def test_moe_matches_naive_mixture_with_ample_capacity(tokens, k):
    mod = MoEMLP(num_experts=X, hidden_dim=H, out_dim=O, k=k, capacity_factor=10.0)
    variables = mod.init(jax.random.PRNGKey(0), tokens)
    out = mod.apply(variables, tokens)
    ref = _naive_topk_mixture(variables["params"], tokens, k)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_moe_expert_parallel_is_value_identical(tokens):
    mod = MoEMLP(num_experts=X, hidden_dim=H, out_dim=O, k=2, capacity_factor=10.0)
    variables = mod.init(jax.random.PRNGKey(0), tokens)
    ref = mod.apply(variables, tokens)

    mesh = make_mesh(data=2, model=4)
    ep = MoEMLP(
        num_experts=X, hidden_dim=H, out_dim=O, k=2, capacity_factor=10.0,
        mesh=mesh, expert_axis="model",
    )
    sharded_vars = {"params": shard_moe_params({"moe": variables["params"]}, mesh)["moe"]}
    out = jax.jit(lambda v, t: ep.apply(v, t))(sharded_vars, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_moe_overflow_drops_tokens_not_correctness(tokens):
    mod = MoEMLP(num_experts=X, hidden_dim=H, out_dim=O, k=2, capacity_factor=0.3)
    variables = mod.init(jax.random.PRNGKey(0), tokens)
    out = mod.apply(variables, tokens)
    full = MoEMLP(num_experts=X, hidden_dim=H, out_dim=O, k=2, capacity_factor=10.0).apply(
        variables, tokens
    )
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.max(jnp.abs(out - full))) > 0  # something was dropped


def test_moe_aux_loss_sowed_and_grads_finite(tokens):
    mod = MoEMLP(num_experts=X, hidden_dim=H, out_dim=O, k=2)
    variables = mod.init(jax.random.PRNGKey(0), tokens)
    _out, state = mod.apply(variables, tokens, mutable=["intermediates"])
    aux = state["intermediates"]["moe_aux_loss"][0]
    assert np.isfinite(float(aux)) and float(aux) > 0

    grads = jax.grad(lambda v: mod.apply(v, tokens).sum())(variables)
    assert all(
        bool(jnp.isfinite(g).all()) for g in jax.tree_util.tree_leaves(grads)
    )


def test_shard_moe_params_places_experts_only(tokens):
    mod = MoEMLP(num_experts=X, hidden_dim=H, out_dim=O)
    variables = mod.init(jax.random.PRNGKey(0), tokens)
    mesh = make_mesh(data=2, model=4)
    placed = shard_moe_params({"head": {"moe": variables["params"]}}, mesh)
    moe = placed["head"]["moe"]
    assert moe["w1"].sharding.spec[0] == "model"
    assert moe["w2"].sharding.spec[0] == "model"
    assert moe["router"]["kernel"].sharding.is_fully_replicated


def test_moe_probe_head_trains_through_finetune_trainer(rng):
    from avex_tpu.configs import TrainingParams
    from avex_tpu.evaluation.finetune import FineTuneTrainer
    from avex_tpu.probes import build_probe_from_config

    num_classes, batch = 4, 16
    batches = [
        {
            "embeddings_0": rng.standard_normal((batch, E)).astype(np.float32),
            "label": rng.integers(0, num_classes, size=batch),
        }
        for _ in range(2)
    ]

    def run(mesh):
        probe = build_probe_from_config(
            {
                "probe_type": "moe",
                "num_experts": 8,
                "moe_k": 2,
                "moe_hidden_dim": 16,
                "capacity_factor": 2.0,
                "dropout_rate": 0.0,
            },
            num_classes=num_classes,
            input_dim=E,
            seed=0,
        )
        trainer = FineTuneTrainer(
            probe, TrainingParams(train_epochs=1, lr=1e-3, batch_size=batch),
            mesh=mesh, seed=0,
        )
        result = trainer.train(list(batches))
        return float(result["history"][0]["train_loss"]), trainer

    loss_ep, trainer = run(make_mesh(data=2, model=4))
    placed = trainer._place_trainable(trainer._trainable)
    expert_leaves = [
        leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(placed)[0]
        if "moe" in [str(getattr(p, "key", "")) for p in path]
        and str(getattr(path[-1], "key", "")) in ("w1", "w2")
    ]
    assert expert_leaves and all(
        leaf.sharding.spec[0] == "model" for leaf in expert_leaves
    )
    loss_solo, _ = run(make_mesh(data=1, model=1, devices=jax.devices()[:1]))
    np.testing.assert_allclose(loss_ep, loss_solo, rtol=1e-4, atol=1e-5)


def test_moe_dispatch_envelope_guard(tokens):
    """The dense [k·N, X, C] dispatch is O(k²·cf·N²) memory; MoEMLP refuses
    to trace past max_dispatch_elements instead of silently OOMing (round-4
    verdict task #5). Probe-scale workloads sit far inside the default cap."""
    # Tiny cap binds immediately, with an actionable message.
    mod = MoEMLP(num_experts=X, hidden_dim=H, out_dim=O, max_dispatch_elements=8)
    with pytest.raises(ValueError, match="max_dispatch_elements"):
        mod.init(jax.random.PRNGKey(0), tokens)

    # The default cap does NOT bind at probe scale (N=4096, X=8, k=2, cf=2
    # -> ~134M elements, half the 2**28 default) — checked without tracing.
    n, x_, k, cf = 4096, 8, 2, 2.0
    cap = max(1, min(int(np.ceil(k * n / x_ * cf)), n))
    assert k * n * x_ * cap < MoEMLP.max_dispatch_elements

    # Encoder scale (N = B*T = 128*500) DOES bind: the guard is the
    # documented envelope, not a no-op.
    n = 128 * 500
    cap = max(1, min(int(np.ceil(k * n / x_ * cf)), n))
    assert k * n * x_ * cap > MoEMLP.max_dispatch_elements
