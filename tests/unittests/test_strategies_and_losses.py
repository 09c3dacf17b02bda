"""Direct unit tests for training losses, strategies, tracker, and schedules.

Mirrors the reference's dedicated loss/strategy coverage
(reference avex/training/losses.py:107-358, training_strategies.py:52-301,
training_utils.py:14-60) with torch as the loss-formula oracle where the
reference delegates to torch functionals.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avex_tpu.training.losses import (
    MAX_LOGIT_SCALE,
    bce_loss,
    build_criterion,
    clip_loss,
    cross_entropy_loss,
    focal_loss,
)
from avex_tpu.training.metrics_tracker import MetricsTracker
from avex_tpu.training.optimizers import build_scheduler
from avex_tpu.training.strategies import (
    CLIPStrategy,
    EATSSLStrategy,
    SupervisedStrategy,
    make_strategy,
)

# ---------------------------------------------------------------------------
# losses vs torch oracles
# ---------------------------------------------------------------------------


def _rand_logits_targets(n=16, c=7, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((n, c)).astype(np.float32) * 2.0
    idx = rng.integers(0, c, size=n)
    return logits, idx


def test_cross_entropy_matches_torch():
    import torch
    import torch.nn.functional as F

    logits, idx = _rand_logits_targets()
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(idx)))
    theirs = float(F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(idx)))
    assert ours == pytest.approx(theirs, rel=1e-6)

    # one-hot targets give the identical value
    onehot = np.eye(logits.shape[1], dtype=np.float32)[idx]
    ours_oh = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(onehot)))
    assert ours_oh == pytest.approx(theirs, rel=1e-6)


def test_bce_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((8, 5)).astype(np.float32) * 3.0
    targets = (rng.uniform(size=(8, 5)) > 0.5).astype(np.float32)
    ours = float(bce_loss(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = float(
        F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(targets)
        )
    )
    assert ours == pytest.approx(theirs, rel=1e-6)


def test_focal_matches_reference_formula():
    # The reference uses the torchvision sigmoid focal formulation
    # (reference avex/training/losses.py:292-341); recompute it in torch.
    import torch

    rng = np.random.default_rng(2)
    logits = rng.standard_normal((12, 4)).astype(np.float32) * 2.0
    targets = (rng.uniform(size=(12, 4)) > 0.6).astype(np.float32)
    gamma, alpha = 2.0, 0.25

    lt, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    p = torch.sigmoid(lt)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    alpha_t = alpha * tt + (1 - alpha) * (1 - tt)
    expected = float((alpha_t * (1 - p_t) ** gamma * ce).mean())

    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma, alpha))
    assert ours == pytest.approx(expected, rel=1e-5)


def test_focal_downweights_easy_examples():
    # An easy (confident, correct) example must contribute less than under BCE.
    easy = jnp.asarray([[8.0]])
    target = jnp.asarray([[1.0]])
    assert float(focal_loss(easy, target)) < float(bce_loss(easy, target))


def test_clip_loss_aligned_features_and_scale_clamp():
    # Orthonormal, perfectly aligned audio/text features with a hot temperature
    # drive the symmetric InfoNCE to ~0 and both top-1 accuracies to n.
    n = 6
    feats = jnp.eye(n, 16, dtype=jnp.float32)
    loss, aux = clip_loss(feats, feats, jnp.asarray(10.0))  # clamped to ln(100)
    assert float(loss) < 0.05
    assert int(aux["a2t_correct"]) == n and int(aux["t2a_correct"]) == n

    # the clamp: log-scale 10 behaves exactly like log-scale ln(100)
    loss_clamped, _ = clip_loss(feats, feats, jnp.asarray(MAX_LOGIT_SCALE))
    assert float(loss) == pytest.approx(float(loss_clamped), abs=1e-7)


def test_clip_loss_is_symmetric():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))
    scale = jnp.asarray(2.0)
    loss_at, _ = clip_loss(a, t, scale)
    loss_ta, _ = clip_loss(t, a, scale)
    assert float(loss_at) == pytest.approx(float(loss_ta), rel=1e-6)


def test_build_criterion_dispatch():
    assert build_criterion("clip") is clip_loss
    assert build_criterion("focal") is focal_loss
    with pytest.raises(ValueError, match="Unknown loss"):
        build_criterion("hinge")


# ---------------------------------------------------------------------------
# strategies over a fake apply_fn
# ---------------------------------------------------------------------------


def test_supervised_strategy_loss_and_counts():
    logits = jnp.asarray([[4.0, 0.0, 0.0], [0.0, 4.0, 0.0], [4.0, 0.0, 0.0]])

    def apply_fn(variables, wav, mask, rngs=None, **kwargs):
        return logits

    batch = {"raw_wav": jnp.zeros((3, 10)), "label": jnp.asarray([0, 1, 2])}
    strategy = SupervisedStrategy("cross_entropy")
    loss, metrics = strategy.forward_loss(apply_fn, {}, {}, batch, None, train=False)
    assert float(loss) == pytest.approx(
        float(cross_entropy_loss(logits, batch["label"])), rel=1e-6
    )
    assert int(metrics["correct"]) == 2  # third prediction is wrong
    assert int(metrics["count"]) == 3
    assert int(metrics["nonfinite_logits"]) == 0


def test_supervised_strategy_flags_nonfinite_outputs():
    bad = jnp.asarray([[jnp.nan, 1.0], [jnp.inf, 0.0]])

    def apply_fn(variables, wav, mask, rngs=None, **kwargs):
        return bad

    batch = {"raw_wav": jnp.zeros((2, 4)), "label": jnp.asarray([0, 1])}
    _, metrics = SupervisedStrategy("bce").forward_loss(
        apply_fn, {}, {}, batch, None, train=False
    )
    assert int(metrics["nonfinite_logits"]) == 2


def test_clip_strategy_metrics():
    feats = jnp.eye(4, 8, dtype=jnp.float32)

    def apply_fn(variables, wav, tokens, mask, deterministic=True, rngs=None):
        return {
            "audio_features": feats,
            "text_features": feats,
            "logit_scale": jnp.asarray(MAX_LOGIT_SCALE),
        }

    batch = {"raw_wav": jnp.zeros((4, 10)), "text_tokens": jnp.zeros((4, 3), jnp.int32)}
    loss, metrics = CLIPStrategy().forward_loss(apply_fn, {}, {}, batch, None, False)
    assert int(metrics["a2t_correct"]) == 4
    assert int(metrics["t2a_correct"]) == 4
    assert int(metrics["count"]) == 4
    assert float(loss) < 0.05


def test_eat_ssl_strategy_normalizes_by_sample_size():
    def apply_fn(variables, wav, mask, deterministic=True, rngs=None):
        return {
            "losses": {"main": jnp.asarray([2.0, 4.0]), "decay": jnp.asarray(6.0)},
            "sample_size": 4,
        }

    batch = {"raw_wav": jnp.zeros((4, 10))}
    loss, metrics = EATSSLStrategy().forward_loss(apply_fn, {}, {}, batch, None, True)
    assert float(loss) == pytest.approx((2 + 4 + 6) / 4)
    assert float(metrics["loss_main"]) == pytest.approx(6.0)
    assert float(metrics["loss_decay"]) == pytest.approx(6.0)
    assert int(metrics["count"]) == 4


def test_make_strategy_dispatch():
    assert isinstance(make_strategy("supervised"), SupervisedStrategy)
    assert isinstance(make_strategy("text"), CLIPStrategy)
    assert isinstance(make_strategy("self_supervised"), EATSSLStrategy)
    with pytest.raises(ValueError, match="Unknown label_type"):
        make_strategy("semi_supervised")


# ---------------------------------------------------------------------------
# MetricsTracker accumulation semantics
# ---------------------------------------------------------------------------


def test_tracker_supervised_weighted_loss_and_primary():
    tracker = MetricsTracker("supervised", ["accuracy"], num_classes=2)
    logits1 = np.asarray([[2.0, 0.0], [2.0, 0.0]], np.float32)  # both predict 0
    logits2 = np.asarray([[0.0, 2.0]], np.float32)  # predicts 1
    tracker.update(
        1.0,
        {"count": 2, "correct": 2, "logits": logits1},
        labels=np.asarray([0, 0]),
    )
    tracker.update(
        4.0,
        {"count": 1, "correct": 0, "logits": logits2},
        labels=np.asarray([0]),
    )
    out = tracker.epoch_metrics()
    assert out["loss"] == pytest.approx((1.0 * 2 + 4.0 * 1) / 3)
    assert out["accuracy_running"] == pytest.approx(2 / 3)
    assert out["accuracy"] == pytest.approx(2 / 3)
    assert tracker.primary_metric() == pytest.approx(2 / 3)

    tracker.reset()
    assert tracker.epoch_metrics()["samples"] == 0.0


def test_tracker_clip_mode_accuracies():
    tracker = MetricsTracker("clip")
    tracker.update(0.5, {"count": 4, "a2t_correct": 3, "t2a_correct": 2})
    tracker.update(0.5, {"count": 4, "a2t_correct": 4, "t2a_correct": 4})
    out = tracker.epoch_metrics()
    assert out["a2t_accuracy"] == pytest.approx(7 / 8)
    assert out["t2a_accuracy"] == pytest.approx(6 / 8)
    assert tracker.primary_metric() == pytest.approx(0.5 * (7 / 8 + 6 / 8))


def test_tracker_ssl_mode_per_component_losses():
    tracker = MetricsTracker("ssl")
    tracker.update(1.0, {"count": 2, "loss_main": 4.0, "loss_aux": 1.0})
    tracker.update(1.0, {"count": 2, "loss_main": 2.0, "loss_aux": 1.0})
    out = tracker.epoch_metrics()
    assert out["loss_main"] == pytest.approx(6 / 4)
    assert out["loss_aux"] == pytest.approx(2 / 4)
    # ssl primary is negated loss (lower loss = better checkpoint)
    assert tracker.primary_metric() == pytest.approx(-out["loss"])


def test_tracker_warns_on_nonfinite(caplog):
    tracker = MetricsTracker("supervised")
    with caplog.at_level(logging.WARNING):
        tracker.update(float("nan"), {"count": 1})
        tracker.update(
            1.0,
            {
                "count": 1,
                "nonfinite_logits": 1,
                "logits": np.asarray([[np.nan, 1.0]], np.float32),
            },
        )
    text = caplog.text
    assert "Non-finite loss" in text
    assert "non-finite values in model outputs" in text


# ---------------------------------------------------------------------------
# LR schedules: exact values at the landmarks
# ---------------------------------------------------------------------------


def test_cosine_schedule_landmarks():
    sched = build_scheduler("cosine", base_lr=1e-3, warmup_steps=10, total_steps=100, min_lr=1e-5)
    assert float(sched(0)) == pytest.approx(0.0, abs=1e-9)
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sched(100)) == pytest.approx(1e-5, rel=1e-3)
    # midpoint of the cosine arc sits strictly between peak and floor
    mid = float(sched(55))
    assert 1e-5 < mid < 1e-3


def test_linear_schedule_landmarks():
    sched = build_scheduler("linear", base_lr=2e-3, warmup_steps=4, total_steps=24, min_lr=0.0)
    assert float(sched(0)) == pytest.approx(0.0, abs=1e-9)
    assert float(sched(2)) == pytest.approx(1e-3, rel=1e-5)
    assert float(sched(4)) == pytest.approx(2e-3, rel=1e-6)
    assert float(sched(24)) == pytest.approx(0.0, abs=1e-9)


def test_none_schedule_constant_and_warmup():
    const = build_scheduler("none", base_lr=5e-4)
    assert float(const(0)) == float(const(1000)) == pytest.approx(5e-4)
    warm = build_scheduler("none", base_lr=5e-4, warmup_steps=8)
    assert float(warm(0)) == pytest.approx(0.0, abs=1e-9)
    assert float(warm(8)) == pytest.approx(5e-4, rel=1e-6)
    with pytest.raises(ValueError, match="Unknown scheduler"):
        build_scheduler("polynomial")
