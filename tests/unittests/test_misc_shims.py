"""Small API-parity shims: deprecated get_model, StepTimer, annotate.

The deprecated factory mirrors avex/models/get_model.py:27-183 (a warning +
delegation); StepTimer/annotate are the profiling utilities the Trainer uses.
"""

import time

import pytest

from avex_tpu.configs import ModelSpec
from avex_tpu.models.get_model import get_model
from avex_tpu.utils.profiling import StepTimer, annotate


def test_get_model_warns_and_delegates():
    spec = ModelSpec(
        name="beats",
        init_config={
            "encoder_layers": 1,
            "encoder_embed_dim": 32,
            "encoder_ffn_embed_dim": 64,
            "encoder_attention_heads": 4,
        },
        pretrained=False,
    )
    with pytest.warns(DeprecationWarning, match="build_model_from_spec"):
        model = get_model(spec, num_classes=3)
    assert model.num_classes == 3


def test_step_timer_accumulates_steps():
    timer = StepTimer()
    for _ in range(3):
        with timer.step():
            time.sleep(0.01)
    summary = timer.summary()
    assert summary["steps"] == 3
    assert summary["mean_s"] >= 0.01


def test_annotate_is_usable_as_context():
    with annotate("unit-test-region"):
        x = 1 + 1
    assert x == 2
