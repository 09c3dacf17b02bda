"""EfficientNet-B0 elementwise parity vs a hand-assembled torch oracle.

torchvision is not installed here, so the oracle is an independent torch
transcription of torchvision's EfficientNet graph (reference
avex/models/efficientnet.py:61-68 wraps torchvision B0/B1): stem
Conv2dNormActivation, MBConv blocks (expand → depthwise → squeeze-excitation
→ project) with SiLU and BatchNorm, head conv — emitting torchvision's exact
state-dict naming (``features.{i}.{j}.block.{k}.0/1``, SE ``fc1/fc2``,
``classifier.1``), which is the converter's input contract. Random init
including randomized BatchNorm running stats, so the batch_stats conversion
is exercised for real.
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

from avex_tpu.models.efficientnet import (  # noqa: E402
    EfficientNetModel,
    convert_efficientnet_state_dict,
    stage_config,
)

pytestmark = pytest.mark.slow


class _ConvBNAct(tnn.Sequential):
    """torchvision Conv2dNormActivation: conv(.0) + bn(.1) [+ SiLU(.2)]."""

    def __init__(self, cin, cout, k, s=1, groups=1, act=True):
        layers = [
            tnn.Conv2d(cin, cout, k, s, padding=(k - 1) // 2, groups=groups, bias=False),
            tnn.BatchNorm2d(cout, eps=1e-5),
        ]
        if act:
            layers.append(tnn.SiLU(inplace=False))
        super().__init__(*layers)


class _SqueezeExcitation(tnn.Module):
    """torchvision SqueezeExcitation (fc1/fc2 1x1 convs, SiLU, sigmoid)."""

    def __init__(self, channels, squeeze):
        super().__init__()
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc1 = tnn.Conv2d(channels, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, channels, 1)

    def forward(self, x):
        scale = self.fc2(tnn.functional.silu(self.fc1(self.avgpool(x))))
        return x * torch.sigmoid(scale)


class _MBConv(tnn.Module):
    def __init__(self, cin, cout, t, s, k):
        super().__init__()
        expanded = cin * t
        layers = []
        if t != 1:
            layers.append(_ConvBNAct(cin, expanded, 1))
        layers.append(_ConvBNAct(expanded, expanded, k, s, groups=expanded))
        layers.append(_SqueezeExcitation(expanded, max(1, cin // 4)))
        layers.append(_ConvBNAct(expanded, cout, 1, act=False))
        self.block = tnn.Sequential(*layers)
        self.use_res = s == 1 and cin == cout

    def forward(self, x):
        out = self.block(x)
        return out + x if self.use_res else out


class _TorchEfficientNet(tnn.Module):
    """torchvision-naming EfficientNet-B0 (eval mode; stochastic depth is
    identity in eval, so it is omitted)."""

    def __init__(self, variant="b0"):
        super().__init__()
        stages = stage_config(variant)
        feats = [_ConvBNAct(3, 32, 3, 2)]
        in_ch = 32
        for t, c, n, s, k in stages:
            blocks = []
            for j in range(n):
                blocks.append(_MBConv(in_ch, c, t, s if j == 0 else 1, k))
                in_ch = c
            feats.append(tnn.Sequential(*blocks))
        feats.append(_ConvBNAct(in_ch, 1280, 1))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        return self.features(x)


def _randomize_bn_stats(module, rng):
    """Random running stats + affine params so conversion is load-bearing."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.2, n).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(rng.uniform(0.8, 1.2, n).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(rng.normal(0, 0.1, n).astype(np.float32)))


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    oracle = _TorchEfficientNet()
    with torch.no_grad():
        _randomize_bn_stats(oracle, np.random.default_rng(7))
    oracle.eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    variables = convert_efficientnet_state_dict(state, variant="b0")
    model = EfficientNetModel(variant="b0", num_classes=None)
    return oracle, model, variables


def test_efficientnet_b0_full_scale_parity(pair, rng):
    oracle, model, variables = pair
    x = (rng.standard_normal((2, 3, 64, 96)) * 0.5).astype(np.float32)

    with torch.no_grad():
        ref_feats = oracle(torch.from_numpy(x)).numpy()  # (B, 1280, H', W')

    feats, aux = jax.jit(model.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(feats), ref_feats, atol=1e-4, rtol=1e-3)


def test_efficientnet_b0_intermediate_taps_parity(pair, rng):
    """The wrapper's embedding taps (model.features.{i}.{j}.block.3.0 — the
    raw projection conv output before BN, efficientnet.py:82-114) match the
    oracle's corresponding pre-BN activations."""
    oracle, model, variables = pair
    x = (rng.standard_normal((2, 3, 64, 96)) * 0.5).astype(np.float32)
    _feats, aux = jax.jit(model.apply)(variables, x)

    # Recompute the oracle's stage-2 block-0 projection conv input by
    # running the graph up to that point.
    with torch.no_grad():
        h = torch.from_numpy(x)
        h = oracle.features[0](h)
        h = oracle.features[1](h)  # stage 1
        blk = oracle.features[2][0]  # stage 2, block 0 (has expansion)
        inner = blk.block
        pre_proj = inner[2](inner[1](inner[0](h)))
        ref_tap = inner[3][0](pre_proj).numpy()  # projection conv, pre-BN

    tap = np.asarray(aux["intermediates"]["model.features.2.0.block.3.0"])
    np.testing.assert_allclose(tap, ref_tap, atol=1e-4, rtol=1e-3)


def test_efficientnet_classifier_conversion(rng):
    """classifier.1 (torchvision Sequential(Dropout, Linear)) maps onto the
    flax classifier head."""
    torch.manual_seed(1)
    oracle = _TorchEfficientNet()
    with torch.no_grad():
        _randomize_bn_stats(oracle, np.random.default_rng(3))
    oracle.eval()
    head = tnn.Linear(1280, 5)
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    state["classifier.1.weight"] = head.weight.detach().numpy()
    state["classifier.1.bias"] = head.bias.detach().numpy()

    variables = convert_efficientnet_state_dict(state, variant="b0", num_classes=5)
    model = EfficientNetModel(variant="b0", num_classes=5)
    x = (rng.standard_normal((2, 3, 64, 64)) * 0.5).astype(np.float32)
    with torch.no_grad():
        pooled = oracle(torch.from_numpy(x)).mean(dim=(2, 3))
        ref_logits = head(pooled).numpy()
    logits, _aux = jax.jit(model.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-4, rtol=1e-3)
