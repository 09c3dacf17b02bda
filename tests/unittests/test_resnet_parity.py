"""ResNet-18/50 elementwise parity vs a hand-assembled torch oracle.

torchvision is not installed here, so the oracle is an independent torch
transcription of torchvision's ResNet graph (reference
avex/models/resnet.py:22-157 wraps torchvision): 7x7 stride-2 stem, 3x3
stride-2 maxpool, BasicBlock / Bottleneck stages (v1.5 — the stride sits on
the bottleneck's 3x3 conv), with torchvision's exact state-dict naming
(``layer{i}.{j}.conv{c}/bn{c}``, ``downsample.0/1``, ``fc``), which is the
converter's input contract. BatchNorm running stats are randomized so the
batch_stats conversion is load-bearing.
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

from avex_tpu.models.resnet import (  # noqa: E402
    RESNET_VARIANTS,
    ResNetModel,
    convert_resnet_state_dict,
)

pytestmark = pytest.mark.slow


class _BasicBlock(tnn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.downsample = None
        if stride != 1 or cin != width:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width, 1, stride, bias=False), tnn.BatchNorm2d(width)
            )

    def forward(self, x):
        out = tnn.functional.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        res = x if self.downsample is None else self.downsample(x)
        return tnn.functional.relu(out + res)


class _Bottleneck(tnn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)  # v1.5
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.downsample = None
        if stride != 1 or cin != width * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(width * 4),
            )

    def forward(self, x):
        out = tnn.functional.relu(self.bn1(self.conv1(x)))
        out = tnn.functional.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        res = x if self.downsample is None else self.downsample(x)
        return tnn.functional.relu(out + res)


class _TorchResNet(tnn.Module):
    """torchvision-naming ResNet."""

    def __init__(self, variant):
        super().__init__()
        block_type, depths = RESNET_VARIANTS[variant]
        block_cls = _BasicBlock if block_type == "basic" else _Bottleneck
        expansion = 1 if block_type == "basic" else 4
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        width, in_ch = 64, 64
        for stage_i, depth in enumerate(depths, start=1):
            blocks = []
            for j in range(depth):
                stride = (1 if stage_i == 1 else 2) if j == 0 else 1
                blocks.append(block_cls(in_ch, width, stride))
                in_ch = width * expansion
            setattr(self, f"layer{stage_i}", tnn.Sequential(*blocks))
            width *= 2

    def forward(self, x):
        x = tnn.functional.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        taps = []
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
            taps.append(x)
        return x, taps


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.2, n).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(rng.uniform(0.8, 1.2, n).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(rng.normal(0, 0.1, n).astype(np.float32)))


@pytest.mark.parametrize("variant", ["resnet18", "resnet50"])
def test_resnet_full_scale_parity(variant, rng):
    torch.manual_seed(0)
    oracle = _TorchResNet(variant)
    with torch.no_grad():
        _randomize_bn_stats(oracle, np.random.default_rng(11))
    oracle.eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    variables = convert_resnet_state_dict(state, variant=variant)
    model = ResNetModel(variant=variant, num_classes=None)

    x = (rng.standard_normal((2, 3, 64, 96)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_feats, ref_taps = oracle(torch.from_numpy(x))

    feats, aux = jax.jit(model.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(feats), ref_feats.numpy(), atol=1e-4, rtol=1e-3)
    # The stage taps are the wrapper's embedding-extraction surface.
    for i in (1, 4):
        np.testing.assert_allclose(
            np.asarray(aux["intermediates"][f"backbone.layer{i}"]),
            ref_taps[i - 1].numpy(),
            atol=1e-4,
            rtol=1e-3,
        )


def test_resnet_classifier_conversion(rng):
    torch.manual_seed(1)
    oracle = _TorchResNet("resnet18")
    with torch.no_grad():
        _randomize_bn_stats(oracle, np.random.default_rng(5))
    oracle.eval()
    fc = tnn.Linear(512, 7)
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    state["fc.weight"] = fc.weight.detach().numpy()
    state["fc.bias"] = fc.bias.detach().numpy()

    variables = convert_resnet_state_dict(state, variant="resnet18", num_classes=7)
    model = ResNetModel(variant="resnet18", num_classes=7)
    x = (rng.standard_normal((2, 3, 64, 64)) * 0.5).astype(np.float32)
    with torch.no_grad():
        feats, _ = oracle(torch.from_numpy(x))
        ref_logits = fc(feats.mean(dim=(2, 3))).numpy()
    logits, _aux = jax.jit(model.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-4, rtol=1e-3)
