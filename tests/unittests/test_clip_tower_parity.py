"""Full-scale CLIP tower parity vs a composed torch oracle.

Round-2 verdict asked for a full-scale tolerance regression of the CLIP
tower (the component tests cover RoBERTa and EfficientNet separately). Here
the COMPOSED tower — EfficientNet-B0 audio encoder → mean pool → MLP
projection, full RoBERTa-base (HF transformers torch, random init) → CLS →
MLP projection, L2 normalization, clamped logit scale — is checked
elementwise against the torch assembly at full scale (reference
avex/models/clip.py:61-139).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from torch import nn as tnn  # noqa: E402

from avex_tpu.models.clip import (  # noqa: E402
    CLIPModule,
    convert_roberta_state_dict,
)
from avex_tpu.models.efficientnet import convert_efficientnet_state_dict  # noqa: E402
from tests.unittests.test_efficientnet_parity import (  # noqa: E402
    _randomize_bn_stats,
    _TorchEfficientNet,
)

pytestmark = pytest.mark.slow


def _proj_state(proj: tnn.Module) -> dict:
    return {
        "fc1": {
            "kernel": jnp.asarray(proj.fc1.weight.detach().numpy().T),
            "bias": jnp.asarray(proj.fc1.bias.detach().numpy()),
        },
        "fc2": {
            "kernel": jnp.asarray(proj.fc2.weight.detach().numpy().T),
            "bias": jnp.asarray(proj.fc2.bias.detach().numpy()),
        },
    }


class _TorchProjection(tnn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.fc1 = tnn.Linear(cin, dim)
        self.fc2 = tnn.Linear(dim, dim)

    def forward(self, x):
        return self.fc2(tnn.functional.relu(self.fc1(x)))


def test_clip_tower_full_scale_parity(rng):
    torch.manual_seed(0)
    # Audio tower: torchvision-naming EfficientNet-B0 oracle.
    audio_oracle = _TorchEfficientNet()
    with torch.no_grad():
        _randomize_bn_stats(audio_oracle, np.random.default_rng(23))
    audio_oracle.eval()

    # Text tower: FULL RoBERTa-base via installed HF transformers (torch).
    cfg = transformers.RobertaConfig(
        vocab_size=50265, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=514, type_vocab_size=1, layer_norm_eps=1e-5,
    )
    text_oracle = transformers.RobertaModel(cfg, add_pooling_layer=False).eval()

    audio_proj = _TorchProjection(1280, 512).eval()
    text_proj = _TorchProjection(768, 512).eval()

    # Convert everything into one CLIPModule variable tree.
    eff = convert_efficientnet_state_dict(
        {k: v.detach().numpy() for k, v in audio_oracle.state_dict().items()}
    )
    rob = convert_roberta_state_dict(
        {k: v.detach().numpy() for k, v in text_oracle.state_dict().items()}
    )
    params = {
        "audio_encoder": eff["params"],
        "text_encoder": rob["params"],
        "audio_projection": _proj_state(audio_proj),
        "text_projection": _proj_state(text_proj),
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }
    variables = {"params": params, "batch_stats": {"audio_encoder": eff["batch_stats"]}}
    module = CLIPModule(efficientnet_variant="b0", projection_dim=512)

    spec = (rng.standard_normal((2, 3, 64, 96)) * 0.5).astype(np.float32)
    ids = np.full((2, 12), 1, dtype=np.int32)  # pad = 1
    ids[0, :8] = [0, 100, 523, 9000, 42, 7, 301, 2]
    ids[1, :5] = [0, 88, 12000, 5, 2]
    mask = (ids != 1).astype(np.int32)

    with torch.no_grad():
        a_feat = audio_oracle(torch.from_numpy(spec)).mean(dim=(2, 3))
        a_emb = audio_proj(a_feat)
        a_emb = a_emb / a_emb.norm(dim=-1, keepdim=True)
        t_hidden = text_oracle(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state
        t_emb = text_proj(t_hidden[:, 0])
        t_emb = t_emb / t_emb.norm(dim=-1, keepdim=True)

    out, aux = module.apply(variables, spec, ids)
    np.testing.assert_allclose(
        np.asarray(out["audio_features"]), a_emb.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["text_features"]), t_emb.numpy(), atol=2e-4, rtol=1e-3
    )
    # Clamped logit scale + the similarity matrix both towers feed.
    assert float(out["logit_scale"]) <= math.log(100.0) + 1e-6
    ref_sim = (a_emb @ t_emb.T).numpy()
    ours_sim = np.asarray(out["audio_features"]) @ np.asarray(out["text_features"]).T
    np.testing.assert_allclose(ours_sim, ref_sim, atol=2e-4, rtol=1e-3)
