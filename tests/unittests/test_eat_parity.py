"""EAT ViT backbone elementwise parity vs a hand-rolled torch oracle.

The reference EAT backbone is HF remote code (data2vec-2.0 image encoder,
``worstchan/EAT-base_epoch30_pretrain`` — reference avex/models/eat_hf.py),
which cannot be fetched offline. This oracle is an independent torch
transcription of that architecture (16x16 conv patch embed, MAE fixed 2-D
sin-cos positions, pre-norm LN, CLS token, pre-norm blocks with fused-qkv
attention and 4x GELU MLP, final LN) using the reference's state-dict naming —
it validates the converter's transposes and the Flax math end-to-end at base
scale. Conversion drift vs the real published checkpoint remains gated on
network access (see tests/integration/test_official_fingerprints_harness.py).
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

from avex_tpu.models.eat import EATModel, convert_eat_state_dict  # noqa: E402


def _torch_sincos_2d(embed_dim, grid_h, grid_w):
    """MAE get_2d_sincos_pos_embed (transcribed from the published formula)."""

    def one_d(dim, positions):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("p,d->pd", positions.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid = np.meshgrid(np.arange(grid_w, dtype=np.float64), np.arange(grid_h, dtype=np.float64))
    grid = np.stack(grid)
    emb = np.concatenate([one_d(embed_dim // 2, grid[0]), one_d(embed_dim // 2, grid[1])], axis=1)
    return torch.from_numpy(emb.astype(np.float32))


class _TorchAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, c // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (c // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class _TorchMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(tnn.functional.gelu(self.fc1(x)))


class _TorchBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = _TorchAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TorchMlp(dim, 4 * dim)

    def forward(self, x):
        proj_out = self.attn(self.norm1(x))
        x = x + proj_out
        x = x + self.mlp(self.norm2(x))
        return x, proj_out


class _TorchPatchEmbed(tnn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = tnn.Conv2d(1, dim, kernel_size=patch, stride=patch)


class _TorchEAT(tnn.Module):
    """data2vec-2.0 image encoder skeleton with reference state-dict naming."""

    def __init__(self, dim=768, depth=12, heads=12, patch=16):
        super().__init__()
        inner = tnn.Module()
        inner.patch_embed = _TorchPatchEmbed(dim, patch)
        inner.pre_norm = tnn.LayerNorm(dim, eps=1e-6)
        inner.blocks = tnn.ModuleList(_TorchBlock(dim, heads) for _ in range(depth))
        inner.norm = tnn.LayerNorm(dim, eps=1e-6)
        inner.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.model = inner
        self.patch = patch
        self.dim = dim

    def forward(self, spec):
        # spec: (B, F, T) -> image (B, 1, F, T)
        img = spec[:, None]
        h = self.model.patch_embed.proj(img)  # (B, D, gh, gw)
        b, d, gh, gw = h.shape
        tokens = h.permute(0, 2, 3, 1).reshape(b, gh * gw, d)
        tokens = tokens + _torch_sincos_2d(self.dim, gh, gw)[None]
        tokens = self.model.pre_norm(tokens)
        cls = self.model.cls_token.expand(b, -1, -1)
        tokens = torch.cat([cls, tokens], dim=1)
        taps = []
        for blk in self.model.blocks:
            tokens, proj_out = blk(tokens)
            taps.append(proj_out)
        return self.model.norm(tokens), taps


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = _TorchEAT()
    ref.eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_eat_state_dict(state)
    model = EATModel()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 128, 32), np.float32)
    )
    params = dict(variables["params"])
    params.update(converted["params"])
    return ref, model, {"params": params}


@pytest.mark.slow
def test_eat_backbone_parity(pair, rng):
    ref, model, variables = pair
    spec = (rng.standard_normal((2, 128, 64)) * 0.5).astype(np.float32)

    with torch.no_grad():
        ref_tokens, ref_taps = ref(torch.from_numpy(spec))

    tokens, aux = jax.jit(model.apply)(variables, spec)
    np.testing.assert_allclose(
        np.asarray(tokens), ref_tokens.numpy(), atol=2e-4, rtol=1e-4
    )
    # Per-block attn.proj taps — the layer-extraction surface (eat_hf.py:220-236).
    for i in (0, 5, 11):
        np.testing.assert_allclose(
            np.asarray(aux["intermediates"][f"backbone.model.blocks.{i}.attn.proj"]),
            ref_taps[i].numpy(),
            atol=2e-4,
            rtol=1e-4,
        )
