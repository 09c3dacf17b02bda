"""Bird-MAE ViT trunk elementwise parity vs a hand-assembled torch oracle.

The reference Bird-MAE is HF remote code (``DBD-research-group/Bird-MAE-*``,
reference avex/models/birdmae.py:17-67), unreachable offline. The oracle is
an independent torch transcription of the AudioMAE-style encoder the
checkpoints describe — 16x16 conv patch embed, MAE fixed 2-D sin-cos
positions, CLS token, pre-norm ViT blocks with fused-qkv attention, final LN
— emitting timm/MAE state-dict naming (``patch_embed.proj``,
``blocks.{i}.attn.qkv`` …), the converter's input contract. Run at the
full base width/depth (768 x 12).
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

from avex_tpu.models.birdmae import BirdMAEModel, convert_birdmae_state_dict  # noqa: E402

pytestmark = pytest.mark.slow


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


class _TorchBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, 3 * dim)
        self.attn.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, self.heads, c // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * (c // self.heads) ** -0.5
        att = att.softmax(dim=-1)
        out = (att @ v).transpose(1, 2).reshape(b, n, c)
        proj_out = self.attn.proj(out)
        x = x + proj_out
        x = x + self.mlp.fc2(tnn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x, proj_out


class _TorchBirdMAE(tnn.Module):
    """AudioMAE-style encoder with timm/MAE state-dict naming."""

    def __init__(self, dim=768, depth=12, heads=12, patch=16):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(1, dim, patch, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(_TorchBlock(dim, heads) for _ in range(depth))
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.dim = dim

    def forward(self, spec):
        # spec: (B, T, F) -> image (B, 1, T, F), matching the flax NHWC conv
        img = spec[:, None]
        h = self.patch_embed.proj(img)  # (B, D, gh, gw)
        b, d, gh, gw = h.shape
        tokens = h.permute(0, 2, 3, 1).reshape(b, gh * gw, d)
        tokens = tokens + _torch_sincos_2d(self.dim, gh, gw)[None]
        cls = self.cls_token.expand(b, -1, -1)
        tokens = torch.cat([cls, tokens], dim=1)
        taps = []
        for blk in self.blocks:
            tokens, proj_out = blk(tokens)
            taps.append(proj_out)
        return self.norm(tokens), taps


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    oracle = _TorchBirdMAE()
    oracle.eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    variables = convert_birdmae_state_dict(state)
    model = BirdMAEModel(dim=768, depth=12, heads=12, num_classes=None)
    return oracle, model, variables


def test_birdmae_trunk_full_scale_parity(pair, rng):
    oracle, model, variables = pair
    # 256 frames x 128 mels -> 16x8 = 128 patch tokens + CLS.
    spec = (rng.standard_normal((2, 256, 128)) * 0.5).astype(np.float32)

    with torch.no_grad():
        ref_tokens, ref_taps = oracle(torch.from_numpy(spec))

    tokens, aux = jax.jit(model.apply)(variables, spec)
    np.testing.assert_allclose(
        np.asarray(tokens), ref_tokens.numpy(), atol=2e-4, rtol=1e-4
    )
    # Per-block attn.proj taps — the embedding-extraction surface.
    for i in (0, 6, 11):
        np.testing.assert_allclose(
            np.asarray(aux["intermediates"][f"model.blocks.{i}.attn.proj"]),
            ref_taps[i].numpy(),
            atol=2e-4,
            rtol=1e-4,
        )
    # CLS pooled embedding (what the wrapper reports, birdmae.py:42).
    np.testing.assert_allclose(
        np.asarray(aux["pooled"]), ref_tokens[:, 0].numpy(), atol=2e-4, rtol=1e-4
    )
