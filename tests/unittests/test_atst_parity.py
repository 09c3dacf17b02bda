"""ATST-Frame elementwise parity vs the reference torch implementation.

The reference ships a fully self-contained FrameAST
(/root/reference/avex/models/atst_frame/atst_frame.py:759) which we load as a
numerical oracle (lightning/torchaudio stubbed), randomly initialize, convert
with ``convert_atst_state_dict``, and compare against our Flax FrameASTModel
at full base scale — the same technique as the BEATs parity suite.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from utils.reference_oracle import load_reference_atst  # noqa: E402

torch = pytest.importorskip("torch")

from avex_tpu.models.atst import FrameASTModel, convert_atst_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def oracle_pair():
    """(reference FrameAST_base in eval mode, converted flax variables)."""
    ref = load_reference_atst()
    torch.manual_seed(0)
    enc = ref.FrameAST_base(drop_path_rate=0.0)
    enc.eval()
    state = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    converted = convert_atst_state_dict(state)
    model = FrameASTModel()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 64, 40), np.float32)
    )
    params = dict(variables["params"])
    params.update(converted["params"])
    return enc, model, {"params": params}


@pytest.mark.slow
def test_timestamp_embedding_parity(oracle_pair, rng):
    """Full forward (patch embed → 12 blocks → per-block norm concat)."""
    enc, model, variables = oracle_pair
    spec = (rng.standard_normal((2, 64, 200)) * 0.5).astype(np.float32)

    with torch.no_grad():
        mel = torch.from_numpy(spec)[:, None]  # (B, 1, 64, T)
        length = torch.tensor([200, 200])
        ref_out = enc.get_intermediate_layers(mel, length, n=12, scene=False).numpy()

    timestamp, aux = jax.jit(model.apply)(variables, spec)
    np.testing.assert_allclose(np.asarray(timestamp), ref_out, atol=2e-4, rtol=1e-4)
    assert timestamp.shape == (2, 50, 768 * 12)


@pytest.mark.slow
def test_scene_embedding_parity(oracle_pair, rng):
    """scene=True path: per-block length-masked mean of normed outputs."""
    enc, model, variables = oracle_pair
    spec = (rng.standard_normal((2, 64, 120)) * 0.5).astype(np.float32)

    with torch.no_grad():
        mel = torch.from_numpy(spec)[:, None]
        length = torch.tensor([120, 120])
        ref_scene = enc.get_intermediate_layers(mel, length, n=12, scene=True).numpy()

    _, aux = jax.jit(model.apply)(variables, spec)
    np.testing.assert_allclose(
        np.asarray(aux["scene_embedding"]), ref_scene, atol=2e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_pos_embed_cut_offset(oracle_pair, rng):
    """Regression: the converted pos_embed must match the reference's
    pos_embed[:, 1:T+1] 'cut' slice (class-token slot stripped)."""
    enc, _model, variables = oracle_pair
    ours = np.asarray(variables["params"]["pos_embed"])
    ref = enc.pos_embed.detach().numpy()
    np.testing.assert_array_equal(ours, ref[:, 1:])
