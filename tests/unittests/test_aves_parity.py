"""AVES elementwise oracle vs the torch HuBERT implementation.

AVES *is* HuBERT-base over raw waveforms (reference avex/models/aves_model.py
wraps ``torchaudio.models.wav2vec2_model`` with the hardcoded HuBERT-base
config, :19-57). torchaudio is not installed here, but ``transformers``
ships a faithful torch HuBERT whose state-dict naming matches torchaudio's
modulo two prefix renames — so a random-init full-size ``HubertModel`` is a
real elementwise oracle for both our Flax implementation and the
``convert_aves_state_dict`` weight converter (mirrors the reference's
oracle technique, tests/unittests/test_batched_fbank.py:1-40).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow


def _hf_to_torchaudio_keys(state_dict):
    """HF HubertModel names → torchaudio wav2vec2 names (what the published
    AVES ``*.torchaudio.pt`` checkpoints and our converter use)."""
    out = {}
    for key, value in state_dict.items():
        if key == "masked_spec_embed":  # pre-training artifact, not in AVES
            continue
        k = key
        if k.startswith("feature_projection."):
            k = "encoder." + k
        elif k.startswith("encoder."):
            k = k.replace("encoder.", "encoder.transformer.", 1)
        out[k] = value.detach().numpy()
    return out


@pytest.fixture(scope="module")
def hubert():
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(0)
    config = HubertConfig()  # defaults == HuBERT-base == AVES
    model = HubertModel(config).eval()
    return model


def test_aves_matches_torch_hubert_elementwise(hubert, rng):
    import jax

    from avex_tpu.models.aves import AVESConfig, AVESModel, convert_aves_state_dict
    from avex_tpu.utils.tree import merge_converted_params

    wav = (rng.standard_normal((2, 8000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        expected = hubert(torch.from_numpy(wav)).last_hidden_state.numpy()

    module = AVESModel(cfg=AVESConfig(), num_classes=None)
    variables = module.init(jax.random.PRNGKey(0), np.zeros((1, 2000), np.float32))
    converted = convert_aves_state_dict(_hf_to_torchaudio_keys(hubert.state_dict()))
    variables = merge_converted_params(variables, converted, strict=True)

    features, aux = module.apply(variables, wav)
    assert features.shape == expected.shape  # (2, 24, 768)
    np.testing.assert_allclose(np.asarray(features), expected, rtol=1e-4, atol=1e-4)
    assert len(aux["intermediates"]) == 12


def test_aves_wrapper_loads_oracle_weights(hubert, rng):
    """Wrapper-level: load_state_dict on the converted dump, then the hooked
    per-layer FFN intermediates match torch's feed_forward outputs."""
    from avex_tpu.models.aves import Model

    wav = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)
    captured = {}

    def grab(i):
        def hook(_mod, _inp, out):
            captured[i] = out.detach().numpy()

        return hook

    handles = [
        layer.feed_forward.output_dense.register_forward_hook(grab(i))
        for i, layer in enumerate(hubert.encoder.layers)
    ]
    with torch.no_grad():
        hubert(torch.from_numpy(wav))
    for h in handles:
        h.remove()

    model = Model(pretrained=False)
    model.load_state_dict(_hf_to_torchaudio_keys(hubert.state_dict()))
    model.register_hooks_for_layers(
        ["model.encoder.transformer.layers.5.feed_forward.output_dense"]
    )
    emb = model.extract_embeddings(wav, aggregation="none")
    np.testing.assert_allclose(np.asarray(emb), captured[5], rtol=1e-4, atol=1e-4)
