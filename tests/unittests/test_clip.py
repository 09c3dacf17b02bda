"""CLIP/CLAP: joint forward, contrastive loss wiring, RoBERTa conversion."""

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import ModelSpec


def _spec():
    return ModelSpec(
        name="clip",
        pretrained=False,
        text_model_name="roberta-base",
        projection_dim=64,
        temperature=0.07,
        # small text tower: the full roberta-base path is covered by
        # tests/unittests/test_roberta_parity.py
        extra_config={
            "text_encoder": {"layers": 2, "dim": 64, "heads": 4, "ffn_dim": 128, "vocab_size": 1024}
        },
        audio_config={
            "n_fft": 400,
            "hop_length": 160,
            "win_length": 400,
            "n_mels": 64,
            "representation": "mel_spectrogram",
            "normalize": True,
        },
    )


@pytest.fixture(scope="module")
def clip_model():
    return avex_tpu.build_model_from_spec(_spec())


@pytest.mark.slow  # EfficientNet tower init + jit dominate (~50 s)
def test_forward_contract(clip_model, rng):
    wav = rng.standard_normal((3, 8000)).astype(np.float32) * 0.1
    texts = ["a dog barking", "bird song at dawn", "an insect chirp"]
    audio_emb, text_emb, scale = clip_model(wav, texts)
    assert audio_emb.shape == (3, 64)
    assert text_emb.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(audio_emb), axis=1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(text_emb), axis=1), 1.0, atol=1e-4)
    assert float(scale) <= 100.0 + 1e-3
    # same text twice -> identical embeddings; different -> different
    t2, = (np.asarray(clip_model(wav, ["a dog barking"] * 3)[1]),)
    np.testing.assert_allclose(t2[0], t2[1], atol=1e-5)


@pytest.mark.slow
def test_clip_loss_integration(clip_model, rng):
    from avex_tpu.training.losses import clip_loss
    import jax.numpy as jnp

    wav = rng.standard_normal((4, 8000)).astype(np.float32) * 0.1
    texts = ["dog", "bird", "frog", "cricket"]
    audio_emb, text_emb, _scale = clip_model(wav, texts)
    loss, aux = clip_loss(jnp.asarray(audio_emb), jnp.asarray(text_emb),
                          jnp.asarray(np.log(1 / 0.07)))
    assert np.isfinite(float(loss))
    assert 0 <= int(aux["a2t_correct"]) <= 4


def test_roberta_conversion_covers_params():
    from avex_tpu.models.clip import RobertaEncoder, convert_roberta_state_dict
    from avex_tpu.utils.tree import count_params
    import jax

    enc = RobertaEncoder(vocab_size=100, dim=32, layers=2, heads=4, ffn_dim=64,
                         max_positions=40)
    variables = enc.init(jax.random.PRNGKey(0), np.ones((1, 5), np.int32))
    params = variables["params"]

    state = {}
    state["embeddings.word_embeddings.weight"] = np.asarray(params["word_embeddings"]["embedding"])
    state["embeddings.position_embeddings.weight"] = np.asarray(params["position_embeddings"]["embedding"])
    state["embeddings.token_type_embeddings.weight"] = np.asarray(params["token_type_embeddings"]["embedding"])
    state["embeddings.LayerNorm.weight"] = np.asarray(params["emb_layer_norm"]["scale"])
    state["embeddings.LayerNorm.bias"] = np.asarray(params["emb_layer_norm"]["bias"])
    for i in range(2):
        base = f"encoder.layer.{i}"
        for torch_name, flax_name in [
            ("attention.self.query", f"layer_{i}_q"),
            ("attention.self.key", f"layer_{i}_k"),
            ("attention.self.value", f"layer_{i}_v"),
            ("attention.output.dense", f"layer_{i}_attn_out"),
            ("intermediate.dense", f"layer_{i}_ff1"),
            ("output.dense", f"layer_{i}_ff2"),
        ]:
            state[f"{base}.{torch_name}.weight"] = np.asarray(params[flax_name]["kernel"]).T
            state[f"{base}.{torch_name}.bias"] = np.asarray(params[flax_name]["bias"])
        state[f"{base}.attention.output.LayerNorm.weight"] = np.asarray(params[f"layer_{i}_attn_ln"]["scale"])
        state[f"{base}.attention.output.LayerNorm.bias"] = np.asarray(params[f"layer_{i}_attn_ln"]["bias"])
        state[f"{base}.output.LayerNorm.weight"] = np.asarray(params[f"layer_{i}_ff_ln"]["scale"])
        state[f"{base}.output.LayerNorm.bias"] = np.asarray(params[f"layer_{i}_ff_ln"]["bias"])

    converted = convert_roberta_state_dict(state)
    assert count_params(converted["params"]) == count_params(params)
