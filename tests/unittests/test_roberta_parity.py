"""RoBERTa text-tower elementwise parity vs torch ``transformers``.

The reference CLIP text encoder is ``transformers.RobertaModel`` pretrained
from ``roberta-base`` (reference avex/models/clip.py:24-60). No network is
needed for parity: a randomly initialized torch RobertaModel is converted via
``convert_roberta_state_dict`` and compared elementwise — validating the key
mapping, position-id convention (pad-offset cumsum), masking, and LayerNorm
placement at full base scale.
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from avex_tpu.models.clip import RobertaEncoder, convert_roberta_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def pair():
    from transformers import RobertaConfig, RobertaModel

    # roberta-base architecture (the Config class default is 512 positions;
    # the published roberta-base uses 514 = 512 + pad offset 2)
    config = RobertaConfig(
        max_position_embeddings=514, type_vocab_size=1, layer_norm_eps=1e-5
    )
    torch.manual_seed(0)
    ref = RobertaModel(config, add_pooling_layer=False)
    ref.eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_roberta_state_dict(state)
    model = RobertaEncoder()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.ones((1, 4), np.int32)
    )
    params = dict(variables["params"])
    params.update(converted["params"])
    return ref, model, {"params": params}


@pytest.mark.slow
def test_last_hidden_state_parity(pair, rng):
    ref, model, variables = pair
    ids = rng.integers(10, 1000, size=(2, 12)).astype(np.int32)
    ids[:, 0] = 0  # <s>
    ids[0, -1] = 2  # </s>
    ids[1, -3:] = 1  # right padding (pad_token_id = 1)
    mask = (ids != 1).astype(np.int32)

    with torch.no_grad():
        ref_out = ref(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()

    ours = np.asarray(jax.jit(model.apply)(variables, ids, mask))
    # Compare non-pad positions (pad outputs are defined-but-unused noise in
    # both implementations, with different masking constants).
    sel = mask.astype(bool)
    np.testing.assert_allclose(ours[sel], ref_out[sel], atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_cls_feature_parity_no_padding(pair, rng):
    """The CLIP text path uses the [CLS] (=<s>) feature; check it exactly on
    an unpadded batch (the common training case)."""
    ref, model, variables = pair
    ids = rng.integers(10, 1000, size=(3, 8)).astype(np.int32)
    ids[:, 0] = 0

    with torch.no_grad():
        ref_out = ref(input_ids=torch.from_numpy(ids).long()).last_hidden_state.numpy()

    ours = np.asarray(jax.jit(model.apply)(variables, ids))
    np.testing.assert_allclose(ours[:, 0], ref_out[:, 0], atol=2e-4, rtol=1e-4)
