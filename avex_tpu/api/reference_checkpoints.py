"""Reference BEATs base-checkpoint specs.

Counterpart of the two internal checkpoint YAMLs the reference packages
(``avex/api/configs/checkpoints/{beats_iter3_plus_as2m_ssl,
beats_iter3_plus_as2m_finetuned_cpt2}.yml``): GCS locations of the Microsoft
BEATs iter3+AS2M base weights (SSL and AudioSet-finetuned) together with the
matching ``BEATsConfig``. ``beats.Model`` resolves ``pretrained=True`` /
``fine_tuned=True`` through these entries (≈ beats_model.py:28-69) when the
bucket is reachable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

_SSL_CFG: Dict[str, Any] = {
    "deep_norm": True,
    "finetuned_model": False,
    "encoder_layerdrop": 0.05,
    "dropout": 0.0,
    "attention_dropout": 0.0,
}

_FINETUNED_CFG: Dict[str, Any] = {
    "deep_norm": True,
    "finetuned_model": True,
    "predictor_class": 527,
    "layer_wise_gradient_decay_ratio": 0.6,
    "encoder_layerdrop": 0.05,
    "dropout": 0.0,
    "attention_dropout": 0.0,
}

#: key → {checkpoint_path, beats_cfg}
REFERENCE_BEATS_CHECKPOINTS: Dict[str, Dict[str, Any]] = {
    "beats_iter3_plus_as2m_ssl": {
        "checkpoint_path": "gs://representation-learning/pretrained/BEATs_iter3_plus_AS2M.pt",
        "beats_cfg": _SSL_CFG,
    },
    "beats_iter3_plus_as2m_finetuned_cpt2": {
        "checkpoint_path": (
            "gs://foundation-models/beats_ckpts/"
            "BEATs_iter3_plus_AS2M_finetuned_on_AS2M_cpt2.pt"
        ),
        "beats_cfg": _FINETUNED_CFG,
    },
}


def resolve_beats_base_checkpoint(fine_tuned: bool = False) -> Optional[Dict[str, Any]]:
    """SSL vs AS2M-finetuned base checkpoint entry for BEATs ``pretrained``."""
    key = "beats_iter3_plus_as2m_finetuned_cpt2" if fine_tuned else "beats_iter3_plus_as2m_ssl"
    return REFERENCE_BEATS_CHECKPOINTS.get(key)
