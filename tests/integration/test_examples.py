"""Execute the shipped examples so they cannot rot.

Each example is documented to work offline (random weights / synthetic
audio); running them end-to-end is the only guarantee the README's
copy-paste snippets keep working as the API evolves.
"""

import runpy
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parents[2] / "examples"

pytestmark = [pytest.mark.slow, pytest.mark.integration]


def _run(name, argv=()):
    old_argv = sys.argv
    sys.argv = [str(EXAMPLES / name), *argv]
    try:
        runpy.run_path(str(EXAMPLES / name), run_name="__main__")
    finally:
        sys.argv = old_argv


def test_quickstart_offline():
    _run("quickstart.py")


def test_long_recording_inference_synthetic():
    _run("long_recording_inference.py")


def test_train_probe_on_cached_embeddings():
    _run("train_probe_on_cached_embeddings.py")


def test_serve_and_query():
    _run("serve_and_query.py")


def test_custom_model_registration():
    _run("custom_model_registration.py")
