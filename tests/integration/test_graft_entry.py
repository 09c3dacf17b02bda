"""The driver's MULTICHIP gate: ``dryrun_multichip`` must work when imported
directly into a process whose jax backend is already initialised (possibly on
the wrong platform) — exactly how the round driver invokes it.

Round-1 failure mode (VERDICT.md "weak" #1): the function only forced the
virtual 8-CPU platform in its ``__main__`` block, so the driver's direct
import hit `mesh 4x2 != 1 devices`.  The function is now self-sufficient.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[2]


@pytest.mark.integration
@pytest.mark.slow  # full dryrun cell (~31 s; round-5 re-tier)
def test_dryrun_supervised_cell_direct_import():
    """In-process call: conftest already pinned an 8-device CPU topology, so
    this exercises the fast path (no subprocess). Runs the supervised DP×TP
    cell only — the full 4-cell matrix lives in the slow tier below."""
    sys.path.insert(0, str(REPO_ROOT))
    try:
        from __graft_entry__ import _dryrun_supervised_tp

        summary = _dryrun_supervised_tp(8)
        assert "supervised" in summary
    finally:
        sys.path.remove(str(REPO_ROOT))


@pytest.mark.integration
@pytest.mark.slow
def test_dryrun_multichip_direct_import_full_matrix():
    """The full parallelism matrix (supervised DP×TP, FSDP×TP, CLIP
    all-gather, EAT-SSL EMA) in-process — exactly the driver's gate."""
    sys.path.insert(0, str(REPO_ROOT))
    try:
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
    finally:
        sys.path.remove(str(REPO_ROOT))


@pytest.mark.integration
@pytest.mark.slow
def test_dryrun_multichip_from_initialized_wrong_backend():
    """Driver-faithful scenario: jax backend initialised FIRST (default
    platform, 1 device if the TPU tunnel is up), then dryrun_multichip(8)
    imported and called — must fall back to a subprocess and still pass."""
    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(REPO_ROOT)!r})\n"
        "import jax\n"
        "jax.devices()  # force backend init on the default platform\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    import os

    env = dict(os.environ)
    # Simulate the driver: no CPU pinning in the parent process.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(REPO_ROOT),
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-4000:]}"
    assert "dryrun_multichip OK" in proc.stdout
