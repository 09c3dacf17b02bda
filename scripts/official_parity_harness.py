#!/usr/bin/env python
"""Official-checkpoint parity harness: the one documented command.

Given network access (this build environment has zero egress, so the full
run activates elsewhere):

    python scripts/official_parity_harness.py

downloads every official checkpoint (avex_tpu.api.official_models), verifies
each file against its published SHA-256
(reference tests/unittests/test_official_models_checksums.py:25-40), converts
the weights into the jax model, runs the deterministic labeled fingerprint
batch (reference test_official_models_output_regression.py:135-157), and
prints a fingerprint table. For BEATs rows it also loads the SAME weights
into the reference torch oracle and prints the torch-side fingerprint, which
can be compared directly against the reference's published per-torch-profile
tables (test_official_models_output_regression.py:29-71).

Offline:

    python scripts/official_parity_harness.py --dry-run

exercises everything but the download: a random-init reference torch BEATs
checkpoint is synthesized to disk as safetensors, checksummed, loaded through
the exact same universal_load → process_state_dict → converter → forward →
fingerprint path, and compared against the torch oracle's pooled outputs.
Non-BEATs families run the registry → build → fingerprint path with random
weights. The dry-run is executed in CI by
tests/integration/test_official_fingerprints_harness.py.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

POOLED_ATOL = 2e-4
POOLED_RTOL = 1e-4


def labeled_audio_batch() -> np.ndarray:
    """Deterministic labeled mini-batch (reference
    test_official_models_output_regression.py:135-157): three sine classes
    220/440/880 Hz at amplitudes 0.8/0.9 → (6, 16000)."""
    t = np.arange(16000, dtype=np.float32) / 16000.0
    clips = []
    for freq in (220.0, 440.0, 880.0):
        base = np.sin(2.0 * np.pi * freq * t)
        for amplitude in (0.8, 0.9):
            clips.append((amplitude * base).astype(np.float32))
    return np.stack(clips)


def pooled(output) -> np.ndarray:
    """Pool model output to (B, D) (reference _pooled_model_output)."""
    out = np.asarray(output, np.float32)
    if out.ndim == 2:
        return out
    if out.ndim == 3:
        return out.mean(axis=1)
    if out.ndim == 4:
        return out.mean(axis=(2, 3))
    raise ValueError(f"unexpected output rank {out.ndim}")


def fingerprint(arr: np.ndarray) -> str:
    """Reference fingerprint regime: SHA-256 of outputs rounded to 4 decimals
    (test_official_models_output_regression.py:22-27)."""
    return hashlib.sha256(np.round(np.asarray(arr, np.float32), 4).tobytes()).hexdigest()


def synthesize_beats_checkpoint(path: Path, seed: int = 0) -> dict:
    """Random-init reference torch BEATs saved as safetensors — the dry-run
    stand-in for a downloaded official file (identical key naming, so the
    conversion path is exercised for real)."""
    import torch
    from safetensors.torch import save_file

    from tests.utils.reference_oracle import load_reference_beats

    ref = load_reference_beats()
    cfg = ref.beats.BEATsConfig(
        dropout=0.0, attention_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0
    )
    torch.manual_seed(seed)
    oracle = ref.beats.BEATs(cfg).eval()
    # clone: the reference aliases layer 0's relative_attention_bias into
    # every layer (backbone.py:100-103) and safetensors refuses shared memory.
    state = {
        f"backbone.{k}": v.detach().clone().contiguous()
        for k, v in oracle.state_dict().items()
        if "fbank" not in k
    }
    save_file(state, str(path))
    return {"oracle": oracle, "cfg": cfg}


def run_model(name: str, entry: dict, dry_run: bool, workdir: Path) -> dict:
    import avex_tpu
    from avex_tpu.api.official_models import OFFICIAL_MODEL_CHECKSUMS

    row: dict = {"model": name, "architecture": entry["model_spec"]["name"]}
    audio = labeled_audio_batch()
    is_beats = entry["model_spec"]["name"] == "beats"

    if dry_run and is_beats:
        ckpt = workdir / f"{name}.safetensors"
        oracle_info = synthesize_beats_checkpoint(ckpt)
        digest = hashlib.sha256(ckpt.read_bytes()).hexdigest()
        row["checkpoint_sha256"] = digest
        row["checksum_status"] = "synthesized (dry-run)"

        model = avex_tpu.load_model(
            name, checkpoint_path=str(ckpt), return_features_only=True
        )
        ours = pooled(model(audio))
        row["jax_fingerprint"] = fingerprint(ours)

        import torch

        with torch.no_grad():
            ref_out = oracle_info["oracle"](torch.from_numpy(audio), disable_layerdrop=True)
            ref_out = ref_out[0] if isinstance(ref_out, tuple) else ref_out
        ref_pooled = pooled(ref_out.numpy())
        row["torch_oracle_fingerprint"] = fingerprint(ref_pooled)
        err = float(np.max(np.abs(ours - ref_pooled)))
        row["max_abs_diff_vs_torch"] = err
        row["parity_ok"] = bool(
            np.allclose(ours, ref_pooled, atol=POOLED_ATOL, rtol=POOLED_RTOL)
        )
    elif dry_run:
        model = avex_tpu.load_model(name, return_features_only=True, random_weights=True)
        row["checksum_status"] = "skipped (dry-run, non-beats family)"
        row["jax_fingerprint"] = fingerprint(pooled(model(audio)))
    else:
        from avex_tpu.io import cached_download

        local = cached_download(entry["checkpoint_path"])
        digest = hashlib.sha256(Path(local).read_bytes()).hexdigest()
        row["checkpoint_sha256"] = digest
        expected = OFFICIAL_MODEL_CHECKSUMS.get(name)
        row["checksum_status"] = (
            "match" if digest == expected else f"MISMATCH (expected {expected})"
        )
        model = avex_tpu.load_model(name, return_features_only=True)
        row["jax_fingerprint"] = fingerprint(pooled(model(audio)))
        if is_beats:
            import torch

            from avex_tpu.utils.loaders import process_state_dict, universal_load
            from tests.utils.reference_oracle import load_reference_beats

            ref = load_reference_beats()
            init = entry["model_spec"].get("init_config", {})
            cfg = ref.beats.BEATsConfig(
                **{k: v for k, v in init.items() if hasattr(ref.beats.BEATsConfig(), k)}
            )
            oracle = ref.beats.BEATs(cfg).eval()
            state = process_state_dict(universal_load(local))
            oracle.load_state_dict(
                {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()},
                strict=False,
            )
            with torch.no_grad():
                ref_out = oracle(torch.from_numpy(audio), disable_layerdrop=True)
                ref_out = ref_out[0] if isinstance(ref_out, tuple) else ref_out
            ref_pooled = pooled(ref_out.numpy())
            ours = pooled(model(audio))
            row["torch_oracle_fingerprint"] = fingerprint(ref_pooled)
            row["max_abs_diff_vs_torch"] = float(np.max(np.abs(ours - ref_pooled)))
            row["parity_ok"] = bool(
                np.allclose(ours, ref_pooled, atol=POOLED_ATOL, rtol=POOLED_RTOL)
            )
    return row


def main(argv=None) -> int:
    from avex_tpu.api.official_models import OFFICIAL_MODELS

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--dry-run", action="store_true",
        help="no network: synthesized BEATs checkpoint + random-init others",
    )
    parser.add_argument(
        "--models", nargs="*", default=None,
        help="subset of official model names (default: all)",
    )
    parser.add_argument("--workdir", default="/tmp/avex_parity_harness")
    args = parser.parse_args(argv)

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    names = args.models or sorted(OFFICIAL_MODELS)
    unknown = set(names) - set(OFFICIAL_MODELS)
    if unknown:
        parser.error(f"unknown models: {sorted(unknown)}")

    rows = []
    failed = []
    for name in names:
        try:
            row = run_model(name, OFFICIAL_MODELS[name], args.dry_run, workdir)
        except Exception as err:  # keep going; report at the end
            row = {"model": name, "error": str(err)[:300]}
            failed.append(name)
        rows.append(row)
        print(json.dumps(row))

    ok = [r for r in rows if r.get("parity_ok")]
    print(
        f"# {len(rows)} models, {len(ok)} torch-parity-verified, "
        f"{len(failed)} errors" + (f": {failed}" if failed else ""),
        file=sys.stderr,
    )
    bad_parity = [r["model"] for r in rows if r.get("parity_ok") is False]
    if failed or bad_parity:
        print(f"# parity failures: {bad_parity}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
