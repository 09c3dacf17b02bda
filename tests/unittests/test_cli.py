"""CLI surface: ``avex-tpu train|evaluate|list-models`` (≈ avex/cli.py:26-79).

Exercises the click group in-process (CliRunner inherits the session's
8-device CPU platform), including YAML + ``-p key=value`` patch precedence.
"""

import pytest
import yaml
from click.testing import CliRunner

from avex_tpu.cli import cli


def _tiny_run_config(tmp_path):
    return {
        "model_spec": {
            "name": "beats",
            "pretrained": False,
            "init_config": {
                "encoder_layers": 1,
                "encoder_embed_dim": 64,
                "encoder_ffn_embed_dim": 128,
                "encoder_attention_heads": 4,
                "embed_dim": 32,
                "dropout": 0.0,
                "encoder_layerdrop": 0.0,
            },
            "audio_config": {
                "representation": "raw",
                "normalize": False,
                "target_length_seconds": 1,
                "window_selection": "random",
            },
        },
        "training_params": {"train_epochs": 1, "lr": 1e-3, "batch_size": 2},
        "dataset_config": {
            "train_datasets": [
                {
                    "name": "cli_smoke",
                    "kind": "synthetic",
                    "num_samples": 4,
                    "num_classes": 3,
                    "clip_seconds": 1.0,
                }
            ]
        },
        "output_dir": str(tmp_path / "out"),
        "seed": 0,
        "num_workers": 0,
    }


def test_list_models_command():
    result = CliRunner().invoke(cli, ["list-models"])
    assert result.exit_code == 0, result.output


@pytest.mark.slow  # full Trainer build+epoch (~44 s; round-5 re-tier)
def test_train_command_with_patches(tmp_path):
    cfg_path = tmp_path / "run.yml"
    cfg_path.write_text(yaml.safe_dump(_tiny_run_config(tmp_path)))
    patched_out = tmp_path / "patched_out"
    result = CliRunner().invoke(
        cli,
        [
            "train",
            "-c", str(cfg_path),
            "-p", f"output_dir={patched_out}",
            "-p", "training_params.lr=0.002",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert "Training finished" in result.output
    # the -p patch must win over YAML: artifacts land in patched_out
    assert patched_out.exists()
    assert (patched_out / "final_model").exists()


def test_train_command_rejects_unknown_key(tmp_path):
    cfg = _tiny_run_config(tmp_path)
    cfg["not_a_real_field"] = 1
    cfg_path = tmp_path / "bad.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    result = CliRunner().invoke(cli, ["train", "-c", str(cfg_path)])
    assert result.exit_code != 0  # pydantic extra="forbid" fails fast


@pytest.mark.slow  # full-size BEATs build: ~30 s
def test_embed_command(tmp_path):
    import numpy as np
    from scipy.io import wavfile

    audio_dir = tmp_path / "clips"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        wav = (rng.standard_normal(8000) * 0.1 * 32767).astype(np.int16)
        wavfile.write(audio_dir / f"clip_{i}.wav", 16000, wav)

    out = tmp_path / "embs.h5"
    result = CliRunner().invoke(
        cli,
        [
            "embed",
            "-m", "esp_aves2_sl_beats_all",
            "-i", str(audio_dir),
            "-o", str(out),
            "--random-weights",
            "--clip-seconds", "1",
            "--batch-size", "2",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert out.exists()

    from avex_tpu.evaluation import load_cached_embeddings

    embs, _labels, meta = load_cached_embeddings(out)
    assert embs[0].shape[0] == 3 and embs[0].shape[-1] == 768
    assert meta["aggregation"] == "mean"
    import json as _json

    manifest = _json.loads(out.with_suffix(".files.json").read_text())
    assert len(manifest) == 3
    assert all(row["offset_samples"] == 0 for row in manifest)


@pytest.mark.slow  # full-size BEATs build: ~30 s
def test_embed_command_windowed(tmp_path):
    """--windowed: one embedding row per window of a long recording, with
    per-row file + offset in the manifest (the 30-minute-soundscape path)."""
    import json as _json

    import numpy as np
    from scipy.io import wavfile

    audio_dir = tmp_path / "clips"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    # 3.5 s recording -> windows at 0/0.5/1.0/.../2.5 + padded tail at 3.0
    wav = (rng.standard_normal(56000) * 0.1 * 32767).astype(np.int16)
    wavfile.write(audio_dir / "long.wav", 16000, wav)

    out = tmp_path / "embs.h5"
    result = CliRunner().invoke(
        cli,
        [
            "embed",
            "-m", "esp_aves2_sl_beats_all",
            "-i", str(audio_dir),
            "-o", str(out),
            "--random-weights",
            "--clip-seconds", "1",
            "--hop-seconds", "0.5",
            "--windowed",
            "--batch-size", "4",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output

    from avex_tpu.evaluation import load_cached_embeddings

    embs, _labels, _meta = load_cached_embeddings(out)
    manifest = _json.loads(out.with_suffix(".files.json").read_text())
    assert embs[0].shape[0] == len(manifest)
    offsets = [row["offset_samples"] for row in manifest]
    assert offsets[0] == 0 and offsets[1] == 8000  # 0.5 s hop
    assert len(offsets) >= 6
    assert all(row["path"].endswith("long.wav") for row in manifest)


@pytest.mark.slow  # two full-size BEATs embeds (~60 s)
def test_embed_command_windowed_ring_attention(tmp_path):
    """--ring-attention on: the user command exercises ring attention
    end-to-end on the virtual mesh (round-4 verdict task #4) — every
    window's attention sequence shards over all 8 devices, and the
    embeddings match the in-device run (same seeded random weights)."""
    import numpy as np
    from scipy.io import wavfile

    audio_dir = tmp_path / "clips"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(40000) * 0.1 * 32767).astype(np.int16)
    wavfile.write(audio_dir / "long.wav", 16000, wav)

    def run(out, ring):
        result = CliRunner().invoke(
            cli,
            [
                "embed",
                "-m", "esp_aves2_sl_beats_all",
                "-i", str(audio_dir),
                "-o", str(out),
                "--random-weights",
                "--clip-seconds", "1",
                "--windowed",
                "--batch-size", "4",
                "--ring-attention", ring,
            ],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        return result.output

    out_ring = tmp_path / "ring.h5"
    output = run(out_ring, "on")
    assert "ring attention: sequence sharded over 8 devices" in output
    out_plain = tmp_path / "plain.h5"
    run(out_plain, "off")

    from avex_tpu.evaluation import load_cached_embeddings

    ring_embs, _l1, _m1 = load_cached_embeddings(out_ring)
    plain_embs, _l2, _m2 = load_cached_embeddings(out_plain)
    np.testing.assert_allclose(ring_embs[0], plain_embs[0], rtol=1e-4, atol=1e-5)


def test_sweep_runner_dry_run(tmp_path):
    """scripts/run_sweep.py expands the grid into per-combination CLI patches."""
    import subprocess
    import sys
    from pathlib import Path

    sweep = tmp_path / "sweep.yml"
    sweep.write_text(
        "base_config: cfg.yml\n"
        "grid:\n"
        "  training_params.lr: [0.001, 0.0003]\n"
        "  training_params.batch_size: [8, 16]\n"
    )
    script = Path(__file__).resolve().parents[2] / "scripts" / "run_sweep.py"
    out = subprocess.run(
        [sys.executable, str(script), str(sweep), "--dry-run"],
        capture_output=True, text=True, check=True,
    ).stdout
    lines = [l for l in out.splitlines() if l.startswith("::")]
    assert len(lines) == 4  # 2 x 2 grid
    assert "training_params.lr=0.001" in lines[0]
    assert "run_name=sweep_3" in lines[3]


@pytest.mark.slow  # two full-size BEATs embeds (~60 s)
def test_embed_command_npy_sr_resamples(tmp_path):
    """--npy-sr: a .npy clip recorded at a different rate is resampled to the
    model's rate before embedding (round-2 advisor finding). The flagged run
    must match embedding the explicitly-resampled waveform exactly."""
    import numpy as np

    from avex_tpu._native import resample
    from avex_tpu.evaluation import load_cached_embeddings

    rng = np.random.default_rng(7)
    t = np.arange(8000) / 8000.0
    tone_8k = (0.3 * np.sin(2 * np.pi * 440 * t) + 0.01 * rng.standard_normal(8000)).astype(
        np.float32
    )

    dir_a = tmp_path / "a"
    dir_a.mkdir()
    np.save(dir_a / "clip.npy", tone_8k)
    dir_b = tmp_path / "b"
    dir_b.mkdir()
    np.save(dir_b / "clip.npy", resample(tone_8k, 8000, 16000))

    outs = []
    for src, extra in ((dir_a, ["--npy-sr", "8000"]), (dir_b, [])):
        out = tmp_path / f"{src.name}.h5"
        result = CliRunner().invoke(
            cli,
            ["embed", "-m", "esp_aves2_sl_beats_all", "-i", str(src), "-o", str(out),
             "--random-weights", "--clip-seconds", "1", *extra],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        embs, _labels, _meta = load_cached_embeddings(out)
        outs.append(np.asarray(embs[0]))

    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
