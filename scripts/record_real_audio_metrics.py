#!/usr/bin/env python
"""Record or diff the real-audio end-to-end metric baseline.

Counterpart of the reference's ``scripts/record_evaluate_end_to_end_metrics.py``:
``record`` runs the same pipeline as
``tests/integration/test_real_audio_baseline.py`` and writes a snapshot;
``diff`` compares two snapshots at the fixture tolerances; ``pin`` merges a
snapshot into ``tests/fixtures/real_audio_metric_baselines.json``.

Examples:
    python scripts/record_real_audio_metrics.py record snap.json
    python scripts/record_real_audio_metrics.py diff snap_a.json snap_b.json
    python scripts/record_real_audio_metrics.py pin snap.json
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

FIXTURE = REPO / "tests" / "fixtures" / "real_audio_metric_baselines.json"


def _run_pipeline() -> dict:
    import jax

    if jax.default_backend() != "cpu":
        # The committed fixture records CPU numerics; a TPU-backed snapshot
        # would silently re-pin different values (platform pinning can fail
        # when a plugin/backend initialized before this script ran).
        raise SystemExit(
            f"refusing to record on backend {jax.default_backend()!r}; "
            "the baseline fixture is CPU-pinned"
        )
    from integration import test_real_audio_baseline as T  # noqa: E402

    from avex_tpu.configs import (
        BenchmarkEvaluationConfig,
        DatasetCollectionConfig,
        DatasetConfig,
        EvaluateConfig,
        EvaluationSet,
        ExperimentConfig,
        ProbeConfig,
        RunConfig,
        TrainingParams,
    )
    from avex_tpu.run_evaluate import main as run_evaluate_main

    class _Factory:
        def mktemp(self, name):
            return Path(tempfile.mkdtemp(prefix=name))

    audio_dir = T.real_audio_dir.__wrapped__(_Factory())
    tmp = Path(tempfile.mkdtemp())

    def split(name, sub):
        return DatasetConfig(
            name=name, kind="local", path=str(audio_dir / sub), num_classes=5,
            clip_seconds=1.0, sample_rate=T.SR,
        )

    config = EvaluateConfig(
        experiments=[
            ExperimentConfig(
                run_name="tiny_beats_real",
                run_config=RunConfig(
                    model_spec=T._tiny_model_spec(),
                    training_params=TrainingParams(train_epochs=1, lr=1e-3, batch_size=8),
                    dataset_config=DatasetCollectionConfig(),
                    output_dir=str(tmp / "runs"),
                ),
                pretrained=False,
                probe_config=ProbeConfig(
                    probe_type="linear", target_layers=["last_layer"],
                    aggregation="mean", target_length=T.CLIP,
                ),
            )
        ],
        dataset_config=BenchmarkEvaluationConfig(
            name="real_bench",
            evaluation_sets=[
                EvaluationSet(
                    name="real_audio_bench",
                    train=split("real_train", "train"),
                    val=split("real_val", "val"),
                    test=split("real_test", "test"),
                    metrics=["accuracy", "balanced_accuracy"],
                )
            ],
        ),
        save_dir=str(tmp / "eval"),
        training_params=TrainingParams(train_epochs=8, lr=5e-3, batch_size=8),
        device="cpu",
        seed=42,
        num_workers=2,
        eval_modes=["probe"],
    )
    metrics = run_evaluate_main(config)[0]["metrics"]["probe"]
    return {
        k: float(v)
        for k, v in metrics.items()
        if k.startswith("test_") and k != "test_loss"
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    rec = sub.add_parser("record")
    rec.add_argument("out", type=Path)
    diff = sub.add_parser("diff")
    diff.add_argument("a", type=Path)
    diff.add_argument("b", type=Path)
    pin = sub.add_parser("pin")
    pin.add_argument("snapshot", type=Path)
    args = parser.parse_args()

    if args.cmd == "record":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        metrics = _run_pipeline()
        args.out.write_text(json.dumps({"metrics": metrics}, indent=2))
        print(json.dumps(metrics))
        return

    tol = json.loads(FIXTURE.read_text())["tolerances"]
    if args.cmd == "diff":
        a = json.loads(args.a.read_text())["metrics"]
        b = json.loads(args.b.read_text())["metrics"]
        failed = False
        for key in sorted(set(a) | set(b)):
            va, vb = a.get(key), b.get(key)
            ok = (
                va is not None
                and vb is not None
                and abs(va - vb) <= tol["atol"] + tol["rtol"] * abs(vb)
            )
            failed |= not ok
            print(f"{'OK ' if ok else 'DIFF'} {key}: {va} vs {vb}")
        sys.exit(1 if failed else 0)

    if args.cmd == "pin":
        snapshot = json.loads(args.snapshot.read_text())["metrics"]
        fixture = json.loads(FIXTURE.read_text())
        fixture["metrics"] = snapshot
        FIXTURE.write_text(json.dumps(fixture, indent=2))
        print(f"pinned {snapshot} into {FIXTURE}")


if __name__ == "__main__":
    main()
