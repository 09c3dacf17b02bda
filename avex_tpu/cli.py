"""Command-line interface: ``avex-tpu train|evaluate|list-models``.

Counterpart of ``avex/cli.py:26-79``: click group with ``-c config.yml``
plus repeatable ``-p key=value`` dotted-path patches (CLI wins over YAML,
configs.py:733-764). Log level via the ``LOG_LEVEL`` env var.
"""

from __future__ import annotations

import logging
import os

import click

logging.basicConfig(
    level=os.environ.get("LOG_LEVEL", "INFO").upper(),
    format="%(asctime)s %(levelname)s %(name)s: %(message)s",
)


@click.group()
def cli() -> None:
    """avex-tpu: TPU-native bioacoustics representation learning."""


@cli.command()
@click.option("-c", "--config", "config_path", required=True, type=str)
@click.option("-p", "--patch", "patches", multiple=True, help="key=value config overrides")
def train(config_path: str, patches) -> None:
    """Run a training job from a RunConfig YAML."""
    from avex_tpu.configs import RunConfig
    from avex_tpu.run_train import main

    config = RunConfig.from_sources(config_path, list(patches))
    result = main(config)
    click.echo(f"Training finished: best_val_acc={result['best_val_acc']:.4f}")


@cli.command()
@click.option("-c", "--config", "config_path", required=True, type=str)
@click.option("-p", "--patch", "patches", multiple=True, help="key=value config overrides")
def evaluate(config_path: str, patches) -> None:
    """Run a benchmark evaluation from an EvaluateConfig YAML."""
    from avex_tpu.configs import EvaluateConfig
    from avex_tpu.run_evaluate import main

    config = EvaluateConfig.from_sources(config_path, list(patches))
    results = main(config)
    click.echo(f"Evaluation finished: {len(results)} experiment x set results")


@cli.command("list-models")
def list_models_cmd() -> None:
    """Print the model registry table."""
    from avex_tpu.models.registry import list_models

    list_models(verbose=True)


@cli.command()
@click.option("-m", "--model", "model_name", required=True, help="registry key or spec YAML")
@click.option("-i", "--input", "input_path", required=True, type=str,
              help="audio file or directory (wav/flac/npy)")
@click.option("-o", "--output", "output_path", required=True, type=str, help="output .h5")
@click.option("--layers", default="last_layer", help="comma list of layer selectors")
@click.option("--aggregation", default="mean",
              type=click.Choice(["mean", "max", "cls_token", "none"]))
@click.option("--batch-size", default=32, type=int)
@click.option("--clip-seconds", default=5.0, type=float,
              help="fixed window length (center crop/pad)")
@click.option("--random-weights", is_flag=True, help="skip checkpoint download (offline)")
@click.option("--npy-sr", type=int, default=None,
              help=".npy inputs are assumed to already be at the model's sample "
                   "rate; pass their actual rate here to resample them")
@click.option("--windowed", is_flag=True,
              help="long recordings: one embedding PER clip-seconds window "
                   "(hop --hop-seconds) instead of a single center crop; the "
                   ".files.json manifest records each row's file + offset")
@click.option("--hop-seconds", type=float, default=None,
              help="window hop for --windowed (default: the window length)")
@click.option("--ring-attention", type=click.Choice(["auto", "on", "off"]),
              default="auto",
              help="long-window mode: shard each window's attention sequence "
                   "over all devices (ops/ring_attention.py) so the [T, T] "
                   "score matrix never materializes on one chip. auto = on "
                   "for --windowed runs whose windows exceed ~1024 tokens "
                   "on a multi-device mesh")
def embed(model_name, input_path, output_path, layers, aggregation,
          batch_size, clip_seconds, random_weights, npy_sr,
          windowed, hop_seconds, ring_attention) -> None:
    """Embed audio files into an HDF5 cache (the most common one-off task:
    point a model at a directory, get layer-wise embeddings out)."""
    import json
    from pathlib import Path

    import numpy as np

    from avex_tpu._native import decode_audio, resample
    from avex_tpu.evaluation import extract_embeddings_to_cache
    from avex_tpu.models.load import load_model
    from avex_tpu.ops.audio import pad_or_window_np

    src = Path(input_path)
    files = (
        sorted(p for ext in ("*.wav", "*.flac", "*.npy") for p in src.rglob(ext))
        if src.is_dir()
        else [src]
    )
    if not files:
        raise click.ClickException(f"no .wav/.flac/.npy files under {src}")

    model = load_model(model_name, return_features_only=True, random_weights=random_weights)
    ac = getattr(model, "audio_config", None)
    sr = int(ac.sample_rate) if ac is not None and getattr(ac, "sample_rate", None) else 16000
    target = int(clip_seconds * sr)

    def load_wav(path):
        if path.suffix == ".npy":
            wav = np.load(path).astype(np.float32).reshape(-1)
            if npy_sr and npy_sr != sr:
                wav = resample(wav, npy_sr, sr)
            return wav
        wav, file_sr = decode_audio(str(path), mono=True)
        if file_sr != sr:
            wav = resample(wav, file_sr, sr)
        return wav

    # Each output row is (file, offset); a non-windowed run is one
    # center-cropped row per file at offset 0.
    manifest_rows = []

    def rows():
        from avex_tpu.ops.windowing import window_waveform

        hop = int((hop_seconds or clip_seconds) * sr)
        for path in files:
            wav = load_wav(path)
            if windowed:
                windows, offsets = window_waveform(wav, target, hop_samples=hop)
                for clip, offset in zip(windows, offsets):
                    yield clip, {"path": str(path), "offset_samples": int(offset)}
            else:
                clip, _mask = pad_or_window_np(wav, target, window_selection="center")
                yield clip, {"path": str(path), "offset_samples": 0}

    def batches():
        clips = []
        for clip, row in rows():
            clips.append(clip)
            manifest_rows.append(row)
            if len(clips) == batch_size:
                yield {"raw_wav": np.stack(clips)}
                clips = []
        if clips:
            yield {"raw_wav": np.stack(clips)}

    import jax

    from avex_tpu.parallel import make_mesh

    def _estimated_tokens() -> int:
        """Encoder sequence length one clip-seconds window produces."""
        cfg = getattr(model, "cfg", None)
        if cfg is not None and hasattr(cfg, "input_patch_size"):  # BEATs-like
            sf = float(getattr(cfg, "sample_frequency", 16000.0))
            frames = 1 + int(
                (target - getattr(cfg, "frame_length", 25.0) / 1000.0 * sf)
                // (getattr(cfg, "frame_shift", 10.0) / 1000.0 * sf)
            )
            p = int(cfg.input_patch_size)
            return (frames // p) * (int(cfg.num_mel_bins) // p)
        tl = getattr(getattr(model, "module", None), "target_length", None)
        if tl:  # EAT/Bird-MAE fixed spectrogram grid + CLS
            return (int(tl) // 16) * (128 // 16) + 1
        return 0

    n_dev = jax.device_count()
    use_ring = (
        ring_attention != "off"
        and n_dev > 1
        and hasattr(model, "enable_ring_attention")
        and (ring_attention == "on" or (windowed and _estimated_tokens() >= 1024))
    )
    if use_ring:
        # Long-window mode: the sequence axis of every attention shards over
        # ALL devices (model axis) and K/V rotate via ppermute — one window's
        # [T, T] scores never exist on one chip. Batch stays whole per step.
        mesh = make_mesh(data=1, model=n_dev)
        model.enable_ring_attention(mesh)
        click.echo(f"ring attention: sequence sharded over {n_dev} devices")
    else:
        mesh = make_mesh() if n_dev > 1 else None
    model.register_hooks_for_layers([s.strip() for s in layers.split(",") if s.strip()])
    extract_embeddings_to_cache(
        model, batches(), output_path, aggregation=aggregation, mesh=mesh
    )
    manifest = Path(output_path).with_suffix(".files.json")
    manifest.write_text(json.dumps(manifest_rows, indent=0))
    click.echo(
        f"Embedded {len(files)} files ({len(manifest_rows)} rows) -> "
        f"{output_path} (manifest: {manifest})"
    )


@cli.command()
@click.option("-m", "--model", "model_name", required=True, help="registry key or spec YAML")
@click.option("-o", "--output", "output_path", required=True, type=str,
              help="SavedModel directory or .tflite file")
@click.option("--format", "fmt", default=None,
              type=click.Choice(["savedmodel", "tflite"]),
              help="default: tflite when output ends in .tflite, else savedmodel")
@click.option("--mode", default="embed", type=click.Choice(["embed", "logits"]),
              show_default=True)
@click.option("--layers", default="last_layer", help="comma list of layer selectors")
@click.option("--aggregation", default="mean",
              type=click.Choice(["mean", "max", "cls_token"]), show_default=True)
@click.option("--clip-seconds", default=5.0, type=float, show_default=True)
@click.option("--batch-size", default=None, type=int,
              help="pin the batch axis (default: polymorphic for savedmodel, 1 for tflite)")
@click.option("--quantize-float16", is_flag=True,
              help="tflite only: float16 weight quantization (~half the artifact)")
@click.option("--random-weights", is_flag=True, help="skip checkpoint download (offline)")
def export(model_name, output_path, fmt, mode, layers, aggregation, clip_seconds,
           batch_size, quantize_float16, random_weights) -> None:
    """Export a model to TF SavedModel / TFLite for edge + TF-Serving deployment
    (the formats BirdNet and Perch ship in; see avex_tpu.export)."""
    from avex_tpu.export import export_savedmodel, export_tflite
    from avex_tpu.models.load import load_model

    if fmt is None:
        fmt = "tflite" if output_path.endswith(".tflite") else "savedmodel"
    model = load_model(model_name, return_features_only=(mode == "embed"),
                       random_weights=random_weights)
    layer_list = [s.strip() for s in layers.split(",") if s.strip()]
    if fmt == "tflite":
        blob = export_tflite(
            model, output_path, mode=mode, layers=layer_list, aggregation=aggregation,
            clip_seconds=clip_seconds, batch_size=batch_size or 1,
            quantize_float16=quantize_float16,
        )
        click.echo(f"TFLite model written to {output_path} ({len(blob)} bytes)")
    else:
        if quantize_float16:
            raise click.ClickException("--quantize-float16 applies to tflite exports only")
        export_savedmodel(
            model, output_path, mode=mode, layers=layer_list, aggregation=aggregation,
            clip_seconds=clip_seconds, batch_size=batch_size,
        )
        click.echo(f"SavedModel exported to {output_path}")


@cli.command()
@click.option("-m", "--model", "model_names", required=True, multiple=True,
              help="registry key or spec YAML; repeat to co-host several "
                   "models in one process (routed under /models/<name>/)")
@click.option("--host", default="127.0.0.1", show_default=True)
@click.option("--port", default=8000, type=int, show_default=True,
              help="0 binds an ephemeral port")
@click.option("--mode", default="embed", type=click.Choice(["embed", "logits"]),
              show_default=True)
@click.option("--layers", default="last_layer", help="comma list of layer selectors")
@click.option("--aggregation", default="mean",
              type=click.Choice(["mean", "max", "cls_token"]), show_default=True)
@click.option("--clip-seconds", default=5.0, type=float, show_default=True)
@click.option("--max-batch", default=32, type=int, show_default=True,
              help="micro-batch ceiling (power-of-two buckets up to this)")
@click.option("--max-wait-ms", default=10.0, type=float, show_default=True,
              help="how long the batcher waits to coalesce concurrent requests")
@click.option("--random-weights", is_flag=True, help="skip checkpoint download (offline)")
@click.option("--no-warmup", is_flag=True, help="skip ahead-of-traffic compilation")
@click.option("--quantization", default=None, type=click.Choice(["int8"]),
              help="W8A8 dynamic-int8 serving mode (halves encoder-weight "
                   "HBM; see avex_tpu.quant for the perf/quality envelope)")
def serve(model_names, host, port, mode, layers, aggregation, clip_seconds,
          max_batch, max_wait_ms, random_weights, no_warmup, quantization) -> None:
    """Serve model(s) over HTTP with TPU micro-batching (see avex_tpu.serving)."""
    from avex_tpu.models.load import load_model
    from avex_tpu.serving import (
        AvexHTTPServer,
        InferenceService,
        ServiceConfig,
        ServicePool,
    )
    from avex_tpu.utils.compile_cache import enable_compilation_cache

    if len(set(model_names)) != len(model_names):
        dupes = sorted({n for n in model_names if model_names.count(n) > 1})
        raise click.UsageError(f"model(s) given more than once: {', '.join(dupes)}")
    enable_compilation_cache()
    config = ServiceConfig(
        clip_seconds=clip_seconds,
        max_batch=max_batch,
        max_wait_ms=max_wait_ms,
        mode=mode,
        layers=[s.strip() for s in layers.split(",") if s.strip()],
        aggregation=aggregation,
    )
    pool = ServicePool()
    for name in model_names:
        model = load_model(name, return_features_only=(mode == "embed"),
                           random_weights=random_weights, quantization=quantization)
        pool.add(name, InferenceService(model, config))
    target = pool if len(pool) > 1 else pool.default
    if not no_warmup:
        click.echo("Warming up (compiling bucket-1 and max-batch programs)...")
        pool.warmup()
    server = AvexHTTPServer(target, host=host, port=port)
    click.echo(
        f"Serving {', '.join(model_names)} ({mode}) on http://{server.host}:{server.port}"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
        pool.close()


if __name__ == "__main__":
    cli()
