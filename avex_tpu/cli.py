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


if __name__ == "__main__":
    cli()
