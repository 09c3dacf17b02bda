"""Console entry point printing the model registry (≈ avex/api/list_models.py:17-63)."""

from __future__ import annotations


def main() -> None:
    """Print the model registry table."""
    from avex_tpu.models.registry import list_models

    list_models(verbose=True)


if __name__ == "__main__":
    main()
