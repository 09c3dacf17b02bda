#!/usr/bin/env python
"""Convert a torch .pt/.ckpt checkpoint to safetensors.

Counterpart of the reference's scripts/convert_to_safetensors.py: loads any
supported checkpoint through the universal loader (prefix-normalized) and
writes a flat safetensors file suitable for `load_model(checkpoint_path=...)`.
"""

import argparse

import numpy as np
from safetensors.numpy import save_file

from avex_tpu.utils.loaders import process_state_dict, universal_load


def convert_file(input_path: str, output_path: str, drop_classifier: bool = False) -> int:
    """Convert one checkpoint; returns the tensor count (import-friendly API,
    used by scripts/upload_models_to_hf.py)."""
    state = process_state_dict(universal_load(input_path), drop_classifier=drop_classifier)
    state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    save_file(state, output_path)
    return len(state)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", help="torch/safetensors checkpoint path or URI")
    parser.add_argument("output", help="output .safetensors path")
    parser.add_argument("--drop-classifier", action="store_true")
    args = parser.parse_args()

    count = convert_file(args.input, args.output, drop_classifier=args.drop_classifier)
    print(f"wrote {count} tensors to {args.output}")


if __name__ == "__main__":
    main()
