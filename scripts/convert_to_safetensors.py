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


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", help="torch/safetensors checkpoint path or URI")
    parser.add_argument("output", help="output .safetensors path")
    parser.add_argument("--drop-classifier", action="store_true")
    args = parser.parse_args()

    state = process_state_dict(universal_load(args.input), drop_classifier=args.drop_classifier)
    state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    save_file(state, args.output)
    print(f"wrote {len(state)} tensors to {args.output}")


if __name__ == "__main__":
    main()
