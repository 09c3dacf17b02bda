#!/usr/bin/env python
"""Offline Perch/SurfPerch TF-Hub SavedModel → numpy state-dict converter.

Run this where TensorFlow is available (the TPU build itself ships without
TF); the resulting .npz loads through `perch.Model.load_state_dict` after a
torchvision-style key mapping. See avex_tpu/models/perch.py for the target
naming.
"""

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("saved_model_dir")
    parser.add_argument("output_npz")
    args = parser.parse_args()
    try:
        import numpy as np
        import tensorflow as tf  # noqa: F401
    except ImportError as err:
        raise SystemExit(
            "TensorFlow is required for this conversion; run it in a TF "
            "environment, then ship only the .npz to the TPU build."
        ) from err
    model = tf.saved_model.load(args.saved_model_dir)
    state = {v.name: v.numpy() for v in model.variables}
    np.savez(args.output_npz, **state)
    print(f"wrote {len(state)} variables to {args.output_npz}")


if __name__ == "__main__":
    main()
