#!/usr/bin/env python3
"""Convert a reference (TF1) Point-GNN checkpoint into this framework.

Input: an ``.npz`` dump of the TF checkpoint variables (see
pointgnn_tpu/train/convert.py's docstring for the one-line dump recipe)
plus the reference config JSON frozen next to the checkpoint.  Output:
an orbax checkpoint directory that run.py / eval.py consume directly.

Usage:
    python tools/convert_reference_checkpoint.py car_T3.npz \
        <reference_checkpoint_dir>/config <output_train_dir> [--step N]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    parser = argparse.ArgumentParser(
        description="Reference TF checkpoint (.npz dump) -> orbax"
    )
    parser.add_argument("npz", type=str)
    parser.add_argument("config", type=str, help="reference config JSON")
    parser.add_argument("output_dir", type=str)
    parser.add_argument(
        "--step", type=int, default=0,
        help="global step to record (e.g. 1400000)",
    )
    args = parser.parse_args()

    from pointgnn_tpu.train import checkpoint as ckpt
    from pointgnn_tpu.train.convert import convert_reference_weights
    from pointgnn_tpu.utils.config_io import load_config

    config = load_config(args.config)
    tf_vars = dict(np.load(args.npz))
    params = convert_reference_weights(
        tf_vars,
        config["model_kwargs"]["layer_configs"],
        config["num_classes"],
    )
    os.makedirs(args.output_dir, exist_ok=True)
    ckpt.save_checkpoint(
        args.output_dir, args.step, {"params": params}, config=config
    )
    n = sum(
        1 for _ in __import__("jax").tree_util.tree_leaves(params)
    )
    print(
        "converted %d arrays -> %s (step %d)"
        % (n, args.output_dir, args.step)
    )


if __name__ == "__main__":
    main()
