#!/usr/bin/env python3
"""Continuous Point-GNN TPU evaluation on KITTI.

CLI parity with the reference driver (/root/reference/eval.py:19-44):

    python3 eval.py <eval_config_path> [--dataset_root_dir D] \
        [--dataset_split_file F]

The eval_config names the train_dir to poll; the frozen config inside
the train_dir defines the model (written there by train.py).
"""

import argparse
import os
import time


def main():
    parser = argparse.ArgumentParser(
        description="Continuous evaluation of Point-GNN TPU"
    )
    parser.add_argument("eval_config_path", type=str, help="Path to eval_config")
    parser.add_argument(
        "--dataset_root_dir", type=str, default="../dataset/kitti/",
        help="Path to KITTI dataset",
    )
    parser.add_argument(
        "--dataset_split_file", type=str, default="",
        help="Path to the split file "
        "(default DATASET_ROOT_DIR/3DOP_splits/<eval_dataset>)",
    )
    args = parser.parse_args()

    from pointgnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()

    from pointgnn_tpu.train.evaluator import Evaluator
    from pointgnn_tpu.train.pipeline import DatasetSpec, FetchSpec
    from pointgnn_tpu.utils import config_io

    eval_config = config_io.load_train_config(args.eval_config_path)
    train_dir = eval_config["train_dir"]
    eval_dir = eval_config.get(
        "eval_dir", os.path.join(train_dir, "eval")
    )
    config_path = os.path.join(train_dir, "config")
    # wait for training to freeze a config (eval.py:39-41)
    while not os.path.isfile(config_path):
        print("No config found in %s, waiting" % train_dir)
        time.sleep(eval_config.get("eval_every_second", 60))
    config_complete = config_io.load_config(config_path)
    config = config_complete.get("eval", config_complete)
    # the frozen train_config records HOW the checkpoint was trained;
    # device_graph (uncapped slab neighborhoods) changes the edge
    # capacity the evaluator needs (docs/PERF_NOTES.md 0.00-BEV trap)
    train_config_path = os.path.join(train_dir, "train_config")
    train_config = (
        config_io.load_train_config(train_config_path)
        if os.path.isfile(train_config_path)
        else {}
    )

    split_file = args.dataset_split_file or os.path.join(
        args.dataset_root_dir, "3DOP_splits", eval_config["eval_dataset"]
    )
    spec = DatasetSpec.from_kitti_root(
        args.dataset_root_dir, split_file, num_classes=config["num_classes"]
    )
    dataset = spec.build()
    num_frames = dataset.num_files
    if eval_config.get("NUM_TEST_SAMPLE", -1) > 0:
        num_frames = min(num_frames, eval_config["NUM_TEST_SAMPLE"])
    print("Evaluating on %d frames" % num_frames)

    evaluator = Evaluator(
        config,
        eval_config,
        FetchSpec(spec, config, eval_config, is_eval=True),
        num_frames=num_frames,
        train_config=train_config,
    )
    try:
        evaluator.eval_repeat(
            train_dir,
            eval_dir,
            eval_every_second=eval_config.get("eval_every_second", 60),
            max_step=eval_config.get("max_step", -1),
        )
    finally:
        evaluator.close()


if __name__ == "__main__":
    main()
