#!/usr/bin/env python3
"""Point-GNN TPU training on KITTI.

CLI parity with the reference driver (/root/reference/train.py:25-50):

    python3 train.py <train_config_path> <config_path> \
        [--dataset_root_dir D] [--dataset_split_file F]

Config names from the built-in registry (e.g. ``car_auto_T3_train``)
are accepted in place of file paths.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="Training of Point-GNN TPU")
    parser.add_argument(
        "train_config_path", type=str, help="Path to train_config"
    )
    parser.add_argument("config_path", type=str, help="Path to config")
    parser.add_argument(
        "--dataset_root_dir", type=str, default="../dataset/kitti/",
        help="Path to KITTI dataset",
    )
    parser.add_argument(
        "--dataset_split_file", type=str, default="",
        help="Path to the split file "
        "(default DATASET_ROOT_DIR/3DOP_splits/<train_dataset>)",
    )
    args = parser.parse_args()

    from pointgnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()

    from pointgnn_tpu.train.pipeline import DatasetSpec, FetchSpec
    from pointgnn_tpu.train.trainer import Trainer
    from pointgnn_tpu.utils import config_io

    train_config = config_io.load_train_config(args.train_config_path)
    config_complete = config_io.load_config(args.config_path)
    config = config_complete.get("train", config_complete)

    split_file = args.dataset_split_file or os.path.join(
        args.dataset_root_dir,
        "3DOP_splits",
        train_config["train_dataset"],
    )
    spec = DatasetSpec.from_kitti_root(
        args.dataset_root_dir, split_file, num_classes=config["num_classes"]
    )
    dataset = spec.build()
    num_frames = dataset.num_files
    if train_config.get("NUM_TEST_SAMPLE", -1) > 0:
        num_frames = min(num_frames, train_config["NUM_TEST_SAMPLE"])
    print("Training on %d frames" % num_frames)

    trainer = Trainer(
        config,
        train_config,
        FetchSpec(spec, config, train_config),
        num_frames=num_frames,
    )
    trainer.restore()
    try:
        trainer.train()
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
