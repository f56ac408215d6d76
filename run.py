#!/usr/bin/env python3
"""Point-GNN TPU inference on KITTI.

CLI parity with the reference driver (/root/reference/run.py:25-59):

    python3 run.py <checkpoint_path> [--dataset_root_dir D] \
        [--dataset_split_file F] [--output_dir O] [--test] \
        [--no-box-merge] [--no-box-score] [--num_frames N]

The checkpoint directory must contain a frozen ``config`` (written by
train.py); detections are written in KITTI label format to
``<output_dir>/data/*.txt`` for the offline AP evaluator.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(
        description="Point-GNN TPU inference on KITTI"
    )
    parser.add_argument("checkpoint_path", type=str, help="Path to checkpoint")
    parser.add_argument(
        "-l", "--level", type=int, default=0,
        help="Visualization level: 0 off, >=1 writes detection overlays "
        "and BEV plots to OUTPUT_DIR/vis, >=2 additionally renders 3D "
        "views (interactive Open3D windows when open3d is importable, "
        "saved renders / BEV fallbacks otherwise)",
    )
    parser.add_argument(
        "--fast", dest="fast", action="store_true", default=False,
        help="Build graphs on the TPU (on-device grid radius search + "
        "bf16 MXU). On TPU the slab kernels compute the EXACT uncapped "
        "radius graph (the reference's runtime num_neighbors=-1 "
        "semantics); the CPU fallback caps neighbor lists per center.",
    )
    parser.add_argument(
        "--test", dest="test", action="store_true", default=False,
        help="Run on the test split (no labels)",
    )
    parser.add_argument(
        "--no-box-merge", dest="use_box_merge", action="store_false",
        default=True, help="Disable box merge",
    )
    parser.add_argument(
        "--no-box-score", dest="use_box_score", action="store_false",
        default=True, help="Disable box score",
    )
    parser.add_argument(
        "--dataset_root_dir", type=str, default="../dataset/kitti/",
        help="Path to KITTI dataset",
    )
    parser.add_argument(
        "--dataset_split_file", type=str, default="",
        help="Path to dataset split file (default 3DOP_splits/val.txt)",
    )
    parser.add_argument(
        "--output_dir", type=str, default="",
        help="Detection output dir (default CHECKPOINT_PATH/eval/)",
    )
    parser.add_argument(
        "--num_frames", type=int, default=-1,
        help="Limit the number of frames (debug)",
    )
    args = parser.parse_args()

    from pointgnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()

    from pointgnn_tpu.data.kitti import KittiDataset
    from pointgnn_tpu.infer import InferencePipeline
    from pointgnn_tpu.utils import config_io

    dataset_dir = args.dataset_root_dir
    split_file = args.dataset_split_file or os.path.join(
        dataset_dir, "3DOP_splits/val.txt"
    )
    output_dir = args.output_dir or os.path.join(
        args.checkpoint_path, "eval"
    )
    config_path = os.path.join(args.checkpoint_path, "config")
    assert os.path.isfile(config_path), (
        "No config file found in %s" % args.checkpoint_path
    )
    config = config_io.load_config(config_path)

    if args.test:
        dataset = KittiDataset(
            os.path.join(dataset_dir, "image/testing/image_2"),
            os.path.join(dataset_dir, "velodyne/testing/velodyne/"),
            os.path.join(dataset_dir, "calib/testing/calib/"),
            "",
            num_classes=config["num_classes"],
            is_training=False,
        )
    else:
        dataset = KittiDataset(
            os.path.join(dataset_dir, "image/training/image_2"),
            os.path.join(dataset_dir, "velodyne/training/velodyne/"),
            os.path.join(dataset_dir, "calib/training/calib/"),
            os.path.join(dataset_dir, "labels/training/label_2"),
            split_file,
            num_classes=config["num_classes"],
        )

    pipeline = InferencePipeline(
        config,
        checkpoint_dir=args.checkpoint_path,
        use_box_merge=args.use_box_merge,
        use_box_score=args.use_box_score,
        on_device_graph=args.fast,
    )
    print("Restored step %d from %s" % (
        pipeline.restored_step, args.checkpoint_path
    ))
    averages = pipeline.run_dataset(
        dataset, output_dir, num_frames=args.num_frames, is_test=args.test,
        visualization_level=args.level,
    )
    print("Detections written to %s/data" % output_dir)
    return averages


if __name__ == "__main__":
    main()
