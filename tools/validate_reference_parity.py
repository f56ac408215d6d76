#!/usr/bin/env python3
"""One-command AP parity check against the reference's trained weights.

Pipeline: TF-checkpoint ``.npz`` dump -> weight conversion -> orbax
checkpoint -> inference over the KITTI split -> official C++ AP
evaluator -> side-by-side diff against BASELINE.md's published numbers.

The reference's deliverable is its trained checkpoints scored by the
offline evaluator (/root/reference/README.md:110-118); this tool is the
equivalent acceptance procedure for this framework.  It needs real
KITTI data, which this environment lacks — but the car_auto_T0/T1
weight blobs ARE shipped here, and tools/oracle_reference_parity.py
runs the numeric half of this check (restored reference TF graph vs
converted-JAX forward on identical graph tensors) without any dataset.
Run THIS tool on a machine with the reference checkout + real KITTI:

1. Dump the TF checkpoint (needs TF 1.x or 2.x, one line):

       import numpy as np, tensorflow as tf
       r = tf.train.NewCheckpointReader(
           "checkpoints/car_auto_T3_train/model-1400000")
       np.savez("car_T3.npz", **{k: r.get_tensor(k)
                                 for k in r.get_variable_to_shape_map()})

2. Validate:

       python tools/validate_reference_parity.py car_T3.npz \
           checkpoints/car_auto_T3_train/config \
           --dataset_root_dir <kitti root> \
           [--dataset_split_file 3DOP_splits/val.txt] \
           [--min_moderate_3d 78.9]

Exit code 0 when report-only or all gated metrics pass, 1 otherwise.
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# Published (paper) KITTI TEST-server 11-point APs (BASELINE.md).  The
# val split typically scores a few points higher than the test server;
# these are the reference points shown in the diff column.
BASELINE_AP = {
    "Car_3d": (88.33, 79.47, 72.29),
    "Car_bev": (93.11, 89.17, 83.90),
    "Pedestrian_3d": (51.92, 43.77, 40.14),
    "Cyclist_3d": (78.60, 63.48, 57.08),
}
_DIFFICULTIES = ("easy", "moderate", "hard")


def score_against_baseline(results, min_moderate_3d=-1.0):
    """Diff evaluator output against BASELINE_AP.

    Returns ``(rows, failed, messages)`` where rows are
    ``(key, got, baseline, delta)``.  A requested gate over ZERO
    produced metrics fails: the evaluator emits no rows for classes
    with no ground truths, and a vacuous run must not certify parity.
    """
    rows, messages = [], []
    failed = False
    gated_seen = 0
    for key, base in sorted(BASELINE_AP.items()):
        cls, metric = key.split("_")
        for di, diff_name in enumerate(_DIFFICULTIES):
            rkey = "%s_%s_%s" % (cls, metric, diff_name)
            if rkey not in results:
                continue
            got = results[rkey]["ap"]
            rows.append((rkey, got, base[di], got - base[di]))
            if (
                min_moderate_3d >= 0
                and metric == "3d"
                and diff_name == "moderate"
            ):
                gated_seen += 1
                if got < min_moderate_3d:
                    failed = True
                    messages.append(
                        "FAIL: %s %.2f below --min_moderate_3d %.2f"
                        % (rkey, got, min_moderate_3d)
                    )
    if min_moderate_3d >= 0 and gated_seen == 0:
        failed = True
        messages.append(
            "FAIL: --min_moderate_3d given but no moderate-3D AP rows "
            "were produced (no matching ground truths?)"
        )
    return rows, failed, messages


def main():
    parser = argparse.ArgumentParser(
        description="reference-checkpoint AP parity runner"
    )
    parser.add_argument("npz", type=str, help=".npz dump of TF variables")
    parser.add_argument("config", type=str, help="reference config JSON")
    parser.add_argument("--dataset_root_dir", type=str, required=True)
    parser.add_argument("--dataset_split_file", type=str, default="")
    parser.add_argument("--workdir", type=str, default="")
    parser.add_argument("--step", type=int, default=0)
    parser.add_argument("--num_frames", type=int, default=-1)
    parser.add_argument(
        "--fast", action="store_true",
        help="on-device graph construction (slab kernels)",
    )
    parser.add_argument(
        "--min_moderate_3d", type=float, default=-1.0,
        help="exit 1 if any baseline class's moderate 3D AP lands "
             "below this; report-only by default",
    )
    parser.add_argument(
        "--capacity", type=str, default="",
        help="override the padded graph capacity as "
             "'v0,v1,v2:e0,e1' (default: the family's runtime "
             "capacity; small buckets keep CPU test runs fast)",
    )
    args = parser.parse_args()

    from pointgnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    import tempfile

    import numpy as np

    from pointgnn_tpu.data.kitti import KittiDataset
    from pointgnn_tpu.infer import InferencePipeline
    from pointgnn_tpu.postprocess import kitti_eval
    from pointgnn_tpu.train import checkpoint as ckpt
    from pointgnn_tpu.train.convert import convert_reference_weights
    from pointgnn_tpu.utils.config_io import load_config

    work = args.workdir or tempfile.mkdtemp(prefix="pointgnn_parity_")
    train_dir = os.path.join(work, "train_dir")
    result_dir = os.path.join(work, "results")

    # 1. convert ------------------------------------------------------
    config = load_config(args.config)
    tf_vars = dict(np.load(args.npz))
    params = convert_reference_weights(
        tf_vars,
        config["model_kwargs"]["layer_configs"],
        config["num_classes"],
    )
    os.makedirs(train_dir, exist_ok=True)
    ckpt.save_checkpoint(
        train_dir, args.step, {"params": params}, config=config
    )
    n_arrays = len(
        __import__("jax").tree_util.tree_leaves(params)
    )
    print("[1/3] converted %d arrays -> %s" % (n_arrays, train_dir))

    # 2. inference over the split -------------------------------------
    root = args.dataset_root_dir
    split_file = args.dataset_split_file or os.path.join(
        root, "3DOP_splits/val.txt"
    )
    dataset = KittiDataset(
        os.path.join(root, "image/training/image_2"),
        os.path.join(root, "velodyne/training/velodyne/"),
        os.path.join(root, "calib/training/calib/"),
        os.path.join(root, "labels/training/label_2"),
        split_file,
        num_classes=config["num_classes"],
    )
    capacity = None
    if args.capacity:
        from pointgnn_tpu.graph.pad import GraphCapacity

        v, e = args.capacity.split(":")
        capacity = GraphCapacity(
            vertices=tuple(int(x) for x in v.split(",")),
            edges=tuple(int(x) for x in e.split(",")),
        )
    pipeline = InferencePipeline(
        config, checkpoint_dir=train_dir, on_device_graph=args.fast,
        capacity=capacity,
    )
    pipeline.run_dataset(dataset, result_dir, num_frames=args.num_frames)
    print("[2/3] detections -> %s/data" % result_dir)

    # 3. official AP + baseline diff ----------------------------------
    gt_dir = os.path.join(root, "labels/training/label_2")
    results = kitti_eval.evaluate(gt_dir, result_dir)
    print("[3/3] official AP vs BASELINE.md (KITTI test-server paper "
          "numbers; val runs usually score a few points higher):")
    rows, failed, messages = score_against_baseline(
        results, args.min_moderate_3d
    )
    if not rows:
        print("no baseline-matched classes found in the results; raw:")
        for k in sorted(results):
            print("  %s: %.2f" % (k, results[k]["ap"]))
    for rkey, got, base, delta in rows:
        print("  %-28s %7.2f  baseline %6.2f  delta %+6.2f"
              % (rkey, got, base, delta))
    with open(os.path.join(work, "parity_report.json"), "w") as f:
        json.dump(
            {
                "results": results,
                "baseline": {k: list(v) for k, v in BASELINE_AP.items()},
                "npz": os.path.abspath(args.npz),
                "split": split_file,
                "fast": args.fast,
            },
            f, indent=2,
        )
    print("report: %s/parity_report.json" % work)
    for msg in messages:
        print(msg)
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
