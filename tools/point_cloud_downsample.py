#!/usr/bin/env python3
"""Simulate a lower-resolution LiDAR by dropping beams.

Behavioral parity with /root/reference/scripts/point_cloud_downsample.py:
cluster each point's elevation cosine into 64 beams (KMeans), keep every
``downsample_rate``-th beam (taking the midpoint between adjacent beam
centers as the boundary), and write new velodyne ``.bin`` files.

Usage:
    python tools/point_cloud_downsample.py <dataset_root> \
        [--split 3DOP_splits/val.txt] [--rate 2] [--output_dir DIR]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def beam_mask(
    xyz: np.ndarray, downsample_rate: int, n_beams: int = 64, seed: int = 0
) -> np.ndarray:
    """Boolean mask keeping every downsample_rate-th elevation beam."""
    from sklearn.cluster import KMeans

    norm = np.sqrt(np.sum(xyz * xyz, axis=1, keepdims=True))
    cos = (xyz[:, [2]] / np.maximum(norm, 1e-12)).astype(np.float64)
    kmeans = KMeans(n_clusters=n_beams, n_init=3, random_state=seed).fit(cos)
    centers = np.sort(np.squeeze(kmeans.cluster_centers_))
    centers = np.concatenate([[-1.0], centers, [1.0]])
    cos = np.squeeze(cos)
    mask = np.zeros(len(xyz), dtype=bool)
    for i in range(0, len(centers) - 2, downsample_rate):
        lower = (centers[i] + centers[i + 1]) / 2
        higher = (centers[i + 1] + centers[i + 2]) / 2
        mask |= (cos > lower) & (cos < higher)
    return mask


def main():
    parser = argparse.ArgumentParser(
        description="LiDAR beam downsampling for KITTI velodyne files"
    )
    parser.add_argument("dataset_root", type=str)
    parser.add_argument("--split", type=str, default="3DOP_splits/val.txt")
    parser.add_argument("--rate", type=int, default=2)
    parser.add_argument("--output_dir", type=str, default="")
    args = parser.parse_args()

    from pointgnn_tpu.data.kitti import KittiDataset

    dataset = KittiDataset(
        os.path.join(args.dataset_root, "image/training/image_2"),
        os.path.join(args.dataset_root, "velodyne/training/velodyne/"),
        os.path.join(args.dataset_root, "calib/training/calib/"),
        "",
        os.path.join(args.dataset_root, args.split),
        is_training=False,
    )
    output_dir = args.output_dir or os.path.join(
        args.dataset_root,
        "velodyne/training_downsampled_%d/velodyne/" % args.rate,
    )
    os.makedirs(output_dir, exist_ok=True)
    for frame_idx in range(dataset.num_files):
        points = dataset.get_velo_points(frame_idx)
        mask = beam_mask(points.xyz, args.rate)
        out = np.hstack([points.xyz[mask], points.attr[mask]]).astype(
            np.float32
        )
        out.tofile(
            os.path.join(output_dir, dataset.get_filename(frame_idx) + ".bin")
        )
        print(
            "%s: %d -> %d points"
            % (dataset.get_filename(frame_idx), points.n, mask.sum())
        )


if __name__ == "__main__":
    main()
