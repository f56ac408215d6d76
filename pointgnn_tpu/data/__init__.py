from pointgnn_tpu.data.kitti import KittiDataset  # noqa: F401
