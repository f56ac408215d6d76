"""Inference pipeline: device decode + host NMS + KITTI output, and
checkpoint save/restore round trip."""

import os

import jax
import numpy as np
import pytest

from pointgnn_tpu import configs
from pointgnn_tpu.graph.pad import GraphCapacity
from pointgnn_tpu.infer import (
    InferencePipeline,
    input_feature_dim,
    occlusion_score,
    select_input_features,
)
from pointgnn_tpu.train import checkpoint as ckpt
from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

SMALL_CAP = GraphCapacity(vertices=(4096, 1024, 1024), edges=(16384, 32768))


def test_select_input_features():
    attr = np.arange(20, dtype=np.float32).reshape(5, 4)
    assert select_input_features(attr, "irgb").shape == (5, 4)
    assert select_input_features(attr, "rgb").shape == (5, 3)
    i = select_input_features(attr, "i")
    np.testing.assert_array_equal(i[:, 0], attr[:, 0])
    z = select_input_features(attr, "0rgb")
    assert (z[:, 0] == 0).all()
    np.testing.assert_array_equal(z[:, 1:], attr[:, 1:])
    assert (select_input_features(attr, "0000") == 0).all()
    i000 = select_input_features(attr, "i000")
    np.testing.assert_array_equal(i000[:, 0], attr[:, 0])
    assert (i000[:, 1:] == 0).all()
    for mode in ("irgb", "rgb", "0rgb", "0000", "i000", "i", "0"):
        assert select_input_features(attr, mode).shape[1] == (
            input_feature_dim(mode)
        )


def test_occlusion_score():
    box = np.array([0.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.0])
    # points spanning the full box -> coverage ~1
    corners_like = np.array(
        [[-1.99, -1.99, -0.99], [1.99, -0.01, 0.99]]
    )
    assert occlusion_score(box, corners_like) == pytest.approx(1.0, abs=0.05)
    # no points -> 0
    assert occlusion_score(box, np.zeros((0, 3))) == 0.0
    # half-length span -> ~0.5
    half = np.array([[-1.0, -1.99, -0.99], [1.0, -0.01, 0.99]])
    assert occlusion_score(box, half) == pytest.approx(0.5, abs=0.05)


@pytest.fixture(scope="module")
def pipeline():
    cfg = configs.model_config("Car", T=1)
    return InferencePipeline(cfg, capacity=SMALL_CAP, seed=0)


def test_run_frame_shapes(pipeline):
    points, _ = synthetic_lidar_frame(seed=0)
    pts = points.mask(np.arange(3000))
    cls, boxes, scores, aux = pipeline.run_frame(pts)
    assert boxes.shape[1:] == (7,)
    assert len(cls) == len(scores) == len(boxes)
    # horizontal/vertical folding: only odd class ids survive
    assert all(c in (1,) for c in cls.tolist())
    assert aux["hyp_xyz"].shape[1] == 3


def test_run_frame_empty_input(pipeline):
    """A 0-point frame (degenerate frustum crop) must yield 0 detections
    through the host path, not crash in the voxel downsampler."""
    from pointgnn_tpu.core.points import Points

    empty = Points(
        xyz=np.zeros((0, 3), np.float32), attr=np.zeros((0, 4), np.float32)
    )
    cls, boxes, scores, _ = pipeline.run_frame(empty)
    assert len(cls) == len(boxes) == len(scores) == 0


def test_detections_to_kitti(pipeline):
    # an identity-like calib projecting cam coords with f=700
    calib = {
        "cam_to_image": np.array(
            [[700.0, 0, 621, 0], [0, 700.0, 187, 0], [0, 0, 1, 0]]
        )
    }
    cls = np.array([1])
    boxes = np.array([[0.0, 1.5, 20.0, 4.0, 1.6, 1.8, 0.3]])
    scores = np.array([0.8])
    aux = {
        "hyp_xyz": np.array([[0.0, 1.0, 20.0]]),
        "probs_ori": np.array([0.8]),
    }
    preds = pipeline.detections_to_kitti(cls, boxes, scores, calib, aux)
    assert len(preds) == 1
    name, _, _, _, xmin, ymin, xmax, ymax, h, w, l = preds[0][:11]
    assert name == "Car"
    assert 0 <= xmin < xmax <= 1242 and 0 <= ymin < ymax <= 375
    assert (h, w, l) == (1.6, 1.8, 4.0)
    # occlusion rescoring multiplies by (1 + occ) >= 1
    assert preds[0][-1] >= 0.8


def test_checkpoint_roundtrip(tmp_path, pipeline):
    state = {"params": pipeline.params, "step": np.asarray(7)}
    d = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(
        d, 7, state, config=pipeline.config, train_config={"batch_size": 4}
    )
    assert ckpt.latest_checkpoint(d).endswith("model-7")
    restored, step = ckpt.restore_checkpoint(d)
    assert step == 7
    leaves1 = jax.tree_util.tree_leaves(state["params"])
    leaves2 = jax.tree_util.tree_leaves(restored["params"])
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # frozen config contract
    assert os.path.isfile(os.path.join(d, "config"))
    assert os.path.isfile(os.path.join(d, "train_config"))
    # empty dir -> (None, 0)
    none_state, step0 = ckpt.restore_checkpoint(str(tmp_path / "nope"))
    assert none_state is None and step0 == 0


def test_pipeline_from_checkpoint(tmp_path, pipeline):
    d = str(tmp_path / "ckpt2")
    ckpt.save_checkpoint(
        d, 3, {"params": pipeline.params}, config=pipeline.config
    )
    p2 = InferencePipeline(
        pipeline.config, checkpoint_dir=d, capacity=SMALL_CAP
    )
    assert p2.restored_step == 3
    points, _ = synthetic_lidar_frame(seed=1)
    pts = points.mask(np.arange(2000))
    r1 = pipeline.run_frame(pts)
    r2 = p2.run_frame(pts)
    np.testing.assert_allclose(r1[1], r2[1], rtol=1e-5)


def test_stream_matches_run_frame():
    """stream() (batched lax.map + prefetch pipeline) must produce the
    same detections as per-frame run_frame on the same frames."""
    from pointgnn_tpu.graph import device_builder as db

    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=4096, num_keypoints=1024,
        per_center_caps=(16, 128), cell_caps=(32, 128),
    )
    pipe = InferencePipeline(
        cfg, on_device_graph=True, device_spec=spec,
        use_box_score=False, seed=5,
    )
    frames = []
    for i in range(5):  # odd count exercises the padded tail batch
        pts, _ = synthetic_lidar_frame(seed=i)
        frames.append(pts.__class__(xyz=pts.xyz[:3000], attr=pts.attr[:3000]))
    singles = [pipe.run_frame(p) for p in frames]
    streamed = list(pipe.stream(frames, batch=2))
    assert len(streamed) == len(singles)
    for (c1, b1, s1, _), (c2, b2, s2, _) in zip(singles, streamed):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_allclose(b1, b2, atol=1e-6)
        np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_run_dataset_stream_matches_sequential(tmp_path):
    """run_dataset's streamed path (on-device graphs) writes the same
    KITTI text files as the sequential per-frame path."""
    import subprocess
    import sys

    from pointgnn_tpu.data.kitti import KittiDataset
    from pointgnn_tpu.graph import device_builder as db

    root = str(tmp_path / "kitti")
    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "make_synthetic_kitti.py"),
            root, "3",
        ],
        check=True,
    )
    dataset = KittiDataset(
        os.path.join(root, "image/training/image_2"),
        os.path.join(root, "velodyne/training/velodyne"),
        os.path.join(root, "calib/training/calib"),
        os.path.join(root, "labels/training/label_2"),
        num_classes=4,
    )
    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=8192, num_keypoints=2048,
        per_center_caps=(16, 128), cell_caps=(32, 64),
    )
    pipe = InferencePipeline(
        cfg, on_device_graph=True, device_spec=spec, seed=4,
        pallas_tail=False, slab=False,
    )
    out_stream = str(tmp_path / "out_stream")
    pipe.run_dataset(dataset, out_stream, verbose=False)

    out_seq = str(tmp_path / "out_seq")
    rng = np.random.default_rng(0)
    for i in range(dataset.num_files):
        points = dataset.get_cam_points_in_image_with_rgb(
            i, cfg.get("downsample_by_voxel_size")
        )
        calib = dataset.get_calib(i)
        cls, boxes, scores, aux = pipe.run_frame(points, rng)
        pred = pipe.detections_to_kitti(cls, boxes, scores, calib, aux)
        pipe._write_kitti_txt(dataset, i, out_seq, pred)
    # the batched (lax.map) and single-frame programs compile
    # separately, so values match only to float noise — compare fields
    for i in range(dataset.num_files):
        name = dataset.get_filename(i) + ".txt"
        la = [
            ln.split() for ln in
            open(os.path.join(out_stream, "data", name)).read().splitlines()
            if ln.strip()
        ]
        lb = [
            ln.split() for ln in
            open(os.path.join(out_seq, "data", name)).read().splitlines()
            if ln.strip()
        ]
        assert len(la) == len(lb), name
        for ra, rb in zip(la, lb):
            assert ra[0] == rb[0]
            np.testing.assert_allclose(
                np.array(ra[1:], dtype=np.float64),
                np.array(rb[1:], dtype=np.float64),
                rtol=1e-4, atol=1e-4, err_msg=name,
            )


def test_slab_l1_mode_wiring():
    """slab='l1' enables the level-1 slab kernel only; level 0 keeps the
    edge list (and the flag survives the truthiness gauntlet)."""
    from pointgnn_tpu.graph import device_builder as db

    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=2048, num_keypoints=512,
        per_center_caps=(16, 64), cell_caps=(32, 64),
    )
    pipe = InferencePipeline(
        cfg, on_device_graph=True, device_spec=spec, seed=4,
        pallas_tail=False, slab="l1",
    )
    assert pipe.slab == "l1"
    assert pipe.device_spec.slab_level1 is True
    assert pipe.device_spec.slab_level0 is False
    assert pipe.model.slab_level1 is not None
    assert pipe.model.slab_level0 is None
    pts, _ = synthetic_lidar_frame(seed=0)
    pts = pts.__class__(xyz=pts.xyz[:1500], attr=pts.attr[:1500])
    cls, boxes, scores, _ = pipe.run_frame(pts)
    assert boxes.shape[1] == 7


def test_preset_slab_flags_cleared_when_slab_off():
    """A slab-flagged spec (e.g. frozen into a device_graph checkpoint's
    train_config) passed to a pipeline where slab resolves False must
    have its flags CLEARED — otherwise build_padded_graph emits slab
    metadata plus dummy 1-edge lists that a non-slab model aggregates
    as the whole graph (silently wrong detections)."""
    from pointgnn_tpu.graph import device_builder as db

    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=2048, num_keypoints=512,
        per_center_caps=(16, 64), cell_caps=(32, 64),
    )
    flagged = spec._replace(slab_level1=True, slab_level0=True)
    pipe = InferencePipeline(
        cfg, on_device_graph=True, device_spec=flagged, seed=4,
        pallas_tail=False, slab=False,
    )
    assert pipe.slab is False
    assert pipe.device_spec.slab_level1 is False
    assert pipe.device_spec.slab_level0 is False
    assert pipe.model.slab_level1 is None
    assert pipe.model.slab_level0 is None
    # and the resulting detections match a never-flagged pipeline
    ref = InferencePipeline(
        cfg, on_device_graph=True, device_spec=spec, seed=4,
        pallas_tail=False, slab=False,
    )
    pts, _ = synthetic_lidar_frame(seed=0)
    pts = pts.__class__(xyz=pts.xyz[:1500], attr=pts.attr[:1500])
    out_a = pipe.run_frame(pts)
    out_b = ref.run_frame(pts)
    np.testing.assert_allclose(
        np.asarray(out_a[1], np.float64),
        np.asarray(out_b[1], np.float64), rtol=1e-5, atol=1e-6,
    )


def test_host_path_auto_grows_capacity():
    """The host path must never silently truncate: an undersized bucket
    grows to fit the frame (recompile) and yields the same detections
    as a correctly-sized bucket.  auto_capacity=False restores the old
    truncating behavior (with its warning)."""
    import warnings

    cfg = configs.model_config("Car", T=1)
    points, _ = synthetic_lidar_frame(seed=3)
    pts = points.mask(np.arange(4000))

    tiny = GraphCapacity(vertices=(512, 128, 128), edges=(1024, 2048))
    auto = InferencePipeline(cfg, capacity=tiny, seed=0)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cls_a, boxes_a, scores_a, _ = auto.run_frame(
            pts, np.random.default_rng(0)
        )
    assert not any(
        "overflow" in str(w.message) for w in caught
    ), [str(w.message) for w in caught]
    assert auto.capacity.edges[0] > tiny.edges[0]

    big = InferencePipeline(cfg, capacity=auto.capacity, seed=0)
    cls_b, boxes_b, scores_b, _ = big.run_frame(
        pts, np.random.default_rng(0)
    )
    assert len(cls_a) == len(cls_b)
    np.testing.assert_allclose(scores_a, scores_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(boxes_a, boxes_b, rtol=1e-5, atol=1e-5)

    trunc = InferencePipeline(
        cfg, capacity=tiny, seed=0, auto_capacity=False
    )
    with pytest.warns(RuntimeWarning, match="overflow"):
        trunc.run_frame(pts, np.random.default_rng(0))
    assert trunc.capacity == tiny


def test_stream_accounts_keypoint_overflow():
    """stream() (the production serving loop) must surface keypoint
    overflow like run_frame does: counters accumulate and a
    RuntimeWarning fires when occupied voxels exceed the keypoint
    bucket — silent loss is a padded-design-only regression."""
    import warnings

    from pointgnn_tpu.graph import device_builder as db

    cfg = configs.model_config("Car", T=0)
    # keypoint bucket far below the frame's occupied-voxel count
    spec = db.spec_from_config(
        cfg, num_points=4096, num_keypoints=8,
        per_center_caps=(8, 16), cell_caps=(8, 16),
    )
    pipe = InferencePipeline(
        cfg, on_device_graph=True, device_spec=spec,
        use_box_score=False, seed=0,
    )
    pts, _ = synthetic_lidar_frame(seed=0)
    pts = pts.__class__(xyz=pts.xyz[:3000], attr=pts.attr[:3000])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        list(pipe.stream([pts, pts], batch=2, raw=True))
    assert pipe.overflow_counters.get("keypoints_dropped", 0) > 0
    assert any(
        "keypoint overflow" in str(w.message) for w in caught
    ), [str(w.message) for w in caught]
    assert pipe.frames_done == 2  # raw streaming still counts frames


def test_frames_done_counts_empty_frames():
    """Stage-time averages divide by frames_done, so frames with zero
    surviving detections must still count (both tail paths)."""
    cfg = configs.model_config("Car", T=0)
    from pointgnn_tpu.graph import device_builder as db

    spec = db.spec_from_config(
        cfg, num_points=2048, num_keypoints=256,
        per_center_caps=(8, 16), cell_caps=(8, 16),
    )
    pipe = InferencePipeline(
        cfg, on_device_graph=True, device_spec=spec,
        use_box_score=False, seed=0,
    )
    before = pipe.frames_done
    # empty device outputs -> the _finish_frame early return
    out = pipe._finish_frame(
        np.zeros(4), np.zeros(4, np.int64),
        np.zeros((4, 7)), np.zeros((4, 3)),
    )
    assert len(out[0]) == 0
    assert pipe.frames_done == before + 1
