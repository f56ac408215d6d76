"""Tools + visualization: beam downsampler, crop-library CLI, headless
renders, and the run.py CLI with visualization enabled."""

import os
import subprocess
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tools_kitti"))
    subprocess.run(
        [sys.executable, os.path.join(TOOLS, "make_synthetic_kitti.py"),
         root, "2"],
        check=True,
    )
    return root


def test_beam_mask_drops_beams():
    sys.path.insert(0, TOOLS)
    from point_cloud_downsample import beam_mask

    rng = np.random.default_rng(0)
    n = 6000
    # synthesize 64 beams: elevation angles in distinct bands
    beams = rng.integers(0, 64, n)
    elev = -0.3 + beams * 0.01 + rng.normal(0, 5e-4, n)
    dist = rng.uniform(5, 60, n)
    xyz = np.column_stack(
        [
            dist * np.cos(elev),
            np.zeros(n),
            dist * np.sin(elev),
        ]
    )
    mask = beam_mask(xyz, downsample_rate=2)
    # roughly half the points survive
    assert 0.3 < mask.mean() < 0.7


def test_point_cloud_downsample_cli(kitti_root, tmp_path):
    out = str(tmp_path / "ds")
    subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "point_cloud_downsample.py"),
            kitti_root, "--split", "3DOP_splits/val.txt", "--rate", "2",
            "--output_dir", out,
        ],
        check=True,
    )
    data = np.fromfile(os.path.join(out, "000000.bin"), np.float32)
    assert data.size % 4 == 0 and data.size > 0


def test_build_crop_library_cli(kitti_root, tmp_path):
    out = str(tmp_path / "crops.json")
    subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "build_crop_library.py"),
            kitti_root, out, "--split", "3DOP_splits/train.txt",
            "--min_points", "5",
        ],
        check=True,
    )
    from pointgnn_tpu.data.crop_aug import load_cropped_boxes

    labels, points = load_cropped_boxes(out)
    assert "Car" in labels and len(labels["Car"]) > 0


def test_vis_draw(kitti_root, tmp_path):
    from pointgnn_tpu.data.kitti import KittiDataset
    from pointgnn_tpu.utils import vis

    ds = KittiDataset(
        os.path.join(kitti_root, "image/training/image_2"),
        os.path.join(kitti_root, "velodyne/training/velodyne"),
        os.path.join(kitti_root, "calib/training/calib"),
        os.path.join(kitti_root, "labels/training/label_2"),
        num_classes=4,
    )
    image = ds.get_image(0)
    labels = ds.get_label(0)
    calib = ds.get_calib(0)
    out2d = vis.draw_2d_boxes(image, labels)
    assert out2d.shape == image.shape and not (out2d == image).all()
    boxes = np.array([[3.0, 1.65, 20.0, 4.0, 1.6, 1.8, 0.05]])
    out3d = vis.draw_3d_boxes(image, boxes, calib, scores=[0.9])
    assert not (out3d == image).all()
    bev_path = vis.plot_bev(
        ds.get_cam_points_in_image(0).xyz, boxes, boxes,
        path=str(tmp_path / "bev.png"),
    )
    assert os.path.getsize(bev_path) > 0
    pred = [("Car", -1, -1, 0, 100.0, 100.0, 200.0, 180.0,
             1.6, 1.8, 4.0, 3.0, 1.65, 20.0, 0.05, 0.9)]
    img_path = vis.save_detection_image(
        image, pred, calib, str(tmp_path / "det.png")
    )
    assert os.path.getsize(img_path) > 0
    # graph BEV viewer
    pts = ds.get_cam_points_in_image(0)
    from pointgnn_tpu import configs
    from pointgnn_tpu.graph import builder

    cfg = configs.model_config("Car", T=0)
    vcl, kil, el = builder.gen_multi_level_local_graph_v3(
        pts.xyz, **cfg["graph_gen_kwargs"],
        rng=np.random.default_rng(0),
    )
    gpath = vis.plot_graph_bev(
        vcl[0], el[0], center_xyz=vcl[1],
        path=str(tmp_path / "graph.png"),
    )
    assert os.path.getsize(gpath) > 0


def test_run_cli_with_vis(kitti_root, tmp_path):
    # checkpoint with random weights (T0: fastest to compile on CPU)
    import jax

    from pointgnn_tpu import configs
    from pointgnn_tpu.model.pointgnn import PointGNN
    from pointgnn_tpu.train import checkpoint as ckpt

    cfg = configs.model_config("Car", T=0)
    model = PointGNN(
        num_classes=4, box_encoding_len=7,
        layer_configs=cfg["model_kwargs"]["layer_configs"], mode="test",
    )
    params = model.init(jax.random.PRNGKey(0), input_dim=1)
    ck = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(ck, 0, {"params": params}, config=cfg)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "run.py"),
            ck, "--dataset_root_dir", kitti_root, "--num_frames", "1",
            "-l", "1",
        ],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    det_file = os.path.join(ck, "eval/data/000000.txt")
    assert os.path.isfile(det_file)
    # golden format: every line round-trips through the KITTI parser
    from pointgnn_tpu.data.kitti import parse_label_line

    with open(det_file) as f:
        for line in f:
            label = parse_label_line(line)
            if label is not None:
                assert label["name"] in ("Car", "Pedestrian", "Cyclist")
                assert "score" in label
    vis_dir = os.path.join(ck, "eval/vis")
    assert os.path.isfile(os.path.join(vis_dir, "000000.png"))
    assert os.path.isfile(os.path.join(vis_dir, "000000_bev.png"))


def test_make_splits_cli(kitti_root, tmp_path):
    out = str(tmp_path / "train_car.txt")
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "make_splits.py"),
         kitti_root,
         "--classes", "Car", "--output", out],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    with open(out) as f:
        ids = [line.strip() for line in f if line.strip()]
    assert ids, "synthetic dataset has Car frames"
    # every listed frame really contains a Car
    from pointgnn_tpu.data.kitti import parse_label_line

    for fid in ids:
        with open(
            os.path.join(
                kitti_root, "labels", "training", "label_2", fid + ".txt"
            )
        ) as f:
            labels = [parse_label_line(l) for l in f if l.strip()]
        assert any(l and l["name"] == "Car" for l in labels)

    # base-split restriction is honored
    base = str(tmp_path / "base.txt")
    with open(base, "w") as f:
        f.write(ids[0] + "\n")
    out2 = str(tmp_path / "sub.txt")
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "make_splits.py"),
         kitti_root,
         "--classes", "Car", "--base-split", base, "--output", out2],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    with open(out2) as f:
        assert [line.strip() for line in f if line.strip()] == [ids[0]]


def test_synthetic_kitti_ped_cyl_classes(tmp_path):
    """The generator emits Pedestrian/Cyclist objects and the 6-class
    label assignment finds foreground points on them."""
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_kitti import main as make_kitti

    from pointgnn_tpu import configs
    from pointgnn_tpu.train.pipeline import DatasetSpec, FetchSpec, build_fetch

    root = str(tmp_path / "kitti")
    make_kitti(root, 2, classes=("Pedestrian", "Cyclist"))
    config = configs.model_config("Pedestrian_and_Cyclist", T=1)
    tc = configs.train_config("Pedestrian_and_Cyclist")
    tc["data_aug_configs"] = []
    spec = DatasetSpec.from_kitti_root(
        root, num_classes=config["num_classes"]
    )
    fetch = build_fetch(FetchSpec(spec, config, tc))
    fd = fetch(0, 1)
    labels = np.asarray(fd.cls_labels).ravel()
    # classes: 0 bg, 1/2 pedestrian h/v, 3/4 cyclist h/v, 5 DontCare
    hist = np.bincount(labels, minlength=6)
    assert hist[1] + hist[2] > 0, "no pedestrian points labeled"
    assert hist[3] + hist[4] > 0, "no cyclist points labeled"


def test_interactive_viewers_headless_fallback(tmp_path):
    """Without open3d, the interactive viewers must degrade to the
    headless PNG writers (reference Open3D debug views,
    kitti_dataset.py:1286-1395 / crop_aug.py:211-243)."""
    import numpy as np

    from pointgnn_tpu.utils import interactive

    rng = np.random.RandomState(0)
    xyz = rng.rand(200, 3).astype(np.float32) * 10
    box = np.array([5.0, 1.0, 5.0, 2.0, 1.5, 1.0, 0.3])
    p1 = interactive.vis_points(
        xyz, label_list=[{"name": "Car", "box": box}],
        save_path=str(tmp_path / "pts.png"),
    )
    src = rng.randint(0, 200, 50)
    dst = rng.randint(0, 200, 50)
    p2 = interactive.vis_graph(
        xyz, src, dst, save_path=str(tmp_path / "graph.png")
    )
    p3 = interactive.vis_detections(
        xyz, [box], names=["Car"], save_path=str(tmp_path / "det.png")
    )
    p4 = interactive.vis_crop_aug(
        xyz, xyz[:20] + 1.0, box, save_path=str(tmp_path / "crop.png")
    )
    import os

    for p in (p1, p2, p3, p4):
        assert p is not None and os.path.isfile(p), p


def test_profile_inference_stage_breakdown():
    """tools/profile_inference.profile returns the full stage dict on a
    tiny spec (CPU path: the XLA device-graph builder, no slab)."""
    sys.path.insert(0, TOOLS)
    import profile_inference

    from pointgnn_tpu import configs
    from pointgnn_tpu.graph import device_builder as db

    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=512, num_keypoints=128,
        cell_caps=(8, 16), per_center_caps=(8, 16),
    )
    out = profile_inference.profile(cfg, spec, reps=2, probe=False)
    for key in ("put_ms", "total_ms", "graph_ms", "gnn_ms", "tail_ms",
                "cold_frame_ms"):
        assert key in out, key
    assert out["total_ms"] > 0 and out["gnn_ms"] > 0
    assert out["cold_frame_ms"] == pytest.approx(
        out["put_ms"] + out["total_ms"], abs=0.02
    )


def test_run_cli_test_split(tmp_path):
    """run.py --test: the KITTI test-server path — a labels-free
    ``testing/`` tree in (reference run.py:69-84), detection .txt out."""
    import jax

    from pointgnn_tpu import configs
    from pointgnn_tpu.model.pointgnn import PointGNN
    from pointgnn_tpu.train import checkpoint as ckpt

    root = str(tmp_path / "kitti_test")
    subprocess.run(
        [sys.executable, os.path.join(TOOLS, "make_synthetic_kitti.py"),
         root, "2", "Car", "--split", "testing"],
        check=True,
    )
    assert not os.path.isdir(os.path.join(root, "labels"))
    cfg = configs.model_config("Car", T=0)
    model = PointGNN(
        num_classes=4, box_encoding_len=7,
        layer_configs=cfg["model_kwargs"]["layer_configs"], mode="test",
    )
    params = model.init(jax.random.PRNGKey(0), input_dim=1)
    ck = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(ck, 0, {"params": params}, config=cfg)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "run.py"),
            ck, "--dataset_root_dir", root, "--test",
            "--num_frames", "1",
        ],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.isfile(os.path.join(ck, "eval/data/000000.txt"))


def test_tune_slab_kernels_variant_parsing():
    sys.path.insert(0, TOOLS)
    import tune_slab_kernels as tsk

    assert tsk.parse_variants("16x32, 32x64") == [
        {"block_centers": 16, "tile": 32},
        {"block_centers": 32, "tile": 64},
    ]
    assert tsk.parse_variants("") == []


def test_tune_slab_kernels_per_level_variants():
    sys.path.insert(0, TOOLS)
    import tune_slab_kernels as tsk

    assert tsk.parse_variants("l0:16x32,l1:8x64,32x32") == [
        {"level0": {"block_centers": 16, "tile": 32}},
        {"level1": {"block_centers": 8, "tile": 64}},
        {"block_centers": 32, "tile": 32},
    ]


def test_tune_slab_kernels_rejects_malformed_variants():
    sys.path.insert(0, TOOLS)
    import pytest
    import tune_slab_kernels as tsk

    for bad in ("l2:16x32", "16y32", "16x", "x32", "0x32", "32x0",
                "l0:0x0"):
        with pytest.raises(ValueError, match="bad variant"):
            tsk.parse_variants(bad)
