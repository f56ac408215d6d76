"""KITTI reader: synthetic on-disk fixture, transform round-trips,
frustum crop, difficulty filter, and label assignment."""

import os

import numpy as np
import pytest

from pointgnn_tpu.core import boxes as box_ops
from pointgnn_tpu.data import labels as label_lib
from pointgnn_tpu.data.kitti import KittiDataset, parse_label_line

# Real KITTI frame-000000 calibration values (public dataset header).
CALIB_TEXT = """\
P0: 7.070493000000e+02 0.000000000000e+00 6.040814000000e+02 0.000000000000e+00 0.000000000000e+00 7.070493000000e+02 1.805066000000e+02 0.000000000000e+00 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 0.000000000000e+00
P1: 7.070493000000e+02 0.000000000000e+00 6.040814000000e+02 -3.797842000000e+02 0.000000000000e+00 7.070493000000e+02 1.805066000000e+02 0.000000000000e+00 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 0.000000000000e+00
P2: 7.070493000000e+02 0.000000000000e+00 6.040814000000e+02 4.575831000000e+01 0.000000000000e+00 7.070493000000e+02 1.805066000000e+02 -3.454157000000e-01 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 4.981016000000e-03
P3: 7.070493000000e+02 0.000000000000e+00 6.040814000000e+02 -3.341081000000e+02 0.000000000000e+00 7.070493000000e+02 1.805066000000e+02 2.330660000000e+00 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 3.201153000000e-03
R0_rect: 9.999128000000e-01 1.009263000000e-02 -8.511932000000e-03 -1.012729000000e-02 9.999406000000e-01 -4.037671000000e-03 8.470675000000e-03 4.123522000000e-03 9.999556000000e-01
Tr_velo_to_cam: 6.927964000000e-03 -9.999722000000e-01 -2.757829000000e-03 -2.457729000000e-02 -1.162982000000e-03 2.749836000000e-03 -9.999955000000e-01 -6.127237000000e-02 9.999753000000e-01 6.931141000000e-03 -1.143899000000e-03 -3.321029000000e-01
"""

LABEL_TEXT = """\
Car 0.00 0 1.85 387.63 150.00 423.81 203.12 1.67 1.87 3.69 -16.53 2.39 58.49 1.57
Car 0.30 2 -1.65 676.60 163.95 688.98 193.93 1.40 1.60 4.00 3.00 1.70 20.00 0.10
Pedestrian 0.80 3 -1.00 100.00 150.00 110.00 170.00 1.80 0.60 0.90 -8.00 1.80 30.00 0.00
DontCare -1 -1 -10 503.89 169.71 590.61 190.13 -1 -1 -1 -1000 -1000 -1000 -10
"""


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    for sub in ("image_2", "velodyne", "calib", "label_2"):
        os.makedirs(root / sub)
    rng = np.random.default_rng(0)
    # velodyne points: forward (x) in velo frame, many inside the frustum
    n = 4000
    pts = np.zeros((n, 4), dtype=np.float32)
    pts[:, 0] = rng.uniform(3, 70, n)       # forward
    pts[:, 1] = rng.uniform(-20, 20, n)      # left
    pts[:, 2] = rng.uniform(-1.8, 1.0, n)    # up
    pts[:, 3] = rng.uniform(0, 1, n)         # reflectance
    for frame in ("000000", "000001"):
        pts.tofile(root / "velodyne" / (frame + ".bin"))
        (root / "calib" / (frame + ".txt")).write_text(CALIB_TEXT)
        (root / "label_2" / (frame + ".txt")).write_text(LABEL_TEXT)
        # tiny but correctly-shaped image (height x width x 3)
        img = rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)
        try:
            import cv2

            cv2.imwrite(str(root / "image_2" / (frame + ".png")), img)
        except ImportError:
            from PIL import Image

            Image.fromarray(img).save(root / "image_2" / (frame + ".png"))
    (root / "split.txt").write_text("000000\n000001\n")
    return root


@pytest.fixture(scope="module")
def dataset(kitti_dir):
    return KittiDataset(
        str(kitti_dir / "image_2"),
        str(kitti_dir / "velodyne"),
        str(kitti_dir / "calib"),
        str(kitti_dir / "label_2"),
        index_filename=str(kitti_dir / "split.txt"),
        num_classes=4,
    )


def test_file_list_and_velo(dataset):
    assert dataset.num_files == 2
    pts = dataset.get_velo_points(0)
    assert pts.xyz.shape == (4000, 3)
    assert pts.attr.shape == (4000, 1)
    ranged = dataset.get_velo_points(
        0, xyz_range=((10, 20), (-5, 5), (-2, 2))
    )
    assert 0 < ranged.n < 4000
    assert (ranged.xyz[:, 0] > 10).all() and (ranged.xyz[:, 0] < 20).all()


def test_calib_chain(dataset):
    calib = dataset.get_calib(0)  # includes the internal sanity assert
    assert calib["velo_to_cam"].shape == (4, 4)
    # velo->cam->velo round trip
    xyz = np.array([[10.0, 1.0, -0.5], [30.0, -4.0, 0.2]])
    cam = dataset.velo_to_cam(xyz, calib)
    back = dataset.cam_to_velo(cam, calib)
    np.testing.assert_allclose(back, xyz, atol=1e-4)
    # velodyne x-forward maps to camera z-forward
    assert (cam[:, 2] > 9).all()


def test_frustum_and_rgb(dataset):
    pts = dataset.get_cam_points_in_image(0)
    assert 0 < pts.n < 4000
    calib = dataset.get_calib(0)
    img_pts = dataset.cam_points_to_image(pts, calib)
    assert (img_pts.xyz[:, 0] > 0).all() and (img_pts.xyz[:, 0] < 1242).all()
    rgb_pts = dataset.get_cam_points_in_image_with_rgb(0)
    assert rgb_pts.attr.shape[1] == 4  # reflectance + rgb
    assert rgb_pts.attr[:, 1:].min() >= 0 and rgb_pts.attr[:, 1:].max() <= 1


def test_label_parsing_and_difficulty(dataset, kitti_dir):
    labels = dataset.get_label(0)
    assert len(labels) == 4
    assert labels[0]["name"] == "Car"
    assert labels[0]["yaw"] == pytest.approx(1.57)
    # easy difficulty drops occluded/truncated/small boxes
    hard = KittiDataset(
        str(kitti_dir / "image_2"),
        str(kitti_dir / "velodyne"),
        str(kitti_dir / "calib"),
        str(kitti_dir / "label_2"),
        difficulty=0,
        num_classes=4,
    )
    easy_labels = hard.get_label(0)
    names = [l["name"] for l in easy_labels]
    assert names == ["Car"]  # only the unoccluded tall car survives


def test_label_assignment_car(dataset):
    labels = dataset.get_label(0)
    # points: inside car1 (vertical yaw=1.57), inside car2 (horizontal
    # yaw=0.1), inside pedestrian (-> DontCare in car mode), background
    xyz = np.array(
        [
            [-16.53, 1.5, 58.49],
            [3.00, 1.0, 20.00],
            [-8.00, 1.0, 30.00],
            [0.0, 0.0, 5.0],
        ]
    )
    cls, boxes, valid, label_map = dataset.assign_classaware_car_label_to_points(
        labels, xyz, (1.0, 1.0, 1.0)
    )
    assert cls[:, 0].tolist() == [2, 1, 3, 0]  # vertical car, horiz car, DC, bg
    assert valid[:, 0, 0].tolist() == [1.0, 1.0, 0.0, 0.0]
    # stored yaw is folded into [-pi/4, 3pi/4)
    assert abs(boxes[0, 0, 6] - 1.57) < 1e-6
    assert boxes[1, 0, 6] == pytest.approx(0.1)


def test_label_assignment_all_variants():
    labels = [
        {
            "name": name,
            "x3d": 10.0 * (i + 1),
            "y3d": 1.0,
            "z3d": 20.0,
            "length": 4.0,
            "height": 1.6,
            "width": 1.8,
            "yaw": 0.0,
        }
        for i, name in enumerate(["Car", "Pedestrian", "Cyclist"])
    ]
    inside = np.array([[10.0, 0.5, 20.0], [20.0, 0.5, 20.0], [30.0, 0.5, 20.0]])
    cls8, _, _, _ = label_lib.assign_classaware_label_to_points(
        labels, inside, (1.0, 1.0, 1.0)
    )
    assert cls8[:, 0].tolist() == [1, 3, 5]
    cls6, _, valid6, _ = label_lib.assign_classaware_ped_and_cyc_label_to_points(
        labels, inside, (1.0, 1.0, 1.0)
    )
    assert cls6[:, 0].tolist() == [5, 1, 3]  # car -> DontCare id in ped_cyc mode
    assert valid6[:, 0, 0].tolist() == [0.0, 1.0, 1.0]


def test_statistics(dataset):
    stats = dataset.get_statistics()
    assert "Car" in stats
    assert stats["Car"]["length"] > 0


RAW_VELO_CALIB = """\
calib_time: 15-Mar-2012 11:37:16
R: 7.533745e-03 -9.999714e-01 -6.166020e-04 1.480249e-02 7.280733e-04 -9.998902e-01 9.998621e-01 7.523790e-03 1.480755e-02
T: -4.069766e-03 -7.631618e-02 -2.717806e-01
delta_f: 0.000000e+00 0.000000e+00
delta_c: 0.000000e+00 0.000000e+00
"""


def _raw_cam_calib():
    lines = ["calib_time: 09-Jan-2012 13:57:47", "corner_dist: 9.950000e-02"]
    for i in range(4):
        lines += [
            "S_0%d: 1.392000e+03 5.120000e+02" % i,
            "K_0%d: 9.842439e+02 0.000000e+00 6.900000e+02 0.000000e+00 "
            "9.808141e+02 2.331966e+02 0.000000e+00 0.000000e+00 1.000000e+00"
            % i,
            "D_0%d: -3.728755e-01 2.037299e-01 2.219027e-03 1.383707e-03 "
            "-7.233722e-02" % i,
            "R_0%d: 1.000000e+00 0.000000e+00 0.000000e+00 0.000000e+00 "
            "1.000000e+00 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00"
            % i,
            "T_0%d: 0.000000e+00 0.000000e+00 0.000000e+00" % i,
            "S_rect_0%d: 1.242000e+03 3.750000e+02" % i,
            "R_rect_0%d: 1.000000e+00 0.000000e+00 0.000000e+00 0.000000e+00 "
            "1.000000e+00 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00"
            % i,
            "P_rect_0%d: 7.215377e+02 0.000000e+00 6.095593e+02 "
            "%.6e 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 "
            "0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00"
            % (i, -339.5 * i),
        ]
    return "\n".join(lines) + "\n"


def test_raw_calib(tmp_path):
    velo_path = tmp_path / "calib_velo_to_cam.txt"
    cam_path = tmp_path / "calib_cam_to_cam.txt"
    velo_path.write_text(RAW_VELO_CALIB)
    cam_path.write_text(_raw_cam_calib())
    calib = KittiDataset.get_raw_calib(str(velo_path), str(cam_path))
    assert calib["velo_to_cam"].shape == (4, 4)
    assert calib["velo_to_image"].shape == (3, 4)
    # velodyne forward (x) should land in front of the camera (z > 0)
    xyz1 = np.array([10.0, 0.0, 0.0, 1.0])
    cam = calib["velo_to_cam"] @ xyz1
    assert cam[2] > 9.0
