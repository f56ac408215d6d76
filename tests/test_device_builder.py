"""On-device graph builder: voxel select + radius edges vs brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointgnn_tpu import configs
from pointgnn_tpu.graph import device_builder as db


def _cloud(n=800, seed=0):
    rng = np.random.default_rng(seed)
    xyz = np.column_stack(
        [
            rng.uniform(-20, 20, n),
            rng.uniform(-2, 2, n),
            rng.uniform(0, 40, n),
        ]
    ).astype(np.float32)
    return xyz


def test_voxel_select_one_per_voxel():
    xyz = _cloud()
    mask = np.ones(len(xyz), bool)
    mask[700:] = False
    idx, kp_mask = jax.jit(
        lambda x, m: db.voxel_select(x, m, 0.8, 1024)
    )(xyz, mask)
    idx, kp_mask = np.asarray(idx), np.asarray(kp_mask)
    sel = idx[kp_mask]
    # representatives are valid points
    assert (sel < 700).all()
    # exactly one representative per occupied voxel (same quantization)
    origin = xyz[:700].min(axis=0)
    cells = np.floor((xyz[sel] - origin) / 0.8).astype(int)
    cell_ids = set(map(tuple, cells))
    assert len(cell_ids) == len(sel)
    all_cells = np.floor((xyz[:700] - origin) / 0.8).astype(int)
    assert len(set(map(tuple, all_cells))) == len(sel)


def test_voxel_select_randomized():
    """With a PRNG key, voxel_select jitters the grid origin and picks
    a random representative per voxel (the reference's train-time
    add_rnd3d + random-point-per-voxel, graph_gen.py:20-26,134-150):
    the selection stays valid, is deterministic per key, and varies
    across keys."""
    xyz = _cloud()
    mask = np.ones(len(xyz), bool)
    mask[700:] = False
    # coarse voxels so most voxels hold several points and the random
    # representative choice matters
    fn = jax.jit(
        lambda x, m, k: db.voxel_select(x, m, 4.0, 1024, key=k)
    )
    sels = []
    for s in range(4):
        idx, kp_mask = fn(xyz, mask, jax.random.PRNGKey(s))
        idx, kp_mask = np.asarray(idx), np.asarray(kp_mask)
        sel = np.sort(idx[kp_mask])
        # representatives are valid (unmasked) points, no duplicates
        assert (sel < 700).all()
        assert len(np.unique(sel)) == len(sel)
        # one representative per voxel: far fewer keypoints than points
        assert 10 < len(sel) < 700
        sels.append(set(sel.tolist()))
    # same key -> identical selection
    idx2, kp_mask2 = fn(xyz, mask, jax.random.PRNGKey(0))
    assert set(np.asarray(idx2)[np.asarray(kp_mask2)].tolist()) == sels[0]
    # different keys -> different selections
    assert sels[0] != sels[1] != sels[2]


def test_build_padded_graph_rnd_key_varies():
    """rnd_key threads through build_padded_graph and changes the
    keypoint set; key=None matches the deterministic path."""
    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=1024, num_keypoints=256, runtime=False,
        cell_caps=(16, 32), per_center_caps=(8, 16),
    )
    xyz = _cloud(1024, seed=3)
    feats = np.ones((1024, 1), np.float32)
    mask = np.ones(1024, bool)
    build = jax.jit(
        lambda x, f, m, k: db.build_padded_graph(x, f, m, spec, rnd_key=k)
    )
    g1 = build(xyz, feats, mask, jax.random.PRNGKey(1))
    g2 = build(xyz, feats, mask, jax.random.PRNGKey(2))
    det = jax.jit(
        lambda x, f, m: db.build_padded_graph(x, f, m, spec)
    )(xyz, feats, mask)
    assert not np.allclose(
        np.asarray(g1.vertex_xyz[1]), np.asarray(g2.vertex_xyz[1])
    )
    det2 = jax.jit(
        lambda x, f, m: db.build_padded_graph(x, f, m, spec)
    )(xyz, feats, mask)
    np.testing.assert_array_equal(
        np.asarray(det.vertex_xyz[1]), np.asarray(det2.vertex_xyz[1])
    )


def test_radius_edges_match_bruteforce():
    xyz = _cloud(600, seed=1)
    src_mask = np.ones(600, bool)
    src_mask[550:] = False
    ctr = xyz[:100] + 0.05
    ctr_mask = np.ones(100, bool)
    ctr_mask[90:] = False
    level = db.LevelSpec(radius=2.0, cell_cap=64, per_center_cap=128)
    e_src, e_dst = jax.jit(
        lambda a, b, c, d: db.radius_edges(a, b, c, d, level)
    )(xyz, src_mask, ctr, ctr_mask)
    e_src, e_dst = np.asarray(e_src), np.asarray(e_dst)
    # src-sentinel layout: dst always the owning center, invalid slots
    # carry src == num_sources
    real = e_src < 600
    d = np.linalg.norm(xyz[e_src[real]] - ctr[e_dst[real]], axis=1)
    assert (d <= 2.0 + 1e-5).all()
    assert (e_src[real] < 550).all()
    assert (e_dst[real] < 90).all()
    # against brute force: all neighbors found (caps are generous here)
    for c in range(90):
        bf = np.flatnonzero(
            (np.linalg.norm(xyz[:550] - ctr[c], axis=1) <= 2.0)
        )
        got = np.sort(e_src[real][e_dst[real] == c])
        np.testing.assert_array_equal(got, np.sort(bf))
    # edges are grouped by center (dst non-decreasing over real slots
    # within each center block by construction)
    assert (np.diff(e_dst[real]) >= 0).all()


def test_radius_edges_cap():
    xyz = np.zeros((64, 3), np.float32)  # all at origin
    mask = np.ones(64, bool)
    ctr = np.zeros((4, 3), np.float32)
    ctr_mask = np.ones(4, bool)
    level = db.LevelSpec(radius=1.0, cell_cap=64, per_center_cap=16)
    e_src, e_dst = db.radius_edges(xyz, mask, ctr, ctr_mask, level)
    e_src, e_dst = np.asarray(e_src), np.asarray(e_dst)
    for c in range(4):
        assert ((e_dst == c) & (e_src < 64)).sum() == 16  # capped


def test_build_padded_graph_runs_model():
    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=2048, num_keypoints=1024,
        cell_caps=(16, 64), per_center_caps=(16, 64),
    )
    xyz = _cloud(1500, seed=2)
    attr = np.random.default_rng(0).uniform(0, 1, (1500, 1)).astype(np.float32)
    p_xyz, p_attr, p_mask = db.pad_points(xyz, attr, spec.num_points)

    from pointgnn_tpu.model.pointgnn import PointGNN

    model = PointGNN(
        num_classes=4, box_encoding_len=7,
        layer_configs=cfg["model_kwargs"]["layer_configs"], mode="test",
        edge_sentinel="src",
    )
    params = model.init(jax.random.PRNGKey(0), input_dim=1)

    @jax.jit
    def fwd(params, xyz, attr, mask):
        graph = db.build_padded_graph(xyz, attr, mask, spec)
        logits, boxes = model.apply(params, graph)
        return logits, boxes, graph

    logits, boxes, graph = fwd(params, p_xyz, p_attr, p_mask)
    assert logits.shape == (1024, 4)
    assert np.isfinite(np.asarray(logits)).all()
    # keypoint level is populated
    assert np.asarray(graph.vertex_mask[1]).sum() > 100
    # level-1 has self-edges (center within its own radius)
    e1_src = np.asarray(graph.edges_src[1])
    assert (e1_src < 1024).sum() > 0


def test_device_vs_host_builder_equivalent_geometry():
    """The device path must find the same neighbor sets as the host
    path for matching voxelization (deterministic comparison on the
    level-1 graph whose vertex set we fix)."""
    from pointgnn_tpu.graph import radius as host_radius

    xyz = _cloud(400, seed=3)
    mask = np.ones(400, bool)
    level = db.LevelSpec(radius=4.0, cell_cap=256, per_center_cap=256)
    e_src, e_dst = db.radius_edges(xyz, mask, xyz, mask, level)
    e_src, e_dst = np.asarray(e_src), np.asarray(e_dst)
    real = e_src < 400
    host_edges = host_radius.radius_neighbors(
        xyz, xyz, 4.0, num_neighbors=-1
    )
    device_set = set(zip(e_src[real].tolist(), e_dst[real].tolist()))
    host_set = set(map(tuple, host_edges.tolist()))
    assert device_set == host_set


def test_radius_edges_approx_topk_cpu_fallback_parity():
    """approx_topk=True must produce the same edge sets on the CPU
    fallback (exact there); on TPU it trades ~(1-recall) of neighbors
    for a much cheaper compaction (docs/PERF_NOTES.md)."""
    import jax.numpy as jnp

    from pointgnn_tpu.graph.device_builder import LevelSpec, radius_edges

    rng = np.random.default_rng(7)
    xyz = rng.uniform(0, 20, (512, 3)).astype(np.float32)
    mask = np.ones(512, bool)
    mask[500:] = False
    exact = LevelSpec(2.0, 32, 24, grid_xz=16)
    approx = exact._replace(approx_topk=True)
    se, _ = radius_edges(
        jnp.asarray(xyz), jnp.asarray(mask),
        jnp.asarray(xyz), jnp.asarray(mask), exact,
    )
    sa, _ = radius_edges(
        jnp.asarray(xyz), jnp.asarray(mask),
        jnp.asarray(xyz), jnp.asarray(mask), approx,
    )
    se = np.asarray(se).reshape(512, -1)
    sa = np.asarray(sa).reshape(512, -1)
    for r1, r2 in zip(se, sa):
        assert set(r1[r1 < 512]) == set(r2[r2 < 512])


def test_overflow_counters_and_warnings():
    """Over-capacity frames must not truncate silently (pad.py warns on
    the host path; the device path surfaces drops via pack_points /
    host_overflow_stats / build_padded_graph counters)."""
    import warnings

    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=256, num_keypoints=64,
        cell_caps=(8, 8), per_center_caps=(4, 4),
    )
    xyz = _cloud(500, seed=3)  # 500 points > 256 capacity
    attr = np.ones((500, 1), np.float32)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        db.pack_points(xyz, attr, spec.num_points)
        assert any("point overflow" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        db.pad_points(xyz, attr, spec.num_points)
        assert any("point overflow" in str(x.message) for x in w)

    stats = db.host_overflow_stats(xyz, spec)
    assert stats["points_dropped"] == 500 - 256
    assert stats["voxels_occupied"] > 64
    assert stats["keypoints_dropped"] == stats["voxels_occupied"] - 64

    # dense cluster: 256 points inside a 3m cube saturates the tiny
    # per-center caps (4 neighbors) and cell caps (8 slots)
    dense = (
        np.random.default_rng(7).uniform(0, 3, (256, 3)).astype(np.float32)
    )
    p_xyz, p_attr, p_mask = db.pad_points(dense, attr[:256], 256)
    graph, counters = jax.jit(
        lambda x, a, m: db.build_padded_graph(
            x, a, m, spec, return_counters=True
        )
    )(p_xyz, p_attr, p_mask)
    counters = {k: int(v) for k, v in counters.items()}
    # device-side voxel accounting agrees with the host estimate on the
    # kept points
    kept_stats = db.host_overflow_stats(dense, spec)
    assert counters["voxels_occupied"] == kept_stats["voxels_occupied"]
    assert counters["keypoints_dropped"] == kept_stats["keypoints_dropped"]
    # tiny caps on a dense cloud must show saturation somewhere
    assert (
        counters["l0_saturated_centers"] > 0
        or counters["l0_cell_overflow_sources"] > 0
    )
    for key in (
        "l1_saturated_centers", "l1_cell_overflow_sources",
    ):
        assert counters[key] >= 0


def test_pipeline_accumulates_overflow_counters():
    from pointgnn_tpu.infer import InferencePipeline
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=512, num_keypoints=128,
        cell_caps=(8, 16), per_center_caps=(8, 16),
    )
    pipe = InferencePipeline(
        cfg, on_device_graph=True, device_spec=spec,
        use_box_merge=False, use_box_score=False,
    )
    points, _ = synthetic_lidar_frame(seed=0)
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pipe.run_frame(points)
        assert any("overflow" in str(x.message) for x in w)
    assert pipe.overflow_counters["points_dropped"] > 0


def test_rnd_counters_match_shifted_grid():
    """With rnd_key the voxel grid origin is randomly shifted; the
    overflow counters must recount on the SAME shifted grid, so when
    nothing overflows, voxels_occupied == the number of keypoints the
    selection actually produced (for several draws)."""
    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=256, num_keypoints=256,  # generous: no overflow
        cell_caps=(8, 8), per_center_caps=(4, 4),
    )
    xyz = _cloud(200, seed=11)
    attr = np.ones((200, 1), np.float32)
    p_xyz, p_attr, p_mask = db.pad_points(xyz, attr, spec.num_points)
    build = jax.jit(
        lambda x, a, m, k: db.build_padded_graph(
            x, a, m, spec, return_counters=True, rnd_key=k
        )
    )
    for seed in range(4):
        graph, counters = build(
            p_xyz, p_attr, p_mask, jax.random.PRNGKey(seed)
        )
        kp = int(np.asarray(graph.vertex_mask[1]).sum())
        occ = int(counters["voxels_occupied"])
        assert occ == kp, (seed, occ, kp)
        assert int(counters["keypoints_dropped"]) == 0
