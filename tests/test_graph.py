import numpy as np
import pytest

from pointgnn_tpu.core.points import Points
from pointgnn_tpu.graph import builder, pad, radius, voxel


def _cloud(rng, n=3000, extent=40.0):
    pts = rng.random_sample((n, 3)).astype(np.float32)
    pts[:, 0] = pts[:, 0] * extent - extent / 2
    pts[:, 1] = pts[:, 1] * 4.0 - 2.0
    pts[:, 2] = pts[:, 2] * extent
    return pts


# ---------------------------------------------------------------------------
# radius search parity vs sklearn ball-tree (the reference's backend)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("r", [0.5, 1.0, 4.0])
def test_radius_neighbors_matches_sklearn(rng, r):
    from sklearn.neighbors import NearestNeighbors

    pts = _cloud(rng, 2000)
    centers = pts[rng.choice(2000, 300, replace=False)]
    edges = radius.radius_neighbors(pts, centers, r)

    nbrs = NearestNeighbors(radius=r, algorithm="ball_tree").fit(pts)
    ref = nbrs.radius_neighbors(centers, return_distance=False)
    got = {(int(p), int(c)) for p, c in edges}
    want = {(int(p), int(c)) for c, ns in enumerate(ref) for p in ns}
    assert got == want


def test_radius_neighbors_grouped_by_center(rng):
    pts = _cloud(rng, 1000)
    centers = pts[:100]
    edges = radius.radius_neighbors(pts, centers, 2.0)
    assert (np.diff(edges[:, 1]) >= 0).all()


def test_radius_neighbor_cap(rng):
    pts = _cloud(rng, 2000, extent=5.0)  # dense -> many neighbors
    centers = pts[:50]
    g = np.random.default_rng(0)
    edges = radius.radius_neighbors(pts, centers, 2.0, num_neighbors=8, rng=g)
    counts = np.bincount(edges[:, 1], minlength=50)
    assert (counts <= 8).all()
    # uncapped has more
    full = radius.radius_neighbors(pts, centers, 2.0)
    assert len(full) > len(edges)
    # capped edges are a subset of the full set
    got = {(int(p), int(c)) for p, c in edges}
    want = {(int(p), int(c)) for p, c in full}
    assert got <= want


def test_radius_empty_inputs():
    assert radius.radius_neighbors(
        np.zeros((0, 3)), np.zeros((5, 3)), 1.0
    ).shape == (0, 2)
    assert radius.radius_neighbors(
        np.zeros((5, 3)), np.zeros((0, 3)), 1.0
    ).shape == (0, 2)


def test_center_outside_point_bbox(rng):
    pts = _cloud(rng, 500)
    centers = np.array([[1000.0, 1000.0, 1000.0]], np.float32)
    assert len(radius.radius_neighbors(pts, centers, 1.0)) == 0


# ---------------------------------------------------------------------------
# voxel downsampling
# ---------------------------------------------------------------------------

def test_voxel_average_matches_bruteforce(rng):
    pts = _cloud(rng, 500, extent=10.0)
    out = voxel.voxel_downsample_average(Points(pts, None), 1.0)
    # every output must be the mean of some voxel group: recompute keys
    mins = pts.min(0)
    keys = tuple(
        map(tuple, np.floor((pts - mins) / 1.0).astype(int))
    )
    groups = {}
    for p, k in zip(pts, keys):
        groups.setdefault(k, []).append(p)
    want = sorted(
        [np.mean(v, axis=0) for v in groups.values()], key=lambda a: tuple(a)
    )
    got = sorted([p for p in out.xyz], key=lambda a: tuple(a))
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-5)


def test_voxel_random_picks_one_per_voxel(rng):
    pts = _cloud(rng, 1000, extent=10.0)
    g = np.random.default_rng(0)
    sel = voxel.voxel_downsample_random_indices(pts, 1.0, g)
    assert len(np.unique(sel)) == len(sel)
    mins = pts.min(0)
    keys = np.floor((pts - mins) / 1.0).astype(int)
    scalar = keys[:, 0] * 10000 + keys[:, 1] * 100 + keys[:, 2]
    assert len(sel) == len(np.unique(scalar))
    # one selection per distinct voxel
    assert len(np.unique(scalar[sel])) == len(sel)


def test_voxel_empty_input():
    """0-point clouds flow through every downsampling variant (the
    reference would crash; our frustum crop can legitimately produce
    them on degenerate calibrations)."""
    empty = np.zeros((0, 3), np.float32)
    g = np.random.default_rng(0)
    assert voxel.voxel_downsample_random_indices(empty, 1.0, g).shape == (0,)
    out = voxel.voxel_downsample_average(
        Points(empty, np.zeros((0, 4), np.float32)), 1.0
    )
    assert out.xyz.shape == (0, 3) and out.attr.shape[0] == 0
    for fn in (
        voxel.multi_level_downsample_random,
        voxel.multi_level_downsample_select,
    ):
        vcl, kil = fn(empty, 0.8, [1.0, 1.0])
        assert [v.shape for v in vcl] == [(0, 3)] * 3
        assert all(k.shape == (0, 1) for k in kil)


def test_multi_level_same_scale_copies():
    pts = np.random.RandomState(0).rand(200, 3).astype(np.float32) * 10
    vcl, kil = voxel.multi_level_downsample_random(
        pts, 0.8, [1, 1], rng=np.random.default_rng(0)
    )
    assert len(vcl) == 3
    np.testing.assert_array_equal(vcl[1], vcl[2])
    np.testing.assert_array_equal(kil[1][:, 0], np.arange(len(vcl[1])))


def test_multi_level_select_snaps_to_existing_points(rng):
    pts = _cloud(rng, 500, extent=10.0)
    vcl, kil = voxel.multi_level_downsample_select(
        pts, 1.0, [1], rng=np.random.default_rng(0)
    )
    np.testing.assert_allclose(vcl[1], pts[kil[0][:, 0]])


# ---------------------------------------------------------------------------
# multi-level builder
# ---------------------------------------------------------------------------

def _car_level_configs():
    return [
        {
            "graph_gen_kwargs": {"num_neighbors": -1, "radius": 1.0},
            "graph_gen_method": "disjointed_rnn_local_graph_v3",
            "graph_level": 0,
            "graph_scale": 1,
        },
        {
            "graph_gen_kwargs": {"num_neighbors": 256, "radius": 4.0},
            "graph_gen_method": "disjointed_rnn_local_graph_v3",
            "graph_level": 1,
            "graph_scale": 1,
        },
    ]


def test_multi_level_graph_structure(rng):
    pts = _cloud(rng, 3000)
    vcl, kil, el = builder.gen_multi_level_local_graph_v3(
        pts, 0.8, _car_level_configs(), rng=np.random.default_rng(0)
    )
    assert len(vcl) == 3 and len(kil) == 2 and len(el) == 2
    # level-1 == level-2 vertices (same scale)
    np.testing.assert_array_equal(vcl[1], vcl[2])
    # edges reference valid ranges
    for li in range(2):
        e = el[li]
        assert e[:, 0].max() < len(vcl[li])
        assert e[:, 1].max() < len(vcl[li + 1])
    # every center has at least one neighbor (itself: distance 0)
    deg = np.bincount(el[0][:, 1], minlength=len(vcl[1]))
    assert (deg >= 1).all()


def test_registry_names():
    assert (
        builder.get_graph_generate_fn("multi_level_local_graph_v3")
        is builder.gen_multi_level_local_graph_v3
    )


# ---------------------------------------------------------------------------
# padding / batching
# ---------------------------------------------------------------------------

def _frame(rng, n=800, with_labels=True):
    pts = _cloud(rng, n)
    vcl, kil, el = builder.gen_multi_level_local_graph_v3(
        pts, 0.8, _car_level_configs(), rng=np.random.default_rng(1)
    )
    feats = rng.random_sample((n, 1)).astype(np.float32)
    k_last = len(vcl[-1])
    labels = None
    boxes = None
    valid = None
    if with_labels:
        labels = rng.randint(0, 4, (k_last, 1)).astype(np.int32)
        boxes = rng.random_sample((k_last, 1, 7)).astype(np.float32)
        valid = (labels[:, :, None] > 0).astype(np.float32)
    return pad.FrameData(feats, vcl, kil, el, labels, boxes, valid)


def _small_cap():
    return pad.GraphCapacity(vertices=(2048, 1024, 1024), edges=(16384, 32768))


def test_pad_frame_shapes(rng):
    f = _frame(rng)
    cap = _small_cap()
    g = pad.pad_frame(f, cap)
    assert g.features.shape == (2048, 1)
    assert g.vertex_xyz[0].shape == (2048, 3)
    assert g.vertex_xyz[1].shape == (1024, 3)
    assert g.edges_src[0].shape == (16384,)
    assert g.edges_dst[1].shape == (32768,)
    assert g.cls_labels.shape == (1024,)
    assert g.encoded_boxes.shape == (1024, 7)
    # masks count real entries
    assert int(g.vertex_mask[0].sum()) == 800
    assert int(g.vertex_mask[1].sum()) == len(f.vertex_coord_list[1])


def test_pad_sentinel_edges(rng):
    f = _frame(rng)
    cap = _small_cap()
    g = pad.pad_frame(f, cap)
    ne = len(f.edges_list[0])
    assert (g.edges_dst[0][ne:] == cap.vertices[1]).all()
    assert (g.edges_dst[0][:ne] < cap.vertices[1]).all()


def test_batch_union_offsets(rng):
    f1 = _frame(rng, n=500)
    f2 = _frame(rng, n=600)
    cap = _small_cap().scaled(2)  # room for the 2-frame union
    g = pad.batch_and_pad([f1, f2], cap)
    n1 = len(f1.vertex_coord_list[0])
    # frame-2 level-0 vertices sit right after frame-1's
    np.testing.assert_allclose(
        g.vertex_xyz[0][n1 : n1 + 600], f2.vertex_coord_list[0], rtol=1e-6
    )
    # frame-2 edges shifted by frame-1 counts
    k1 = len(f1.vertex_coord_list[1])
    e1 = len(f1.edges_list[0])
    np.testing.assert_array_equal(
        g.edges_dst[0][e1 : e1 + len(f2.edges_list[0])],
        f2.edges_list[0][:, 1] + k1,
    )


def test_balanced_truncation_keeps_per_center_coverage(rng):
    f = _frame(rng, n=1500)
    tiny = pad.GraphCapacity(vertices=(2048, 1024, 1024), edges=(512, 1024))
    g = pad.pad_frame(f, tiny)
    real = g.edges_dst[0][g.edges_dst[0] < 1024]
    n_centers_before = len(np.unique(f.edges_list[0][:, 1]))
    n_centers_after = len(np.unique(real))
    # balanced truncation must keep nearly all centers represented
    assert n_centers_after >= min(n_centers_before, 512 // 2)
    # and edges stay grouped (non-decreasing dst) for sorted segment ops
    assert (np.diff(real) >= 0).all()


def test_edge_overflow_warns(rng):
    """Edge truncation is lossy for models trained on uncapped
    neighborhoods (docs/PERF_NOTES.md: BEV AP 0.00 at the training
    bucket vs 100 at 4x) — it must be surfaced, like vertex overflow."""
    import warnings

    f = _frame(rng, n=1500)
    tiny = pad.GraphCapacity(vertices=(2048, 1024, 1024), edges=(512, 1024))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pad.pad_frame(f, tiny)
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, RuntimeWarning)]
    assert any("edge overflow" in m for m in msgs), msgs


def test_vertex_overflow_truncates_consistently(rng):
    f = _frame(rng, n=1500)
    tiny = pad.GraphCapacity(vertices=(512, 256, 256), edges=(4096, 8192))
    g = pad.pad_frame(f, tiny)
    real_e = g.edges_src[0][g.edges_dst[0] < 256]
    assert (real_e < 512).all()
    assert int(g.vertex_mask[0].sum()) == 512


def test_suggest_capacity():
    from pointgnn_tpu.graph import pad as pad_mod

    frames = []
    for n, k, e0, e1 in ((1000, 300, 2000, 9000), (1500, 400, 2500, 12000)):
        frames.append(
            pad_mod.FrameData(
                features=np.zeros((n, 1), np.float32),
                vertex_coord_list=[
                    np.zeros((n, 3)), np.zeros((k, 3)), np.zeros((k, 3))
                ],
                keypoint_indices_list=[
                    np.zeros((k, 1), np.int64), np.zeros((k, 1), np.int64)
                ],
                edges_list=[
                    np.zeros((e0, 2), np.int64), np.zeros((e1, 2), np.int64)
                ],
            )
        )
    cap = pad_mod.suggest_capacity(frames, headroom=1.25, multiple=1024)
    assert cap.vertices[0] >= 1500 * 1.25
    assert cap.vertices[0] % 1024 == 0
    assert cap.edges[1] >= 12000 * 1.25
    # the suggested capacity holds every sample frame without overflow
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        pad_mod.batch_and_pad([frames[1]], cap)


def test_grow_to_fit_no_growth_when_frames_fit():
    """Headroom is a growth TARGET, not part of the fit test: a frame
    using >80% of its bucket (but still fitting) must NOT report
    growth — growth means a recompile and an overflow warning in
    InferencePipeline/Evaluator."""
    from pointgnn_tpu.graph import pad as pad_mod

    def frame(n, k, e0, e1):
        return pad_mod.FrameData(
            features=np.zeros((n, 1), np.float32),
            vertex_coord_list=[
                np.zeros((n, 3)), np.zeros((k, 3)), np.zeros((k, 3))
            ],
            keypoint_indices_list=[
                np.zeros((k, 1), np.int64), np.zeros((k, 1), np.int64)
            ],
            edges_list=[
                np.zeros((e0, 2), np.int64), np.zeros((e1, 2), np.int64)
            ],
        )

    cap = pad_mod.GraphCapacity(
        vertices=(4096, 1024, 1024), edges=(262144, 8192)
    )
    # 250000 <= 262144: fits, even though 250000 * 1.25 > 262144
    same, grew = pad_mod.grow_to_fit(cap, [frame(4000, 1000, 250000, 8000)])
    assert not grew and same == cap
    # true overflow on one bucket grows THAT bucket (with headroom,
    # quantized) and leaves the others untouched
    grown, grew = pad_mod.grow_to_fit(cap, [frame(4000, 1000, 262145, 8000)])
    assert grew
    assert grown.edges[0] >= int(262145 * 1.25) // 4096 * 4096
    assert grown.edges[0] % 4096 == 0
    assert grown.vertices == cap.vertices and grown.edges[1] == cap.edges[1]
