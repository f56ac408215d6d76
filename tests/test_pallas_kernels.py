"""Pallas fused edge kernel vs numpy reference (interpret mode on CPU)."""

import numpy as np
import pytest

from pointgnn_tpu.nn.pallas_kernels import fused_edge_max


def test_fused_edge_max_parity():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    K, S, H = 64, 16, 300
    A = rng.normal(size=(K, H)).astype(np.float32)
    B = rng.normal(size=(K, H)).astype(np.float32)
    edges = rng.integers(0, K, (K, S)).astype(np.int32)
    valid = (rng.uniform(size=(K, S)) > 0.3).astype(np.float32)
    w1 = rng.normal(size=(H, H)).astype(np.float32) * 0.05
    b1 = rng.normal(size=(H,)).astype(np.float32) * 0.1

    h = np.maximum(A[edges] - B[:, None, :], 0.0)
    h = np.maximum(h @ w1 + b1, 0.0)
    h = np.where(valid[:, :, None] > 0, h, -1e30)
    agg = h.max(axis=1)
    expected = np.where(agg > -1e29, agg, 0.0)

    out = fused_edge_max(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(edges),
        jnp.asarray(valid), (jnp.asarray(w1), jnp.asarray(b1)),
        block_centers=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5, atol=2e-5)


def test_fused_edge_max_all_invalid_center():
    import jax.numpy as jnp

    K, S, H = 16, 8, 300
    A = np.ones((K, H), np.float32)
    B = np.zeros((K, H), np.float32)
    edges = np.zeros((K, S), np.int32)
    valid = np.ones((K, S), np.float32)
    valid[3] = 0.0  # center 3 has no real edges
    out = fused_edge_max(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(edges),
        jnp.asarray(valid), (), block_centers=8, interpret=True,
    )
    out = np.asarray(out)
    assert (out[3] == 0.0).all()
    assert (out[0] == 1.0).all()


def test_edge_tail_max_parity():
    import jax.numpy as jnp

    from pointgnn_tpu.nn.pallas_kernels import edge_tail_max

    rng = np.random.default_rng(1)
    K, S, H = 64, 16, 300
    A = rng.normal(size=(K, H)).astype(np.float32)
    B = rng.normal(size=(K, H)).astype(np.float32)
    edges = rng.integers(0, K, (K, S)).astype(np.int32)
    valid = (rng.uniform(size=(K, S)) > 0.3).astype(np.float32)
    w1 = rng.normal(size=(H, H)).astype(np.float32) * 0.05
    b1 = rng.normal(size=(H,)).astype(np.float32) * 0.1

    h = np.maximum(A[edges] - B[:, None, :], 0.0)
    h = np.maximum(h @ w1 + b1, 0.0)
    h = np.where(valid[:, :, None] > 0, h, -1e30)
    agg = h.max(axis=1)
    expected = np.where(agg > -1e29, agg, 0.0)

    gathered = jnp.asarray(A)[jnp.asarray(edges).reshape(-1)]
    out = edge_tail_max(
        gathered, jnp.asarray(B), jnp.asarray(valid),
        (jnp.asarray(w1), jnp.asarray(b1)),
        block_centers=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5, atol=2e-5)


def test_gnn_layer_pallas_tail_matches_segment_path():
    """GraphNetAutoCenter with pallas_tail=True must match the default
    chunked-segment path on a src-sentinel blocked graph."""
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.nn.layers import GraphNetAutoCenter

    rng = np.random.default_rng(2)
    N, S, C = 32, 8, 64
    feats = rng.normal(size=(N, C)).astype(np.float32)
    xyz = rng.normal(size=(N, 3)).astype(np.float32)
    # blocked src-sentinel layout: dst of slot (c, s) is center c
    src = rng.integers(0, N, (N, S)).astype(np.int32)
    src[rng.uniform(size=(N, S)) < 0.3] = N  # sentinel slots
    src[5, :] = N  # one center with no edges at all
    dst = np.repeat(np.arange(N, dtype=np.int32), S)
    mask = np.ones((N,), np.float32)

    layer = GraphNetAutoCenter("max")
    kw = dict(
        edge_MLP_depth_list=[C, C],
        update_MLP_depth_list=[C, C],
        auto_offset=True,
        auto_offset_MLP_depth_list=[32, 3],
        edge_MLP_normalization_type="NONE",
        update_MLP_normalization_type="NONE",
        auto_offset_MLP_normalization_type="NONE",
    )
    params = layer.init(jax.random.PRNGKey(0), C, **kw)
    run_kw = dict(
        edge_MLP_depth_list=[C, C],
        edge_MLP_normalization_type="NONE",
        edge_MLP_activation_type="ReLU",
        update_MLP_depth_list=[C, C],
        update_MLP_normalization_type="NONE",
        update_MLP_activation_type="ReLU",
        auto_offset=True,
        auto_offset_MLP_depth_list=[32, 3],
        auto_offset_MLP_normalization_type="NONE",
        auto_offset_MLP_feature_activation_type="ReLU",
        edge_sentinel="src",
    )
    ref = layer.apply(
        params, jnp.asarray(feats), jnp.asarray(xyz),
        jnp.asarray(src.reshape(-1)), jnp.asarray(dst),
        vertex_mask=jnp.asarray(mask), pallas_tail=False, **run_kw,
    )
    out = layer.apply(
        params, jnp.asarray(feats), jnp.asarray(xyz),
        jnp.asarray(src.reshape(-1)), jnp.asarray(dst),
        vertex_mask=jnp.asarray(mask), pallas_tail=True, **run_kw,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_psp_layer_pallas_tail_matches_segment_path():
    """PointSetPooling with pallas_tail=True must match the default
    path on a src-sentinel blocked graph (fold + fused tail)."""
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.nn.layers import PointSetPooling

    rng = np.random.default_rng(3)
    P, K, S, C = 128, 32, 8, 1
    feats = rng.normal(size=(P, C)).astype(np.float32)
    p_xyz = rng.normal(size=(P, 3)).astype(np.float32)
    c_xyz = p_xyz[:K].copy()
    src = rng.integers(0, P, (K, S)).astype(np.int32)
    src[rng.uniform(size=(K, S)) < 0.3] = P
    src[2, :] = P  # center with no points
    dst = np.repeat(np.arange(K, dtype=np.int32), S)
    mask = np.ones((K,), np.float32)

    layer = PointSetPooling("max")
    kw = dict(
        point_MLP_depth_list=[16, 32, 48],
        output_MLP_depth_list=[48, 48],
        point_MLP_normalization_type="NONE",
        output_MLP_normalization_type="NONE",
    )
    params = layer.init(jax.random.PRNGKey(1), C, **kw)
    run_kw = dict(
        point_MLP_depth_list=[16, 32, 48],
        point_MLP_normalization_type="NONE",
        point_MLP_activation_type="ReLU",
        output_MLP_depth_list=[48, 48],
        output_MLP_normalization_type="NONE",
        output_MLP_activation_type="ReLU",
        edge_sentinel="src",
    )
    args = (
        jnp.asarray(feats), jnp.asarray(p_xyz), jnp.asarray(c_xyz),
        jnp.asarray(src.reshape(-1)), jnp.asarray(dst),
    )
    ref = layer.apply(
        params, *args, center_mask=jnp.asarray(mask),
        pallas_tail=False, **run_kw,
    )
    out = layer.apply(
        params, *args, center_mask=jnp.asarray(mask),
        pallas_tail=True, **run_kw,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_slab_edge_max_brute_force_parity():
    """slab_edge_max (fused radius search + edge MLP + max) vs a numpy
    brute force over the exact uncapped radius graph."""
    import jax.numpy as jnp
    import ml_dtypes

    from pointgnn_tpu.nn.pallas_kernels import slab_edge_max

    rng = np.random.default_rng(0)
    K, H, g, r = 256, 64, 8, 2.0
    tile, bk = 32, 16
    xyz = np.stack(
        [rng.uniform(0, 14, K), rng.uniform(-1, 1, K),
         rng.uniform(0, 14, K)], 1
    ).astype(np.float32)
    valid = np.ones(K, bool)
    valid[240:] = False
    cx = np.clip((xyz[:, 0] // r).astype(int), 0, g - 1)
    cz = np.clip((xyz[:, 2] // r).astype(int), 0, g - 1)
    cell = np.where(valid, cx * g + cz, g * g)
    order = np.argsort(cell, kind="stable")
    xyz, cell, valid = xyz[order], cell[order], valid[order]
    offsets = np.searchsorted(cell, np.arange(g * g + 1)).astype(np.int32)
    A = rng.normal(size=(K, H)).astype(np.float32)
    B = rng.normal(size=(K, H)).astype(np.float32)
    w1 = (rng.normal(size=(H, H)) * 0.1).astype(np.float32)
    b1 = (rng.normal(size=(H,)) * 0.1).astype(np.float32)
    src4 = np.concatenate([xyz, np.zeros((K, 1), np.float32)], 1)
    src4[~valid] = 1e6
    ctr4 = np.concatenate([xyz, np.zeros((K, 1), np.float32)], 1)
    ctr4[~valid] = -1e6
    out = np.asarray(slab_edge_max(
        jnp.asarray(A), jnp.asarray(src4), jnp.asarray(B),
        jnp.asarray(ctr4), jnp.asarray(offsets),
        jnp.asarray(cell.astype(np.int32)),
        (jnp.asarray(w1), jnp.asarray(b1)),
        grid_g=g, radius=r, block_centers=bk, tile=tile, interpret=True,
    ))

    def bf16(x):
        return x.astype(ml_dtypes.bfloat16).astype(np.float32)

    ref = np.zeros((K, H), np.float32)
    for c in range(K):
        if not valid[c]:
            continue
        d2 = ((xyz - xyz[c]) ** 2).sum(1)
        nb = np.where(valid & (d2 <= r * r))[0]
        if len(nb) == 0:
            continue
        hcd = np.maximum(bf16(A[nb]) - bf16(B[c]), 0)
        h2 = np.maximum(bf16(hcd) @ bf16(w1) + b1, 0)
        ref[c] = h2.max(0)
    assert (out[~valid] == 0).all()
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


def test_slab_pipeline_matches_edge_pipeline():
    """On-device pipeline in slab mode vs edge-list mode: identical
    detections when the edge caps cover every true neighbor."""
    import os

    import jax

    if jax.default_backend() not in ("cpu",):
        import pytest

        pytest.skip("CPU-only comparison (interpret mode)")

    from pointgnn_tpu import configs
    from pointgnn_tpu.core.points import Points
    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.infer import InferencePipeline
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    cfg = configs.model_config("Car", T=2)
    spec = db.spec_from_config(
        cfg, num_points=4096, num_keypoints=1024,
        per_center_caps=(16, 256), cell_caps=(32, 128),
    )
    pts, _ = synthetic_lidar_frame(seed=0)
    pts = Points(xyz=pts.xyz[:3000], attr=pts.attr[:3000])
    pipe_edges = InferencePipeline(
        cfg, on_device_graph=True, device_spec=spec,
        use_box_score=False, pallas_tail=False, slab=False, seed=3,
    )
    pipe_slab = InferencePipeline(
        cfg, on_device_graph=True, device_spec=spec,
        use_box_score=False, pallas_tail=False, slab=True, seed=3,
    )
    c1, b1, s1, _ = pipe_edges.run_frame(pts)
    c2, b2, s2, _ = pipe_slab.run_frame(pts)
    assert len(c1) == len(c2)
    np.testing.assert_allclose(np.sort(s1), np.sort(s2), atol=1e-6)
    np.testing.assert_allclose(
        np.sort(b1, axis=0), np.sort(b2, axis=0), atol=1e-5
    )
