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


def test_slab_edge_max_pooling_brute_force_parity():
    """slab_edge_max with DIFFERENT candidate and center sets (the
    set-pooling configuration: raw points -> keypoints) vs numpy brute
    force."""
    import jax.numpy as jnp
    import ml_dtypes

    from pointgnn_tpu.nn.pallas_kernels import slab_edge_max

    rng = np.random.default_rng(1)
    P, K, H, g, r = 512, 128, 32, 8, 1.5
    tile, bk = 32, 16
    pxyz = np.stack(
        [rng.uniform(0, 11, P), rng.uniform(-1, 1, P),
         rng.uniform(0, 11, P)], 1
    ).astype(np.float32)
    pvalid = np.ones(P, bool)
    pvalid[490:] = False
    pcx = np.clip((pxyz[:, 0] // r).astype(int), 0, g - 1)
    pcz = np.clip((pxyz[:, 2] // r).astype(int), 0, g - 1)
    pcell = np.where(pvalid, pcx * g + pcz, g * g)
    porder = np.argsort(pcell, kind="stable")
    pxyz, pcell, pvalid = pxyz[porder], pcell[porder], pvalid[porder]
    offsets = np.searchsorted(pcell, np.arange(g * g + 1)).astype(np.int32)
    # centers: a subset of the points, NOT cell-sorted (the kernel only
    # needs spatial locality per block, which a subset of sorted points
    # inherits)
    kidx = np.sort(rng.choice(490, K, replace=False))
    kxyz = pxyz[kidx]
    kvalid = np.ones(K, bool)
    kvalid[120:] = False
    kcell = np.where(kvalid, pcell[kidx], g * g).astype(np.int32)
    A = rng.normal(size=(P, H)).astype(np.float32)
    B = rng.normal(size=(K, H)).astype(np.float32)
    w1 = (rng.normal(size=(H, 2 * H)) * 0.2).astype(np.float32)
    b1 = (rng.normal(size=(2 * H,)) * 0.2).astype(np.float32)
    src4 = np.concatenate([pxyz, np.zeros((P, 1), np.float32)], 1)
    src4[~pvalid] = 1e6
    ctr4 = np.concatenate([kxyz, np.zeros((K, 1), np.float32)], 1)
    ctr4[~kvalid] = -1e6
    out = np.asarray(slab_edge_max(
        jnp.asarray(A), jnp.asarray(src4), jnp.asarray(B),
        jnp.asarray(ctr4), jnp.asarray(offsets), jnp.asarray(kcell),
        (jnp.asarray(w1), jnp.asarray(b1)),
        grid_g=g, radius=r, block_centers=bk, tile=tile, interpret=True,
    ))

    def bf16(x):
        return x.astype(ml_dtypes.bfloat16).astype(np.float32)

    ref = np.zeros((K, 2 * H), np.float32)
    for c in range(K):
        if not kvalid[c]:
            continue
        d2 = ((pxyz - kxyz[c]) ** 2).sum(1)
        nb = np.where(pvalid & (d2 <= r * r))[0]
        if len(nb) == 0:
            continue
        hcd = np.maximum(bf16(A[nb]) - bf16(B[c]), 0)
        h2 = np.maximum(bf16(hcd) @ bf16(w1) + b1, 0)
        ref[c] = h2.max(0)
    assert (out[~kvalid] == 0).all()
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
    # The slab kernels compute the EXACT uncapped radius graph (the
    # reference semantics — num_neighbors=-1 at level 0 everywhere and
    # at level 1 at runtime); the edge path truncates at its caps.  The
    # paths only agree when the caps cover every true neighbor, so use
    # a far-field (sparse) slice of the frame and assert the premise.
    spec = db.spec_from_config(
        cfg, num_points=6144, num_keypoints=3072,
        per_center_caps=(64, 256), cell_caps=(96, 256),
    )
    pts, _ = synthetic_lidar_frame(seed=0)
    far = pts.xyz[:, 2] > 35.0
    xyz = pts.xyz[far][::2][:6000]
    attr = pts.attr[far][::2][:6000]
    pts = Points(xyz=xyz, attr=attr)
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    l0 = cfg["graph_gen_kwargs"]["level_configs"][0]["graph_gen_kwargs"]
    nb0 = (d2 <= l0["radius"] ** 2).sum(1)
    assert nb0.max() < 64, "test premise broken: L0 caps too small"
    # pallas_tail=True on the edge pipe so BOTH paths run the folded
    # first layer + bf16 kernel arithmetic (the plain edge path's
    # unfolded concat formulation rounds differently in bf16).  Compare
    # per-keypoint MODEL outputs, aligned across the two keypoint
    # orders, rather than final detections: with untrained weights the
    # scores cluster at the hypothesis threshold, so sub-percent dtype
    # differences (edge_tail rounds its last layer to bf16, the slab
    # kernel accumulates it in f32) flip borderline hypotheses and make
    # detection counts flaky.  The kernels' exactness against brute
    # force is covered by the tests above.
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.infer import select_input_features

    probs, kxyz, kmask = {}, {}, {}
    for s in (False, True):
        pipe = InferencePipeline(
            cfg, on_device_graph=True, device_spec=spec,
            use_box_score=False, pallas_tail=True, slab=s, seed=3,
        )
        sp = pipe.device_spec
        packed = jnp.asarray(db.pack_points(
            pts.xyz, select_input_features(pts.attr, "i"), sp.num_points
        ))
        model = pipe.model

        @jax.jit
        def fwd(params, packed, sp=sp, model=model):
            pxyz, feats, mask = db.unpack_points(packed)
            graph = db.build_padded_graph(pxyz, feats, mask, sp)
            logits, _ = model.apply(params, graph)
            return (
                model.postprocess(logits),
                graph.vertex_xyz[1],
                graph.vertex_mask[1],
            )

        p, kx, km = jax.device_get(fwd(pipe.params, packed))
        probs[s], kxyz[s], kmask[s] = p, kx, km.astype(bool)

    def key(a):
        return tuple(np.round(a, 4))

    pos = {key(kxyz[False][i]): i for i in np.where(kmask[False])[0]}
    pairs = [
        (pos[key(kxyz[True][j])], j) for j in np.where(kmask[True])[0]
    ]
    assert len(pairs) == kmask[True].sum()  # same keypoint sets
    ie = np.array([p_[0] for p_ in pairs])
    js = np.array([p_[1] for p_ in pairs])
    d = np.abs(probs[False][ie] - probs[True][js])
    assert d.max() < 5e-2, d.max()
    assert d.mean() < 1e-3, d.mean()


def test_slab_edge_max_train_grad_parity():
    """Custom-VJP slab kernel vs a dense all-pairs JAX reference:
    forward AND gradients (d_table_a, d_table_b, d_weights) must match
    on the exact uncapped radius graph (interpret mode, f32 compute)."""
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.nn.pallas_kernels import NEG, slab_edge_max_train

    rng = np.random.default_rng(1)
    K, H, g, r = 128, 32, 8, 2.0
    tile, bk = 32, 8
    xyz = np.stack(
        [rng.uniform(0, 14, K), rng.uniform(-1, 1, K),
         rng.uniform(0, 14, K)], 1
    ).astype(np.float32)
    valid = np.ones(K, bool)
    valid[120:] = False
    cx = np.clip((xyz[:, 0] // r).astype(int), 0, g - 1)
    cz = np.clip((xyz[:, 2] // r).astype(int), 0, g - 1)
    cell = np.where(valid, cx * g + cz, g * g)
    order = np.argsort(cell, kind="stable")
    xyz, cell, valid = xyz[order], cell[order], valid[order]
    offsets = np.searchsorted(cell, np.arange(g * g + 1)).astype(np.int32)
    A = rng.normal(size=(K, H)).astype(np.float32)
    B = rng.normal(size=(K, H)).astype(np.float32)
    w1 = (rng.normal(size=(H, H)) * 0.2).astype(np.float32)
    b1 = (rng.normal(size=(H,)) * 0.1).astype(np.float32)
    src4 = np.concatenate([xyz, np.zeros((K, 1), np.float32)], 1)
    src4[~valid] = 1e6
    ctr4 = np.concatenate([xyz, np.zeros((K, 1), np.float32)], 1)
    ctr4[~valid] = -1e6
    cot = rng.normal(size=(K, H)).astype(np.float32)
    src4j, ctr4j = jnp.asarray(src4), jnp.asarray(ctr4)
    offs, cellj = jnp.asarray(offsets), jnp.asarray(cell.astype(np.int32))
    cotj = jnp.asarray(cot)

    def kernel_loss(A, B, w1, b1):
        out = slab_edge_max_train(
            A, src4j, B, ctr4j, offs, cellj, (w1, b1),
            grid_g=g, radius=r, block_centers=bk, tile=tile,
            interpret=True, compute_dtype="float32",
        )
        return jnp.sum(out * cotj), out

    def dense_loss(A, B, w1, b1):
        d2 = jnp.sum(
            (src4j[None, :, :3] - ctr4j[:, None, :3]) ** 2, axis=-1
        )
        mask = d2 <= r * r
        x = jnp.maximum(A[None, :, :] - B[:, None, :], 0.0)
        x = jnp.maximum(
            jnp.einsum("kph,hj->kpj", x, w1) + b1, 0.0
        )
        x = jnp.where(mask[:, :, None], x, NEG)
        acc = jnp.max(x, axis=1)
        out = jnp.where(acc > NEG / 2, acc, 0.0)
        return jnp.sum(out * cotj), out

    (lk, out_k), gk = jax.value_and_grad(
        kernel_loss, argnums=(0, 1, 2, 3), has_aux=True
    )(jnp.asarray(A), jnp.asarray(B), jnp.asarray(w1), jnp.asarray(b1))
    (ld, out_d), gd = jax.value_and_grad(
        dense_loss, argnums=(0, 1, 2, 3), has_aux=True
    )(jnp.asarray(A), jnp.asarray(B), jnp.asarray(w1), jnp.asarray(b1))
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_d), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(lk), float(ld), rtol=1e-5)
    names = ("d_table_a", "d_table_b", "d_w1", "d_b1")
    for name, a, b_ in zip(names, gk, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_slab_edge_max_train_forward_matches_inference_kernel():
    """The differentiable wrapper's forward must equal slab_edge_max."""
    import jax.numpy as jnp

    from pointgnn_tpu.nn.pallas_kernels import (
        slab_edge_max, slab_edge_max_train,
    )

    rng = np.random.default_rng(2)
    K, H, g, r = 128, 32, 8, 2.0
    xyz = np.stack(
        [rng.uniform(0, 14, K), rng.uniform(-1, 1, K),
         rng.uniform(0, 14, K)], 1
    ).astype(np.float32)
    cx = np.clip((xyz[:, 0] // r).astype(int), 0, g - 1)
    cz = np.clip((xyz[:, 2] // r).astype(int), 0, g - 1)
    cell = (cx * g + cz)
    order = np.argsort(cell, kind="stable")
    xyz, cell = xyz[order], cell[order]
    offsets = np.searchsorted(cell, np.arange(g * g + 1)).astype(np.int32)
    A = rng.normal(size=(K, H)).astype(np.float32)
    B = rng.normal(size=(K, H)).astype(np.float32)
    w1 = (rng.normal(size=(H, H)) * 0.2).astype(np.float32)
    b1 = (rng.normal(size=(H,)) * 0.1).astype(np.float32)
    src4 = np.concatenate([xyz, np.zeros((K, 1), np.float32)], 1)
    args = (
        jnp.asarray(A), jnp.asarray(src4), jnp.asarray(B),
        jnp.asarray(src4), jnp.asarray(offsets),
        jnp.asarray(cell.astype(np.int32)),
        (jnp.asarray(w1), jnp.asarray(b1)),
    )
    kw = dict(grid_g=g, radius=r, block_centers=8, tile=32,
              interpret=True, compute_dtype="float32")
    out_inf = np.asarray(slab_edge_max(*args, **kw))
    out_tr = np.asarray(slab_edge_max_train(*args, **kw))
    np.testing.assert_array_equal(out_inf, out_tr)


def _cell_sort(xyz, g, r):
    cx = np.clip((xyz[:, 0] // r).astype(int), 0, g - 1)
    cz = np.clip((xyz[:, 2] // r).astype(int), 0, g - 1)
    cell = cx * g + cz
    order = np.argsort(cell, kind="stable")
    offsets = np.searchsorted(
        cell[order], np.arange(g * g + 1)
    ).astype(np.int32)
    return order, cell[order].astype(np.int32), offsets


def test_gnn_slab_train_grads_match_edge_path(rng):
    """GraphNetAutoCenter in train-mode slab (custom-VJP kernel) vs the
    edge-list segment path on the same UNCAPPED radius graph: parameter
    and feature gradients must agree (f32, CPU interpret)."""
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.nn.layers import GraphNetAutoCenter

    K, C, g, r = 64, 16, 8, 2.0
    xyz = np.stack(
        [rng.uniform(0, 14, K), rng.uniform(-1, 1, K),
         rng.uniform(0, 14, K)], 1
    ).astype(np.float32)
    order, cell, offsets = _cell_sort(xyz, g, r)
    xyz = xyz[order]
    feats = rng.randn(K, C).astype(np.float32)
    # uncapped radius edges, globally dst-sorted (host convention)
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    dst_l, src_l = np.nonzero(d2 <= r * r)  # nonzero is row-major: dst sorted
    src = jnp.asarray(src_l.astype(np.int32))
    dst = jnp.asarray(dst_l.astype(np.int32))

    layer = GraphNetAutoCenter("max")
    kw = dict(
        edge_MLP_depth_list=[16, 16],
        update_MLP_depth_list=[16, 16],
        auto_offset=True,
        auto_offset_MLP_depth_list=[8, 3],
        edge_MLP_normalization_type="NONE",
        update_MLP_normalization_type="NONE",
        auto_offset_MLP_normalization_type="NONE",
    )
    params = layer.init(jax.random.PRNGKey(0), C, **kw)
    cot = jnp.asarray(rng.randn(K, C).astype(np.float32))
    xyz_j = jnp.asarray(xyz)
    slab = {
        "grid_g": g, "radius": r, "train": True,
        "offsets": jnp.asarray(offsets),
        "center_cell": jnp.asarray(cell),
    }
    dummy = jnp.zeros((1,), jnp.int32)

    def loss_edge(params, feats):
        out = layer.apply(params, feats, xyz_j, src, dst, **kw)
        return jnp.sum(out * cot)

    def loss_slab(params, feats):
        out = layer.apply(
            params, feats, xyz_j, dummy, dummy, slab=slab, **kw
        )
        return jnp.sum(out * cot)

    le, ge = jax.value_and_grad(loss_edge, argnums=(0, 1))(
        params, jnp.asarray(feats)
    )
    ls, gs = jax.value_and_grad(loss_slab, argnums=(0, 1))(
        params, jnp.asarray(feats)
    )
    np.testing.assert_allclose(float(le), float(ls), rtol=1e-5)
    flat_e, _ = jax.tree_util.tree_flatten_with_path(ge)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(gs)
    for (pe, ae), (ps, as_) in zip(flat_e, flat_s):
        assert pe == ps
        np.testing.assert_allclose(
            np.asarray(ae), np.asarray(as_), rtol=5e-4, atol=5e-4,
            err_msg=str(pe),
        )


def test_psp_slab_train_grads_match_edge_path(rng):
    """PointSetPooling train-mode slab vs the edge-list path on the
    same uncapped radius graph (raw points -> keypoints)."""
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.nn.layers import PointSetPooling

    P, K, C, g, r = 160, 64, 4, 8, 2.0
    pxyz = np.stack(
        [rng.uniform(0, 14, P), rng.uniform(-1, 1, P),
         rng.uniform(0, 14, P)], 1
    ).astype(np.float32)
    order, pcell, offsets = _cell_sort(pxyz, g, r)
    pxyz = pxyz[order]
    kp = np.sort(rng.choice(P, K, replace=False))
    kxyz = pxyz[kp]
    kcell_order, kcell, _ = _cell_sort(kxyz, g, r)
    kxyz = kxyz[kcell_order]
    feats = rng.randn(P, C).astype(np.float32)
    d2 = ((kxyz[:, None, :] - pxyz[None, :, :]) ** 2).sum(-1)
    dst_l, src_l = np.nonzero(d2 <= r * r)  # dst (=centers) sorted
    src = jnp.asarray(src_l.astype(np.int32))
    dst = jnp.asarray(dst_l.astype(np.int32))

    layer = PointSetPooling("max")
    kw = dict(
        point_MLP_depth_list=[8, 16],
        output_MLP_depth_list=[16, 16],
        point_MLP_normalization_type="NONE",
        output_MLP_normalization_type="NONE",
    )
    params = layer.init(jax.random.PRNGKey(1), C, **kw)
    cot = jnp.asarray(rng.randn(K, 16).astype(np.float32))
    slab = {
        "grid_g": g, "radius": r, "train": True,
        "offsets": jnp.asarray(offsets),
        "center_cell": jnp.asarray(kcell),
    }
    dummy = jnp.zeros((1,), jnp.int32)
    pxyz_j, kxyz_j = jnp.asarray(pxyz), jnp.asarray(kxyz)

    def loss_edge(params, feats):
        out = layer.apply(params, feats, pxyz_j, kxyz_j, src, dst, **kw)
        return jnp.sum(out * cot)

    def loss_slab(params, feats):
        out = layer.apply(
            params, feats, pxyz_j, kxyz_j, dummy, dummy,
            slab=slab, **kw
        )
        return jnp.sum(out * cot)

    le, ge = jax.value_and_grad(loss_edge, argnums=(0, 1))(
        params, jnp.asarray(feats)
    )
    ls, gs = jax.value_and_grad(loss_slab, argnums=(0, 1))(
        params, jnp.asarray(feats)
    )
    np.testing.assert_allclose(float(le), float(ls), rtol=1e-5)
    flat_e, _ = jax.tree_util.tree_flatten_with_path(ge)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(gs)
    for (pe, ae), (ps, as_) in zip(flat_e, flat_s):
        assert pe == ps
        np.testing.assert_allclose(
            np.asarray(ae), np.asarray(as_), rtol=5e-4, atol=5e-4,
            err_msg=str(pe),
        )


def test_slab_train_under_jit_and_remat(rng):
    """The custom VJP must survive jax.jit + jax.checkpoint — closing
    over tracers inside the custom_vjp leaked across this boundary
    once.  (The production step no longer remats slab layers, but
    user code may wrap the model in jax.checkpoint wholesale, so the
    combination stays supported.)"""
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.nn.layers import GraphNetAutoCenter

    K, C, g, r = 64, 8, 8, 2.0
    xyz = np.stack(
        [rng.uniform(0, 14, K), rng.uniform(-1, 1, K),
         rng.uniform(0, 14, K)], 1
    ).astype(np.float32)
    order, cell, offsets = _cell_sort(xyz, g, r)
    xyz = xyz[order]
    feats = rng.randn(K, C).astype(np.float32)
    layer = GraphNetAutoCenter("max")
    kw = dict(
        edge_MLP_depth_list=[8, 8],
        update_MLP_depth_list=[8, 8],
        edge_MLP_normalization_type="NONE",
        update_MLP_normalization_type="NONE",
    )
    params = layer.init(jax.random.PRNGKey(0), C, **kw)
    slab = {
        "grid_g": g, "radius": r, "train": True,
        "offsets": jnp.asarray(offsets),
        "center_cell": jnp.asarray(cell),
    }
    dummy = jnp.zeros((1,), jnp.int32)
    xyz_j = jnp.asarray(xyz)

    @jax.jit
    def loss(params, feats, xyz_arr, offs, cells):
        sl = dict(slab, offsets=offs, center_cell=cells)

        def run(p, f):
            return layer.apply(p, f, xyz_arr, dummy, dummy, slab=sl, **kw)

        out = jax.checkpoint(run)(params, feats)
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(loss)(
        params, jnp.asarray(feats), xyz_j,
        jnp.asarray(offsets), jnp.asarray(cell),
    )
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_slab_edge_max_halo2_matches_halo1():
    """halo=2 (cell = radius/2, 5x5 window) must produce EXACTLY the
    halo=1 (cell = radius, 3x3 window) output — the window is a
    superset of the radius ball either way and the distance test is
    exact, so the max aggregation is grid-invariant."""
    import jax.numpy as jnp

    from pointgnn_tpu.nn.pallas_kernels import slab_edge_max

    rng = np.random.default_rng(3)
    K, H, r = 256, 64, 2.0
    tile, bk = 16, 16
    xyz = np.stack(
        [rng.uniform(0, 14, K), rng.uniform(-1, 1, K),
         rng.uniform(0, 14, K)], 1
    ).astype(np.float32)
    valid = np.ones(K, bool)
    valid[250:] = False
    A = rng.normal(size=(K, H)).astype(np.float32)
    B = rng.normal(size=(K, H)).astype(np.float32)
    w1 = (rng.normal(size=(H, H)) * 0.1).astype(np.float32)
    b1 = (rng.normal(size=(H,)) * 0.1).astype(np.float32)

    outs = {}
    for halo in (1, 2):
        cell_size = r / halo
        g = int(np.ceil(16.0 / cell_size))
        cx = np.clip((xyz[:, 0] // cell_size).astype(int), 0, g - 1)
        cz = np.clip((xyz[:, 2] // cell_size).astype(int), 0, g - 1)
        cell = np.where(valid, cx * g + cz, g * g)
        order = np.argsort(cell, kind="stable")
        inv = np.empty(K, np.int64)
        inv[order] = np.arange(K)
        xyz_s, cell_s, valid_s = xyz[order], cell[order], valid[order]
        offsets = np.searchsorted(
            cell_s, np.arange(g * g + 1)
        ).astype(np.int32)
        src4 = np.concatenate([xyz_s, np.zeros((K, 1), np.float32)], 1)
        src4[~valid_s] = 1e6
        ctr4 = np.concatenate([xyz_s, np.zeros((K, 1), np.float32)], 1)
        ctr4[~valid_s] = -1e6
        out = np.asarray(slab_edge_max(
            jnp.asarray(A[order]), jnp.asarray(src4),
            jnp.asarray(B[order]), jnp.asarray(ctr4),
            jnp.asarray(offsets), jnp.asarray(cell_s.astype(np.int32)),
            (jnp.asarray(w1), jnp.asarray(b1)),
            grid_g=g, radius=r, block_centers=bk, tile=tile,
            interpret=True, halo=halo,
        ))
        outs[halo] = out[inv]
    np.testing.assert_array_equal(outs[2], outs[1])


def test_slab_train_halo2_grads_match_halo1():
    """The backward kernel's window walk honors halo: grads at halo=2
    match halo=1 (same exact radius graph).  Only to f32 rounding —
    the finer grid regroups centers into different bk-blocks, so the
    d_w / d_table accumulations reassociate (measured ~6e-8 relative);
    the forward stays bitwise equal because max is order-invariant."""
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.nn.pallas_kernels import slab_edge_max_train

    rng = np.random.default_rng(4)
    K, H, r = 128, 32, 2.0
    xyz = np.stack(
        [rng.uniform(0, 10, K), rng.uniform(-1, 1, K),
         rng.uniform(0, 10, K)], 1
    ).astype(np.float32)
    valid = np.ones(K, bool)
    A = rng.normal(size=(K, H)).astype(np.float32)
    B = rng.normal(size=(K, H)).astype(np.float32)
    w1 = (rng.normal(size=(H, H)) * 0.1).astype(np.float32)
    b1 = (rng.normal(size=(H,)) * 0.1).astype(np.float32)

    grads = {}
    for halo in (1, 2):
        cell_size = r / halo
        g = int(np.ceil(12.0 / cell_size))
        cx = np.clip((xyz[:, 0] // cell_size).astype(int), 0, g - 1)
        cz = np.clip((xyz[:, 2] // cell_size).astype(int), 0, g - 1)
        cell = (cx * g + cz).astype(np.int64)
        order = np.argsort(cell, kind="stable")
        inv = np.empty(K, np.int64)
        inv[order] = np.arange(K)
        xyz_s, cell_s = xyz[order], cell[order]
        offsets = np.searchsorted(
            cell_s, np.arange(g * g + 1)
        ).astype(np.int32)
        src4 = np.concatenate([xyz_s, np.zeros((K, 1), np.float32)], 1)
        ctr4 = np.concatenate([xyz_s, np.zeros((K, 1), np.float32)], 1)

        def loss(ta, tb, ws):
            out = slab_edge_max_train(
                ta, jnp.asarray(src4), tb, jnp.asarray(ctr4),
                jnp.asarray(offsets),
                jnp.asarray(cell_s.astype(np.int32)), ws,
                grid_g=g, radius=r, block_centers=8, tile=16,
                interpret=True, halo=halo,
            )
            return jnp.sum(out * out)

        ga, gb, gw = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(A[order]), jnp.asarray(B[order]),
            (jnp.asarray(w1), jnp.asarray(b1)),
        )
        grads[halo] = (
            np.asarray(ga)[inv], np.asarray(gb)[inv],
            np.asarray(gw[0]), np.asarray(gw[1]),
        )
    for a, b in zip(grads[1], grads[2]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_slab_edge_max_sub_block_skip_matches_unsplit():
    """The sub-block MLP skip (sub > 0) must be BITWISE equal to the
    unconditional block MLP (sub=0): matmuls are row-independent and a
    skipped sub-block contributes only -inf rows.  (The skip is OFF by
    default — measured slower on v5e, docs/PERF_NOTES.md round 4 — but
    the mechanism must stay correct for sparser workloads.)"""
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.nn.pallas_kernels import (
        slab_edge_max,
        slab_edge_max_train,
    )

    rng = np.random.default_rng(11)
    K, H, r = 256, 32, 1.5
    g = 11
    xyz = np.stack(
        [rng.uniform(0, 16, K), rng.uniform(-1, 1, K),
         rng.uniform(0, 16, K)], 1
    ).astype(np.float32)
    valid = np.ones(K, bool)
    valid[240:] = False
    cx = np.clip((xyz[:, 0] // r).astype(int), 0, g - 1)
    cz = np.clip((xyz[:, 2] // r).astype(int), 0, g - 1)
    cell = np.where(valid, cx * g + cz, g * g)
    order = np.argsort(cell, kind="stable")
    xyz_s, cell_s, valid_s = xyz[order], cell[order], valid[order]
    offsets = np.searchsorted(cell_s, np.arange(g * g + 1)).astype(np.int32)
    A = rng.normal(size=(K, H)).astype(np.float32)[order]
    B = rng.normal(size=(K, H)).astype(np.float32)[order]
    src4 = np.concatenate([xyz_s, np.zeros((K, 1), np.float32)], 1)
    src4[~valid_s] = 1e6
    ctr4 = np.concatenate([xyz_s, np.zeros((K, 1), np.float32)], 1)
    ctr4[~valid_s] = -1e6
    weights = (
        (rng.normal(size=(H, 64)) * 0.1).astype(np.float32),
        (rng.normal(size=(64,)) * 0.1).astype(np.float32),
    )
    args = (
        jnp.asarray(A), jnp.asarray(src4), jnp.asarray(B),
        jnp.asarray(ctr4), jnp.asarray(offsets),
        jnp.asarray(cell_s.astype(np.int32)), tuple(map(jnp.asarray, weights)),
    )
    kw = dict(grid_g=g, radius=r, block_centers=16, tile=16,
              interpret=True)
    base = np.asarray(slab_edge_max(*args, **kw, sub=0))
    for sub in (4, 8, 16):
        out = np.asarray(slab_edge_max(*args, **kw, sub=sub))
        np.testing.assert_array_equal(base, out)

    def gradsum(sub):
        def f(ta, tb, ws):
            y = slab_edge_max_train(
                ta, args[1], tb, args[3], args[4], args[5], ws,
                **kw, sub=sub,
            )
            return jnp.sum(y ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(args[0], args[2], args[6])

    g0 = gradsum(0)
    g8 = gradsum(8)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g8)):
        # sub-splitting reassociates the f32 row sums of dw/da —
        # tolerance, not bitwise
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_slab_zscan_modes_bitwise_identical():
    """The three z-window derivations — in-kernel per-column scan
    ("col"), hoisted per-block scan ("block"), and the XLA-precomputed
    SMEM windows ("precomp", the serving default via
    slab_kernel_wiring) — must be BITWISE identical: block/precomp only
    change WHICH superset of candidates is walked, and max aggregation
    with an exact distance test is superset-invariant."""
    import jax.numpy as jnp

    from pointgnn_tpu.nn.pallas_kernels import slab_edge_max

    rng = np.random.default_rng(5)
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
    outs = {}
    for mode in ("col", "block", "precomp"):
        outs[mode] = np.asarray(slab_edge_max(
            jnp.asarray(A), jnp.asarray(src4), jnp.asarray(B),
            jnp.asarray(ctr4), jnp.asarray(offsets),
            jnp.asarray(cell.astype(np.int32)),
            (jnp.asarray(w1), jnp.asarray(b1)),
            grid_g=g, radius=r, block_centers=bk, tile=tile,
            interpret=True, zscan=mode,
        ))
    assert np.array_equal(outs["col"], outs["precomp"])
    assert np.array_equal(outs["col"], outs["block"])
    assert np.abs(outs["col"]).sum() > 0  # non-vacuous


def test_slab_train_zscan_precomp_grads_bitwise():
    """The train kernels (custom-VJP fwd + bwd) under zscan="precomp"
    must produce bitwise-identical value AND gradients to the in-kernel
    scan: the backward walks the same columns with the same [lo, hi)
    span masks, only the window derivation moves to XLA."""
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.nn.pallas_kernels import slab_edge_max_train

    rng = np.random.default_rng(4)
    K, H, g, r = 256, 64, 8, 2.0
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
    gct = rng.normal(size=(K, H)).astype(np.float32)

    def run(mode):
        def f(a, b, w, bb):
            out = slab_edge_max_train(
                a, src4, b, ctr4, jnp.asarray(offsets),
                jnp.asarray(cell.astype(np.int32)), (w, bb),
                grid_g=g, radius=r, block_centers=16, tile=32,
                interpret=True, zscan=mode,
            )
            return jnp.sum(out * gct)

        return jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(w1),
            jnp.asarray(b1),
        )

    vc, gc = run("col")
    vp, gp = run("precomp")
    assert np.array_equal(np.asarray(vc), np.asarray(vp))
    for a, b in zip(gc, gp):
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a)).sum() > 0  # non-vacuous
