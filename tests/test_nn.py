import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointgnn_tpu.nn import mlp
from pointgnn_tpu.nn.segment import segment_max, segment_mean, segment_sum
from pointgnn_tpu.nn.layers import (
    ClassAwarePredictor,
    GraphNetAutoCenter,
    PointSetPooling,
)


def test_segment_max_matches_unsorted_semantics(rng):
    feats = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    dst = jnp.asarray(np.array([0, 0, 1, 1, 1, 2, 4, 4, 5, 5]))
    out = segment_max(feats, dst, 6)
    ref = np.full((6, 4), -np.inf, np.float32)
    for i, d in enumerate(np.asarray(dst)):
        ref[d] = np.maximum(ref[d], np.asarray(feats)[i])
    ref[3] = 0.0  # empty segment -> neutral fill
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_segment_sentinel_padding_dropped(rng):
    feats = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    dst = jnp.asarray(np.array([0, 1, 2, 2, 4, 4, 4, 4]))  # last 4 = pad
    out_full = segment_max(feats[:4], dst[:4], 4)
    out_pad = segment_max(feats, dst, 4)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_pad))


def test_segment_mean_sum(rng):
    feats = jnp.asarray(rng.randn(6, 2).astype(np.float32))
    dst = jnp.asarray(np.array([0, 0, 0, 1, 1, 2]))
    s = np.asarray(segment_sum(feats, dst, 3))
    m = np.asarray(segment_mean(feats, dst, 3))
    f = np.asarray(feats)
    np.testing.assert_allclose(s[0], f[:3].sum(0), rtol=1e-6)
    np.testing.assert_allclose(m[1], f[3:5].mean(0), rtol=1e-6)


def test_mlp_is_logits_last_layer_linear(rng):
    key = jax.random.PRNGKey(0)
    params = mlp.init_mlp(key, 4, [8, 8])
    x = jnp.asarray(rng.randn(5, 4).astype(np.float32) * 10)
    y_logits = mlp.apply_mlp(params, x, is_logits=True)
    y_act = mlp.apply_mlp(params, x, is_logits=False)
    # with ReLU on the last layer, y_act = relu(y_logits)
    np.testing.assert_allclose(
        np.asarray(y_act), np.maximum(np.asarray(y_logits), 0), rtol=1e-5
    )
    # logits output can be negative
    assert (np.asarray(y_logits) < 0).any()


def test_masked_instance_norm_ignores_pad_rows(rng):
    x = rng.randn(10, 3).astype(np.float32)
    x[5:] = 1e6  # garbage in padded rows
    mask = np.zeros(10, np.float32)
    mask[:5] = 1
    y = np.asarray(mlp.instance_norm(jnp.asarray(x), jnp.asarray(mask)))
    y_ref = np.asarray(mlp.instance_norm(jnp.asarray(x[:5])))
    np.testing.assert_allclose(y[:5], y_ref, rtol=1e-4)


def test_regularization_only_weights():
    key = jax.random.PRNGKey(1)
    params = {"layer": mlp.init_mlp(key, 3, [4])}
    # set bias nonzero; l1 must ignore it
    params["layer"][0]["b"] = jnp.ones((4,))
    reg = mlp.regularization_loss(params, mlp.l1_regularizer(1.0))
    want = np.abs(np.asarray(params["layer"][0]["w"])).sum()
    np.testing.assert_allclose(float(reg), want, rtol=1e-6)


# ---------------------------------------------------------------------------
# layer parity vs direct transliteration of the reference math
# ---------------------------------------------------------------------------

def _np_mlp(params, x, is_logits):
    n = len(params)
    for i, layer in enumerate(params):
        x = x @ np.asarray(layer["w"]) + np.asarray(layer["b"])
        if not (is_logits and i == n - 1):
            x = np.maximum(x, 0)
    return x


def _np_segment_max(feats, seg, num):
    out = np.full((num, feats.shape[1]), -np.inf, feats.dtype)
    for i, s in enumerate(seg):
        if s < num:
            out[s] = np.maximum(out[s], feats[i])
    out[~np.isfinite(out).all(1)] = 0
    return out


def test_graphnet_autocenter_matches_reference_math(rng):
    n, e, c = 30, 100, 16
    feats = rng.randn(n, c).astype(np.float32)
    xyz = rng.randn(n, 3).astype(np.float32)
    src = rng.randint(0, n, e)
    dst = np.sort(rng.randint(0, n, e))
    layer = GraphNetAutoCenter()
    kw = dict(
        edge_MLP_depth_list=[16, 16],
        update_MLP_depth_list=[16, 16],
        auto_offset=True,
        auto_offset_MLP_depth_list=[8, 3],
        edge_MLP_normalization_type="NONE",
        update_MLP_normalization_type="NONE",
        auto_offset_MLP_normalization_type="NONE",
    )
    params = layer.init(jax.random.PRNGKey(0), c, **kw)
    got = np.asarray(
        layer.apply(
            params, jnp.asarray(feats), jnp.asarray(xyz),
            jnp.asarray(src), jnp.asarray(dst), **kw
        )
    )
    # reference math (gnn.py:298-373): offset dst only, edge MLP all
    # activated, segment max, linear update MLP, residual
    offset = _np_mlp(params["auto_offset_mlp"], feats, is_logits=True)
    shifted = xyz + offset
    edge_in = np.concatenate([feats[src], xyz[src] - shifted[dst]], axis=1)
    edge_f = _np_mlp(params["edge_mlp"], edge_in, is_logits=False)
    agg = _np_segment_max(edge_f, dst, n)
    update = _np_mlp(params["update_mlp"], agg, is_logits=True)
    want = update + feats
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_point_set_pooling_matches_reference_math(rng):
    p, k, e, c = 50, 10, 200, 4
    feats = rng.randn(p, c).astype(np.float32)
    xyz = rng.randn(p, 3).astype(np.float32)
    kp = rng.choice(p, k, replace=False)
    center_xyz = xyz[kp]
    src = rng.randint(0, p, e)
    dst = np.sort(rng.randint(0, k, e))
    layer = PointSetPooling()
    kw = dict(
        point_MLP_depth_list=[8, 16],
        output_MLP_depth_list=[16, 16],
        point_MLP_normalization_type="NONE",
        output_MLP_normalization_type="NONE",
    )
    params = layer.init(jax.random.PRNGKey(0), c, **kw)
    got = np.asarray(
        layer.apply(
            params, jnp.asarray(feats), jnp.asarray(xyz),
            jnp.asarray(center_xyz), jnp.asarray(src), jnp.asarray(dst),
            **kw
        )
    )
    edge_in = np.concatenate(
        [feats[src], xyz[src] - center_xyz[dst]], axis=1
    )
    edge_f = _np_mlp(params["point_mlp"], edge_in, is_logits=False)
    agg = _np_segment_max(edge_f, dst, k)
    want = _np_mlp(params["output_mlp"], agg, is_logits=False)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_predictor_shapes_and_class_heads(rng):
    n, c, ncls, enc = 20, 32, 4, 7
    feats = jnp.asarray(rng.randn(n, c).astype(np.float32))
    pred = ClassAwarePredictor(cls_Ks=(64,), loc_Ks=(64, 64))
    params = pred.init(jax.random.PRNGKey(0), c, ncls, enc)
    logits, boxes = pred.apply(
        params, feats, ncls, enc,
        normalization_type="NONE", activation_type="ReLU",
    )
    assert logits.shape == (n, ncls)
    assert boxes.shape == (n, ncls, enc)
    # per-class heads are distinct
    assert not np.allclose(
        np.asarray(boxes[:, 0]), np.asarray(boxes[:, 1])
    )


def test_separated_predictor_splits_features(rng):
    n, ncls, enc = 10, 4, 7
    c = 32  # divisible by ncls
    feats = jnp.asarray(rng.randn(n, c).astype(np.float32))
    pred = ClassAwarePredictor(cls_Ks=(64,), loc_Ks=(64, 64), separated=True)
    params = pred.init(jax.random.PRNGKey(0), c, ncls, enc)
    logits, boxes = pred.apply(
        params, feats, ncls, enc,
        normalization_type="NONE", activation_type="ReLU",
    )
    assert boxes.shape == (n, ncls, enc)
    # head 0 must only depend on the first c//ncls features
    feats2 = feats.at[:, c // ncls :].set(0.0)
    _, boxes2 = pred.apply(
        params, feats2, ncls, enc,
        normalization_type="NONE", activation_type="ReLU",
    )
    np.testing.assert_allclose(
        np.asarray(boxes[:, 0]), np.asarray(boxes2[:, 0]), rtol=1e-5
    )


def test_chunked_aggregate_matches_unchunked():
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.nn import segment

    rng = np.random.default_rng(0)
    n, e, c = 64, 256, 8
    feats = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    dst[-16:] = n  # sentinel padding
    src = rng.integers(0, n, e).astype(np.int32)
    w = jnp.asarray(rng.normal(size=(c, c)).astype(np.float32))

    def edge_fn(s, d):
        return jnp.maximum(feats[s] @ w, 0.0)

    for agg in ("max", "sum", "mean"):
        ref = segment.AGGREGATIONS[agg](edge_fn(src, dst), jnp.asarray(dst), n)
        chunked = segment.chunked_aggregate(
            edge_fn, jnp.asarray(src), jnp.asarray(dst), n, c, agg, 8
        )
        np.testing.assert_allclose(np.asarray(ref), np.asarray(chunked),
                                   rtol=1e-5, atol=1e-5)

    # gradients flow through the chunked path
    def loss(f):
        def efn(s, d):
            return jnp.maximum(f[s] @ w, 0.0)
        return jnp.sum(
            segment.chunked_aggregate(
                efn, jnp.asarray(src), jnp.asarray(dst), n, c, "max", 8
            )
        )

    g = jax.grad(loss)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_blocked_max_matches_segment_path():
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.nn.layers import GraphNetAutoCenter

    rng = np.random.default_rng(0)
    n, s, c = 32, 8, 16
    feats = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    xyz = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    # blocked layout: S slots per center, some sentinel-padded
    dst_blocks = np.repeat(np.arange(n), s).astype(np.int32)
    invalid = rng.uniform(size=n * s) < 0.3
    dst_blocks[invalid] = n
    src = rng.integers(0, n, n * s).astype(np.int32)
    src[invalid] = 0
    mask = jnp.ones(n)
    layer = GraphNetAutoCenter("max")
    kw = dict(
        edge_MLP_depth_list=[c, c], update_MLP_depth_list=[c, c],
        edge_MLP_normalization_type="NONE",
        update_MLP_normalization_type="NONE",
        auto_offset=False,
    )
    params = layer.init(jax.random.PRNGKey(0), c, **kw)
    out_seg = layer.apply(
        params, feats, xyz, jnp.asarray(src), jnp.asarray(dst_blocks),
        vertex_mask=mask, **kw,
    )
    out_blk = layer.apply(
        params, feats, xyz, jnp.asarray(src), jnp.asarray(dst_blocks),
        vertex_mask=mask, blocked_edges=s, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(out_seg), np.asarray(out_blk), rtol=1e-5, atol=1e-5
    )
