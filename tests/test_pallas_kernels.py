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
