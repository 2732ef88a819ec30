"""Pallas scalar-path TP-aggregate kernel vs the XLA einsum reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffphore_tpu.ops.pallas.tp_scalar import scalar_path_aggregate

INTERPRET = jax.default_backend() != "tpu"


def test_scalar_path_aggregate_matches_einsum():
    rng = np.random.default_rng(0)
    B, N, M, U, K = 3, 24, 80, 32, 8
    x = jnp.asarray(rng.normal(size=(B, M, U)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(B, N, M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, N, M, U)), jnp.float32)
    got = scalar_path_aggregate(x, sh, w, interpret=INTERPRET)
    want = jnp.einsum("bmu,bnmk,bnmu->bnuk", x, sh, w)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-3), (
        np.abs(np.asarray(got) - np.asarray(want)).max())


def test_scalar_path_aggregate_nondivisible_n():
    rng = np.random.default_rng(1)
    B, N, M, U, K = 2, 13, 40, 16, 4  # N not a multiple of tile_n
    x = jnp.asarray(rng.normal(size=(B, M, U)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(B, N, M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, N, M, U)), jnp.float32)
    got = scalar_path_aggregate(x, sh, w, interpret=INTERPRET)
    want = jnp.einsum("bmu,bnmk,bnmu->bnuk", x, sh, w)
    assert got.shape == (B, N, U, K)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_masked_edges_contribute_zero():
    rng = np.random.default_rng(2)
    B, N, M, U, K = 1, 8, 16, 8, 4
    x = jnp.asarray(rng.normal(size=(B, M, U)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(B, N, M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, N, M, U)), jnp.float32)
    w = w.at[:, :, M // 2:, :].set(0.0)  # mask folded into w
    got = scalar_path_aggregate(x, sh, w, interpret=INTERPRET)
    want = jnp.einsum("bmu,bnmk,bnmu->bnuk",
                      x[:, : M // 2], sh[:, :, : M // 2], w[:, :, : M // 2])
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_tp_aggregate_kernel_matches_xla():
    """Whole-TP pallas kernel == ChannelwiseTP.aggregate for the layer-4 conv."""
    from diffphore_tpu.ops.tensor_product import channelwise_tp
    from diffphore_tpu.ops.pallas.tp_aggregate import blocks_from_padded, tp_aggregate_pallas

    rng = np.random.default_rng(3)
    tp = channelwise_tp("8x0e + 4x1o + 4x1e + 8x0o", "1x0e + 1x1o + 1x2e",
                        "8x0e + 4x1o + 4x1e + 8x0o")
    B, N, M = 2, 12, 24
    x = jnp.asarray(rng.normal(size=(B, M, 40)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(B, N, M, 9)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, N, M, tp.weight_numel)), jnp.float32)
    padded = tp_aggregate_pallas(tp, x, sh, w, tile_n=4, interpret=INTERPRET)
    got = blocks_from_padded(tp, padded)
    want = tp.aggregate(x, sh, w)
    assert len(got) == len(want)
    for g, wv in zip(got, want):
        assert (g is None) == (wv is None)
        if g is not None:
            assert np.allclose(np.asarray(g), np.asarray(wv), atol=2e-3), (
                np.abs(np.asarray(g) - np.asarray(wv)).max())
