"""Fused edge-MLP + TP-aggregate pallas kernel (ops/pallas/tp_fused.py):
exactness vs the XLA reference composition in interpret mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffphore_tpu.ops.pallas.tp_aggregate import blocks_from_padded
from diffphore_tpu.ops.pallas.tp_fused import tp_aggregate_fused
from diffphore_tpu.ops.tensor_product import channelwise_tp

IRREPS_IN = "20x0e + 10x1o + 10x1e + 20x0o"
IRREPS_SH = "1x0e + 1x1o + 1x2e"
IRREPS_OUT = "20x0e + 10x1o + 10x1e + 20x0o"


@pytest.mark.parametrize("n_chan", [1, 2])
def test_fused_kernel_matches_xla(n_chan):
    tp = channelwise_tp(IRREPS_IN, IRREPS_SH, IRREPS_OUT)
    rng = np.random.default_rng(0)
    B, N, M, E, H = 2, 10, 12, 24, 16
    F = tp.weight_numel
    x = jnp.asarray(rng.normal(size=(B, M, tp.irreps_in.dim)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(B, N, M, 9)), jnp.float32)
    attrs = tuple(jnp.asarray(rng.normal(size=(B, N, M, E)), jnp.float32)
                  for _ in range(n_chan))
    masks = tuple(jnp.asarray(rng.random((B, N, M)) > 0.3)
                  for _ in range(n_chan))
    w1 = jnp.asarray(rng.normal(size=(E, H)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H, F)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(F,)) * 0.1, jnp.float32)

    # XLA reference: explicit edge MLP + aggregate
    w = 0.0
    for a, m in zip(attrs, masks):
        h = jnp.maximum(jnp.einsum("bnme,eh->bnmh", a, w1) + b1, 0.0)
        w = w + (jnp.einsum("bnmh,hf->bnmf", h, w2) + b2) * m[..., None]
    ref_blocks = tp.aggregate(x, sh, w)

    out = tp_aggregate_fused(tp, x, sh, attrs, masks, w1, b1, w2, b2,
                             tile_n=5, interpret=True)
    got_blocks = blocks_from_padded(tp, out)

    for rb, gb in zip(ref_blocks, got_blocks):
        assert (rb is None) == (gb is None)
        if rb is None:
            continue
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                                   rtol=2e-4, atol=2e-4)
