"""Pallas kernel: fused scalar-path tensor-product aggregation.

Computes, for the (l_in = 0) paths of a channelwise tensor product,

    out[b, n, u, k] = sum_m  x[b, m, u] * sh[b, n, m, k] * w[b, n, m, u]

in one kernel per (batch row, receiver tile): the (N, M, U) intermediate the
XLA einsum materializes lives only in VMEM here, and the sender reduction
happens in-register.  Edge masking is assumed folded into ``w`` (the conv
layer already zeroes masked edges).

Layout: M (senders) rides the lane dimension; receivers x channels ride
sublanes.  Shapes are padded by the caller to TPU tiles (M multiple of 128
after padding inside this wrapper).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, sh_ref, w_ref, out_ref):
    """One (b, n-tile): x (1,M,U), sh (1,TN,M,K), w (1,TN,M,U) -> out (1,TN,U,K)."""
    x = x_ref[0]             # (M, U)
    sh = sh_ref[0]           # (TN, M, K)
    w = w_ref[0]             # (TN, M, U)
    xw = w * x[None, :, :]   # (TN, M, U)
    # contract senders: (TN, U, K) = sum_m xw[TN, M, U] * sh[TN, M, K]
    out = jax.lax.dot_general(
        xw, sh,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def scalar_path_aggregate(
    x: jnp.ndarray,   # (B, M, U)
    sh: jnp.ndarray,  # (B, N, M, K)
    w: jnp.ndarray,   # (B, N, M, U) pre-masked
    tile_n: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused sum_m x*sh*w -> (B, N, U, K), float32."""
    B, N, M, K = sh.shape
    U = x.shape[-1]
    pad_n = (-N) % tile_n
    if pad_n:
        sh = jnp.pad(sh, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
    Np = N + pad_n

    grid = (B, Np // tile_n)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, M, U), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, M, K), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, M, U), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, U, K), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, U, K), jnp.float32),
        interpret=interpret,
    )(x, sh, w)
    return out[:, :N]
