"""Pallas kernel: whole channelwise-TP aggregation (all paths, one kernel).

Fuses, for every path p of a channelwise tensor product,

  out[b, n, c, k] = alpha_p * sum_{m, i, j} x[b, m, u_p(c), i] * sh[b, n, m, j]
                    * C_p[i, j, k] * w[b, n, m, c]

into a single pallas_call per convolution - the XLA lowering emits ~12
separate path einsums with interleaving layout copies; here the Wigner-3j
contraction is unrolled over its NONZERO entries (the CG tensors are sparse:
<= ~10 entries per path) as fused multiply-reduce passes entirely in VMEM.

Grid: (B, N/tile_n).  Static path metadata is baked into the kernel body.
Output layout: (B, N, F, 4) float32 with each channel's l_out components in
[..., :2*l_out+1]; the caller slices per-irrep blocks and applies the static
mixes (tiny node-level matmuls).

STATUS (measured on the real TPU, production conv shape B=40 N=M=32 F=60):
correct (interpret mode exact vs ChannelwiseTP.aggregate; on-TPU within bf16
einsum tolerance of the XLA path) but NOT faster - 2.9 ms vs 1.6 ms for the
XLA lowering.  The per-(i,j,k) passes place mul=10-20 channels in the
128-wide VPU lane dimension (~85% idle); a (j,k)-factored variant with all
F channels in lanes measured 3.7 ms (the precomputed CG-contracted node
tensor costs more than the fusion saves).  The XLA einsum lowering keeps the
MXU busy and is already near the floor at these sizes, so DenseTPConv keeps
the XLA path; this kernel is retained as the verified starting point for a
future MXU-mapped formulation (pad F->128, express the sender reduction as
dot_general, fuse the edge MLP into the same kernel).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tensor_product import ChannelwiseTP
from ..wigner import wigner_3j

K_PAD = 4  # l_out <= 1 components padded to 4


def _path_meta(tp: ChannelwiseTP) -> Tuple:
    """Static per-path info: (in_offset, mul, d1, sh_offset, d2, w_offset,
    out_k_dim, alpha, nonzero CG entries)."""
    in_slices = tp.irreps_in.slices()
    sh_slices = tp.irreps_sh.slices()
    meta = []
    for p in tp.paths:
        cg = wigner_3j(p.l_in, p.l_sh, p.l_out)
        nz = [
            (i, j, k, float(cg[i, j, k]))
            for i in range(cg.shape[0])
            for j in range(cg.shape[1])
            for k in range(cg.shape[2])
            if abs(cg[i, j, k]) > 1e-12
        ]
        meta.append((
            in_slices[p.i_in].start, p.mul_in, 2 * p.l_in + 1,
            sh_slices[p.i_sh].start, 2 * p.l_sh + 1,
            p.w_slice[0], 2 * p.l_out + 1, p.alpha, tuple(nz),
        ))
    return tuple(meta)


def _kernel(meta, xg_ref, sh_ref, w_ref, out_ref, acc):
    # xg (1, M, F, 4), sh (1, TN, M, 9), w (1, TN, M, F) -> out (1, TN, F, K_PAD)
    xg = xg_ref[0].astype(jnp.float32)    # (M, F, 4): channel components
    sh = sh_ref[0].astype(jnp.float32)    # (TN, M, 9)
    w = w_ref[0].astype(jnp.float32)      # (TN, M, F)
    acc[:] = jnp.zeros_like(acc)
    for in_off, mul, d1, sh_off, d2, w_off, d3, alpha, nz in meta:
        wb = w[:, :, w_off:w_off + mul]                     # (TN, M, mul)
        for i, j, k, coeff in nz:
            xi = xg[:, w_off:w_off + mul, i]                # (M, mul)
            shj = sh[:, :, sh_off + j]                      # (TN, M)
            term = (wb * xi[None, :, :] * shj[:, :, None]).sum(axis=1)
            acc[:, w_off:w_off + mul, k] += (alpha * coeff) * term
    out_ref[0] = acc[:]


@functools.partial(jax.jit, static_argnames=("tp", "tile_n", "interpret"))
def tp_aggregate_pallas(
    tp: ChannelwiseTP,
    x: jnp.ndarray,    # (B, M, D_in)
    sh: jnp.ndarray,   # (B, N, M, 9)
    w: jnp.ndarray,    # (B, N, M, F) pre-masked
    tile_n: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """All-path channelwise TP aggregate -> (B, N, F, K_PAD) float32."""
    B, N, M, _ = sh.shape
    F = tp.weight_numel
    assert all(ir.l <= 1 for _, ir in tp.irreps_out.items), (
        "pallas TP kernel supports l_out <= 1 (use_second_order_repr needs the XLA path)")
    # regather x into per-channel component layout (M node-level, cheap):
    # xg[b, m, c, i] = x[b, m, in_off_c + u_c*d1 + i]
    in_slices = tp.irreps_in.slices()
    idx = np.zeros((F, K_PAD), np.int32)
    valid = np.zeros((F, K_PAD), np.float32)
    for p in tp.paths:
        start = in_slices[p.i_in].start
        d1 = 2 * p.l_in + 1
        for u in range(p.mul_in):
            c = p.w_slice[0] + u
            for i in range(min(d1, K_PAD)):
                idx[c, i] = start + u * d1 + i
                valid[c, i] = 1.0
    xg = x[:, :, jnp.asarray(idx)] * jnp.asarray(valid)   # (B, M, F, 4)
    pad_n = (-N) % tile_n
    if pad_n:
        sh = jnp.pad(sh, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
    Np = N + pad_n
    meta = _path_meta(tp)

    out = pl.pallas_call(
        functools.partial(_kernel, meta),
        grid=(B, Np // tile_n),
        in_specs=[
            pl.BlockSpec((1, M, F, K_PAD), lambda b, n: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, M, sh.shape[-1]), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, M, F), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, F, K_PAD), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, F, K_PAD), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_n, F, K_PAD), jnp.float32)],
        interpret=interpret,
    )(xg, sh, w)
    return out[:, :N]


def blocks_from_padded(tp: ChannelwiseTP, padded: jnp.ndarray):
    """Split the (B, N, F, K_PAD) kernel output into per-irrep blocks aligned
    with ChannelwiseTP.aggregate's return value."""
    out = [None] * len(tp.irreps_out.items)
    # channels appear in path order; group per output irrep like aggregate()
    for k_blk, (mul, ir) in enumerate(tp.irreps_out.items):
        parts = []
        for p in tp.paths:
            if p.i_out == k_blk:
                parts.append(padded[..., p.w_slice[0]:p.w_slice[1], : ir.dim])
        if parts:
            out[k_blk] = jnp.concatenate(parts, axis=-2)
    return out
