"""Pallas kernel step 3: edge-MLP + channelwise-TP aggregate, fused.

Motivation (measured, analysis/perf_probe.py): the score-model forward is
HBM-bandwidth bound - XLA materializes, per conv, the per-edge weight tensor
(B, N, M, weight_numel~180) and the edge-MLP hidden (B, N, M, 3ns), then
reads them back for the TP contraction.  This kernel computes both INSIDE
VMEM per (batch, receiver-tile) block, so per-edge HBM traffic drops to the
raw edge attributes + spherical harmonics (~5x less on the cross conv).

Two design changes versus the parked step-2 kernel
(ops/pallas/tp_aggregate.py, measured slower than XLA):

1. full-lane accumulation: instead of per-(path, cg-entry) updates on
   mul<=20 channel slices (~85% idle VPU lanes), the contraction is
   restructured per DISTINCT (sh component j, out component k) combo with a
   per-channel (F, K_PAD) selection table - every update runs across the
   full F channel lane dimension;
2. the edge MLP (Dense-relu-Dense, bias, per-channel edge masks) runs
   in-kernel as two MXU matmuls over the (tile_n*M, E) edge block.

Supports l_in, l_out <= 1 (the production irreps ladder; lmax=2 falls back
to the XLA path).  Used by DenseTPConv when ``use_pallas_fused`` is on and
the call is deterministic (inference); training keeps the XLA path (the
kernel has no dropout and no custom VJP).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tensor_product import ChannelwiseTP
from ..wigner import wigner_3j

K_PAD = 4  # l_out <= 1 components padded to 4


@functools.lru_cache(maxsize=None)
def _combo_tables(tp: ChannelwiseTP) -> Tuple[Tuple[int, int, np.ndarray], ...]:
    """Per distinct (absolute sh component j, out component k): an (F, K_PAD)
    table SEL with SEL[c, i] = alpha_p * cg[i, j, k] for channel c of path p
    (0 elsewhere).  acc[:, :, k] += sum_m w * ((xg * SEL).sum(-1)) * sh[..j]."""
    sh_slices = tp.irreps_sh.slices()
    F = tp.weight_numel
    combos = {}
    for p in tp.paths:
        cg = wigner_3j(p.l_in, p.l_sh, p.l_out)
        for i in range(cg.shape[0]):
            for j in range(cg.shape[1]):
                for k in range(cg.shape[2]):
                    coeff = float(cg[i, j, k])
                    if abs(coeff) < 1e-12:
                        continue
                    j_abs = sh_slices[p.i_sh].start + j
                    key = (j_abs, k)
                    sel = combos.setdefault(key, np.zeros((K_PAD, F), np.float32))
                    sel[i, p.w_slice[0]:p.w_slice[1]] += p.alpha * coeff
    return tuple((j_abs, k, sel) for (j_abs, k), sel in sorted(combos.items()))


def _kernel(combo_jk, n_chan, xg_ref, sh_ref, attr_ref, mask_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, sel_ref, out_ref, acc, wbuf):
    # channel lanes LAST everywhere: K_PAD=4 in the lane dim would pad every
    # buffer to 128 lanes and blow scoped VMEM.
    # xg (1, M, K_PAD, F); sh (1, TN, M, 9); attr (C, 1, TN, M, E);
    # mask (C, 1, TN, M); params full; out (1, TN, K_PAD, F)
    xg = xg_ref[0].astype(jnp.float32)           # (M, K_PAD, F)
    sh = sh_ref[0].astype(jnp.float32)           # (TN, M, 9)
    TN, M = sh.shape[0], sh.shape[1]
    E = attr_ref.shape[-1]
    H = w1_ref.shape[-1]
    F = xg.shape[-1]

    w1 = w1_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    w2 = w2_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)

    # ---- edge MLP in VMEM: w = (sum_c relu(attr_c W1 + b1) m_c) W2
    #      + (sum_c m_c) b2.  3-D dot_general keeps the (TN, M, .) layout:
    #      Mosaic cannot shape-cast across the sublane/lane split.
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hsum = jnp.zeros((TN, M, H), jnp.float32)
    msum = jnp.zeros((TN, M), jnp.float32)
    for c in range(n_chan):
        attr = attr_ref[c, 0].astype(jnp.float32)      # (TN, M, E)
        m = mask_ref[c, 0].astype(jnp.float32)         # (TN, M)
        h = jnp.maximum(dot(attr, w1) + b1, 0.0)       # (TN, M, H)
        hsum = hsum + h * m[:, :, None]
        msum = msum + m
    w = dot(hsum, w2) + msum[:, :, None] * b2          # (TN, M, F)
    wbuf[:] = w

    # ---- full-lane TP aggregate
    acc[:] = jnp.zeros_like(acc)
    for q, (j_abs, k) in enumerate(combo_jk):
        sel = sel_ref[q].astype(jnp.float32)     # (K_PAD, F)
        # t[m, c] = sum_i xg[m, i, c] * sel[i, c]  (full F lanes)
        t = (xg * sel).sum(axis=1)               # (M, F)
        contrib = (wbuf[:] * t[None, :, :] * sh[:, :, j_abs][:, :, None]).sum(axis=1)
        acc[:, k, :] += contrib
    out_ref[0] = acc[:]


@functools.partial(
    jax.jit, static_argnames=("tp", "tile_n", "interpret"))
def tp_aggregate_fused(
    tp: ChannelwiseTP,
    x: jnp.ndarray,                    # (B, M, D_in) sender features
    sh: jnp.ndarray,                   # (B, N, M, 9)
    attrs: Tuple[jnp.ndarray, ...],    # C x (B, N, M, E) edge attributes
    masks: Tuple[jnp.ndarray, ...],    # C x (B, N, M) bool/float
    w1: jnp.ndarray, b1: jnp.ndarray,  # edge MLP params (E,H), (H,)
    w2: jnp.ndarray, b2: jnp.ndarray,  # (H, F), (F,)
    tile_n: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused edge-MLP + aggregate -> (B, N, F, K_PAD) float32."""
    B, N, M, _ = sh.shape
    F = tp.weight_numel
    assert all(ir.l <= 1 for _, ir in tp.irreps_out.items)
    assert all(ir.l <= 1 for _, ir in tp.irreps_in.items)

    # per-channel component layout of x, components in SUBLANES (K_PAD
    # first): xg[b, m, i, c]
    in_slices = tp.irreps_in.slices()
    idx = np.zeros((K_PAD, F), np.int32)
    valid = np.zeros((K_PAD, F), np.float32)
    for p in tp.paths:
        start = in_slices[p.i_in].start
        d1 = 2 * p.l_in + 1
        for u in range(p.mul_in):
            c = p.w_slice[0] + u
            for i in range(min(d1, K_PAD)):
                idx[i, c] = start + u * d1 + i
                valid[i, c] = 1.0
    xg = x[:, :, jnp.asarray(idx)] * jnp.asarray(valid)

    attr = jnp.stack([a for a in attrs], axis=0)           # (C, B, N, M, E)
    mask = jnp.stack(
        [m.astype(jnp.float32) for m in masks], axis=0)    # (C, B, N, M)
    C = attr.shape[0]
    E, H = w1.shape

    pad_n = (-N) % tile_n
    if pad_n:
        sh = jnp.pad(sh, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        attr = jnp.pad(attr, ((0, 0), (0, 0), (0, pad_n), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    combos = _combo_tables(tp)
    combo_jk = tuple((j_abs, k) for j_abs, k, _ in combos)
    sel_stack = jnp.asarray(np.stack([sel for _, _, sel in combos]))  # (Q,F,K_PAD)
    Q = sel_stack.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, combo_jk, C),
        grid=(B, Np // tile_n),
        in_specs=[
            pl.BlockSpec((1, M, K_PAD, F), lambda b, n: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, M, sh.shape[-1]), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1, tile_n, M, E), lambda b, n: (0, b, n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1, tile_n, M), lambda b, n: (0, b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, H), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda b, n: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, F), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F,), lambda b, n: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, K_PAD, F), lambda b, n: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, K_PAD, F), lambda b, n: (b, n, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, K_PAD, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_n, K_PAD, F), jnp.float32),
            pltpu.VMEM((tile_n, M, F), jnp.float32),
        ],
        interpret=interpret,
    )(xg, sh, attr, mask, w1, b1, w2, b2, sel_stack)
    # back to (B, N, F, K_PAD) for blocks_from_padded
    return jnp.swapaxes(out[:, :N], -1, -2)
