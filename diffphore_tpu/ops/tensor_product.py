"""Weighted fully-connected tensor products of irreps features - the single
hot op of the score network (reference: e3nn o3.FullyConnectedTensorProduct,
score_model_phore.py:123).

The implementation is a set of small einsums over statically precomputed
Wigner-3j blocks; XLA fuses the per-path contractions with the surrounding
edge MLP.  Weights are always external (the reference uses
``shared_weights=False`` and produces them from an edge MLP), so this module
is a pure function of (features, sh, weights).

Normalization follows e3nn defaults (irrep_normalization='component',
path_normalization='element'): each path is scaled by
``sqrt(2*l_out + 1) / sqrt(fan_in)`` with ``fan_in = sum of mul_in over all
paths feeding the same output irrep block``.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .irreps import Irrep, Irreps, parse
from .wigner import wigner_3j


@dataclasses.dataclass(frozen=True)
class _Path:
    i_in: int
    i_sh: int
    i_out: int
    mul_in: int
    mul_out: int
    l_in: int
    l_sh: int
    l_out: int
    w_slice: Tuple[int, int]  # [start, stop) into the flat weight vector
    alpha: float


@dataclasses.dataclass(frozen=True)
class FullyConnectedTP:
    """Static metadata for a fully-connected tensor product.

    ``sh`` inputs are assumed multiplicity-1 per irrep (true for spherical
    harmonics and for the torsion-bond SH channel).
    """

    irreps_in: Irreps
    irreps_sh: Irreps
    irreps_out: Irreps
    paths: Tuple[_Path, ...]
    weight_numel: int

    def __call__(self, x: jnp.ndarray, sh: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
        """Apply the TP.

        Args:
          x:  (..., irreps_in.dim) features.
          sh: (..., irreps_sh.dim) spherical-harmonic features.
          weights: (..., weight_numel) external path weights.
        Returns:
          (..., irreps_out.dim) features.
        """
        in_slices = self.irreps_in.slices()
        sh_slices = self.irreps_sh.slices()
        out_slices = self.irreps_out.slices()
        out_blocks = [None] * len(self.irreps_out)
        for p in self.paths:
            xb = x[..., in_slices[p.i_in]]
            xb = xb.reshape(xb.shape[:-1] + (p.mul_in, 2 * p.l_in + 1))
            shb = sh[..., sh_slices[p.i_sh]]
            wb = weights[..., p.w_slice[0]:p.w_slice[1]]
            wb = wb.reshape(wb.shape[:-1] + (p.mul_in, p.mul_out))
            cg = jnp.asarray(wigner_3j(p.l_in, p.l_sh, p.l_out), dtype=x.dtype)
            # (..., u, i) x (..., j) x (i, j, k) x (..., u, v) -> (..., v, k)
            contrib = p.alpha * jnp.einsum(
                "...ui,...j,ijk,...uv->...vk", xb, shb, cg, wb,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            contrib = contrib.reshape(contrib.shape[:-2] + (p.mul_out * (2 * p.l_out + 1),))
            prev = out_blocks[p.i_out]
            out_blocks[p.i_out] = contrib if prev is None else prev + contrib
        # Fill irreps with no incoming path with zeros so output dim is fixed.
        parts = []
        for k, (mul, ir) in enumerate(self.irreps_out):
            if out_blocks[k] is None:
                parts.append(jnp.zeros(x.shape[:-1] + (mul * ir.dim,), dtype=x.dtype))
            else:
                parts.append(out_blocks[k])
        return jnp.concatenate(parts, axis=-1)


@functools.lru_cache(maxsize=None)
def fully_connected_tp(irreps_in: str, irreps_sh: str, irreps_out: str) -> FullyConnectedTP:
    """Build (and cache) the static path table for a tensor product."""
    irr_in, irr_sh, irr_out = parse(str(irreps_in)), parse(str(irreps_sh)), parse(str(irreps_out))
    raw_paths: List[List] = []
    fan_in = [0] * len(irr_out)
    for i, (mul_in, ir_in) in enumerate(irr_in):
        for j, (mul_sh, ir_sh) in enumerate(irr_sh):
            assert mul_sh == 1, "sh inputs must be multiplicity-1"
            for k, (mul_out, ir_out) in enumerate(irr_out):
                if ir_out in ir_in * ir_sh:
                    raw_paths.append([i, j, k, mul_in, mul_out, ir_in.l, ir_sh.l, ir_out.l])
                    fan_in[k] += mul_in
    paths: List[_Path] = []
    offset = 0
    for i, j, k, mul_in, mul_out, l_in, l_sh, l_out in raw_paths:
        n = mul_in * mul_out
        alpha = math.sqrt(2 * l_out + 1) / math.sqrt(max(fan_in[k], 1))
        paths.append(
            _Path(i, j, k, mul_in, mul_out, l_in, l_sh, l_out, (offset, offset + n), alpha)
        )
        offset += n
    return FullyConnectedTP(irr_in, irr_sh, irr_out, tuple(paths), offset)


@dataclasses.dataclass(frozen=True)
class ChannelwiseTP:
    """Channel-wise ("uvu") tensor product: one edge weight per input channel
    per path, followed by a *static* per-irrep linear mix to the output
    multiplicities.

    This is the standard efficient reformulation of the fully-connected TP
    (used by NequIP/Allegro-style networks): edge weights shrink from
    sum(mul_in * mul_out) to sum(mul_in), which turns the dominant per-edge
    weight tensor from ~3000 to ~150 floats per edge - the static mix runs as
    one MXU matmul per output irrep on the *aggregated* node features, not per
    edge.  Same function class; different (cheaper) parameterization.
    """

    irreps_in: Irreps
    irreps_sh: Irreps
    irreps_out: Irreps
    paths: Tuple[_Path, ...]
    weight_numel: int
    #: per output irrep block: (block_index, fan_in_channels, mul_out)
    mix_specs: Tuple[Tuple[int, int, int], ...]

    def __call__(self, x: jnp.ndarray, sh: jnp.ndarray, weights: jnp.ndarray):
        """Returns per-output-irrep stacked channels BEFORE the static mix:
        a list aligned with irreps_out of (..., fan_in, 2l+1) arrays (None
        when no path feeds that irrep)."""
        in_slices = self.irreps_in.slices()
        sh_slices = self.irreps_sh.slices()
        blocks: List[List[jnp.ndarray]] = [[] for _ in self.irreps_out.items]
        for p in self.paths:
            xb = x[..., in_slices[p.i_in]]
            xb = xb.reshape(xb.shape[:-1] + (p.mul_in, 2 * p.l_in + 1))
            shb = sh[..., sh_slices[p.i_sh]]
            wb = weights[..., p.w_slice[0]:p.w_slice[1]]  # (..., mul_in)
            cg = jnp.asarray(wigner_3j(p.l_in, p.l_sh, p.l_out), dtype=x.dtype)
            contrib = p.alpha * jnp.einsum(
                "...ui,...j,ijk,...u->...uk", xb, shb, cg, wb,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            blocks[p.i_out].append(contrib)
        out = []
        for parts in blocks:
            out.append(jnp.concatenate(parts, axis=-2) if parts else None)
        return out

    def aggregate(self, x: jnp.ndarray, sh: jnp.ndarray, weights: jnp.ndarray):
        """Edge-summed TP: one einsum per path with the sender reduction
        folded in.

        Args:
          x:  (B, M, dim_in) sender features (NOT broadcast over receivers),
              or (B, N, M, dim_in) per-receiver gathered senders for
              KNN-compacted grids (M = neighbor slot of receiver N).
          sh: (B, N, M, sh_dim);  weights: (B, N, M, weight_numel), pre-masked.
        Returns:
          list aligned with irreps_out of (B, N, fan_in, 2l+1) sums over M.
        """
        gathered = x.ndim == sh.ndim
        in_slices = self.irreps_in.slices()
        sh_slices = self.irreps_sh.slices()
        blocks: List[List[jnp.ndarray]] = [[] for _ in self.irreps_out.items]
        for p in self.paths:
            xb = x[..., in_slices[p.i_in]]
            xb = xb.reshape(xb.shape[:-1] + (p.mul_in, 2 * p.l_in + 1))
            shb = sh[..., sh_slices[p.i_sh]]
            wb = weights[..., p.w_slice[0]:p.w_slice[1]]
            cg = jnp.asarray(wigner_3j(p.l_in, p.l_sh, p.l_out), dtype=x.dtype)
            contrib = p.alpha * jnp.einsum(
                "bnmui,bnmj,ijk,bnmu->bnuk" if gathered
                else "bmui,bnmj,ijk,bnmu->bnuk", xb, shb, cg, wb,
                preferred_element_type=jnp.float32,
            )
            blocks[p.i_out].append(contrib)
        return [
            jnp.concatenate(parts, axis=-2) if parts else None for parts in blocks
        ]


@functools.lru_cache(maxsize=None)
def channelwise_tp(irreps_in: str, irreps_sh: str, irreps_out: str) -> ChannelwiseTP:
    """Build (and cache) the channel-wise path table."""
    irr_in, irr_sh, irr_out = parse(str(irreps_in)), parse(str(irreps_sh)), parse(str(irreps_out))
    raw_paths: List[List] = []
    fan_in = [0] * len(irr_out)
    for i, (mul_in, ir_in) in enumerate(irr_in):
        for j, (mul_sh, ir_sh) in enumerate(irr_sh):
            assert mul_sh == 1
            for k, (mul_out, ir_out) in enumerate(irr_out):
                if ir_out in ir_in * ir_sh:
                    raw_paths.append([i, j, k, mul_in, mul_out, ir_in.l, ir_sh.l, ir_out.l])
                    fan_in[k] += mul_in
    paths: List[_Path] = []
    offset = 0
    for i, j, k, mul_in, mul_out, l_in, l_sh, l_out in raw_paths:
        # component normalization only: the 1/sqrt(fan_in) factor lives in the
        # static mix's glorot initialization
        alpha = math.sqrt(2 * l_out + 1)
        paths.append(_Path(i, j, k, mul_in, mul_out, l_in, l_sh, l_out,
                           (offset, offset + mul_in), alpha))
        offset += mul_in
    mix_specs = tuple(
        (k, fan_in[k], mul_out) for k, (mul_out, _) in enumerate(irr_out.items)
    )
    return ChannelwiseTP(irr_in, irr_sh, irr_out, tuple(paths), offset, mix_specs)


@functools.lru_cache(maxsize=None)
def _full_tp_paths(irreps_1: str, irreps_2: str, filter_out: Tuple[str, ...] | None):
    """Path table for an unweighted FullTensorProduct (e3nn o3.FullTensorProduct).

    Used for the torsion head's SH (x) bond-SH channel
    (score_model_phore.py:276,366).  ``filter_out`` restricts the produced
    output irreps - the downstream conv only consumes l <= 1, so we never
    materialize the l=3,4 components the reference computes and discards.
    """
    irr1, irr2 = parse(str(irreps_1)), parse(str(irreps_2))
    keep = None if filter_out is None else {repr(Irreps.parse(s).items[0][1]) for s in filter_out}
    paths = []
    out_items: List[Tuple[int, Irrep]] = []
    for i, (mul1, ir1) in enumerate(irr1):
        for j, (mul2, ir2) in enumerate(irr2):
            for ir3 in ir1 * ir2:
                if keep is not None and repr(ir3) not in keep:
                    continue
                k = len(out_items)
                out_items.append((mul1 * mul2, ir3))
                paths.append((i, j, k, ir1.l, ir2.l, ir3.l))
    return irr1, irr2, Irreps(tuple(out_items)), tuple(paths)


def full_tensor_product(
    x: jnp.ndarray,
    y: jnp.ndarray,
    irreps_1: str,
    irreps_2: str,
    filter_out: Tuple[str, ...] | None = None,
) -> Tuple[jnp.ndarray, Irreps]:
    """Unweighted tensor product of two multiplicity-1 irreps features."""
    irr1, irr2, irr_out, paths = _full_tp_paths(str(irreps_1), str(irreps_2), filter_out)
    s1, s2 = irr1.slices(), irr2.slices()
    parts = []
    for i, j, k, l1, l2, l3 in paths:
        cg = jnp.asarray(wigner_3j(l1, l2, l3), dtype=x.dtype)
        xb, yb = x[..., s1[i]], y[..., s2[j]]
        parts.append(math.sqrt(2 * l3 + 1) * jnp.einsum("...i,...j,ijk->...k", xb, yb, cg))
    return jnp.concatenate(parts, axis=-1), irr_out
