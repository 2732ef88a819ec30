"""Shared model layers: Gaussian smearing, categorical encoders, equivariant
batch norm, and the dense-edge tensor-product convolution.

Design notes vs the reference (score_model_phore.py):
  * Graphs are dense masked grids, so "scatter-mean over incoming edges"
    becomes a masked mean over the sender axis - no torch_scatter analogue.
  * The TP conv evaluates the edge-MLP -> weighted tensor product -> masked
    mean as one fused XLA region; edges that are masked contribute zero
    weight and zero count.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.irreps import parse
from ..ops.tensor_product import channelwise_tp, fully_connected_tp


class SplitEdgeAttr(NamedTuple):
    """Edge attributes as unconcatenated parts.

    The encoder's edge features are ``concat([pair_attr, recv_scalars,
    send_scalars])`` where the scalar parts are node-level tensors broadcast
    over the (N, M) grid - materializing that concat (and the broadcasts)
    costs 3x the pair tensor's HBM traffic per conv per layer.  Since the
    edge MLP's first layer is linear, ``concat(parts) @ W1`` splits into
    per-part matmuls against row slices of W1, with the node-level products
    computed at node rank and broadcast-added into the (cheap, fused)
    ReLU - the wide edge-level concat never exists.  Parameter shapes and
    slice order match the concatenated form exactly, so checkpoints are
    unaffected.

    Measured on TPU v5e (sQC complex, 20-step sampler, run-to-run noise
    ~+-5%): XLA-counted bytes drop 11.1->10.6 GB per 40-pose forward and
    the split form is reliably ~5% faster at screen-size dispatches
    (>=96 rows: 233 vs 222 poses/s at 192 rows); at <=64 rows the two
    forms are at parity within noise.

    ``axes`` tags each part: 'e' edge-level (..., N, M, E_i), 'r'
    receiver-level (..., N, E_i), 's' sender-level (..., M, E_i) - or
    already-gathered per-receiver senders (..., N, M, E_i), distinguished
    by rank.
    """

    parts: Tuple[jnp.ndarray, ...]
    axes: Tuple[str, ...]

    @property
    def num_features(self) -> int:
        return sum(p.shape[-1] for p in self.parts)

    def edge_ndim(self) -> int:
        for p, ax in zip(self.parts, self.axes):
            if ax == "e":
                return p.ndim
        raise ValueError("SplitEdgeAttr needs at least one edge-level part")

    def matmul(self, w1: jnp.ndarray, b1: jnp.ndarray) -> jnp.ndarray:
        """concat(parts) @ w1 + b1 without materializing the concat."""
        nd = self.edge_ndim()
        out = b1
        off = 0
        for p, ax in zip(self.parts, self.axes):
            t = p.astype(w1.dtype) @ w1[off : off + p.shape[-1]]
            off += p.shape[-1]
            if ax == "r":
                t = t[..., :, None, :]
            elif ax == "s" and t.ndim + 1 == nd:
                t = t[..., None, :, :]
            out = out + t
        return out

    def dense(self) -> jnp.ndarray:
        """Materialized concatenated form (fallback for paths that need it)."""
        nd = self.edge_ndim()
        grid = next(p for p, ax in zip(self.parts, self.axes) if ax == "e")
        N, M = grid.shape[-3], grid.shape[-2]
        outs = []
        for p, ax in zip(self.parts, self.axes):
            if ax == "r":
                p = jnp.broadcast_to(p[..., :, None, :], p.shape[:-1] + (M, p.shape[-1]))
            elif ax == "s" and p.ndim + 1 == nd:
                p = jnp.broadcast_to(p[..., None, :, :], p.shape[:-2] + (N, M, p.shape[-1]))
            outs.append(p)
        return jnp.concatenate(outs, axis=-1)


class GaussianSmearing(nn.Module):
    """Distance -> RBF embedding (reference GaussianSmearing :978-1015)."""

    start: float = 0.0
    stop: float = 5.0
    num_gaussians: int = 50

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        offset = jnp.linspace(self.start, self.stop, self.num_gaussians)
        coeff = -0.5 / (offset[1] - offset[0]) ** 2
        d = dist[..., None] - offset
        return jnp.exp(coeff * d * d)


class MLP(nn.Module):
    """Linear-ReLU-Dropout-Linear block used throughout the reference.

    ``dtype`` selects the computation precision (params stay float32);
    bfloat16 here drives the MXU and halves HBM traffic on the hot edge-MLP
    tensors.
    """

    hidden: int
    out: int
    dropout: float = 0.0
    activation: Callable = nn.relu
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden, use_bias=self.use_bias, dtype=self.dtype)(x)
        x = self.activation(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.out, use_bias=self.use_bias, dtype=self.dtype)(x)


class CategoricalEncoder(nn.Module):
    """Sum of per-column embeddings + linear on trailing scalars
    (reference AtomEncoder :23-73)."""

    emb_dim: int
    feature_dims: Sequence[int]
    num_scalars: int = 0

    @nn.compact
    def __call__(self, cat: jnp.ndarray, scalars: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        out = 0.0
        for k, vocab in enumerate(self.feature_dims):
            emb = nn.Embed(vocab, self.emb_dim, embedding_init=nn.initializers.glorot_uniform())
            out = out + emb(cat[..., k])
        if self.num_scalars:
            assert scalars is not None and scalars.shape[-1] == self.num_scalars
            out = out + nn.Dense(self.emb_dim)(scalars)
        return out


class EquivariantBatchNorm(nn.Module):
    """Irreps-aware batch normalization (e3nn BatchNorm semantics,
    normalization='component', reduce='mean'): scalars get mean/var
    normalization with affine scale+bias; higher-l fields are normalized by
    the running mean of their per-field component power with affine scale.

    Statistics are masked: padded nodes don't contribute.
    """

    irreps: str
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray, use_running_average: bool = True
    ) -> jnp.ndarray:
        irr = parse(self.irreps)
        n_blocks = len(irr)
        num_scalar_ch = sum(mul for mul, ir in irr if ir.l == 0)
        num_ch = sum(mul for mul, ir in irr)

        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(num_scalar_ch))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(num_ch))
        weight = self.param("weight", nn.initializers.ones, (num_ch,))
        bias = self.param("bias", nn.initializers.zeros, (num_scalar_ch,))

        m = mask.astype(x.dtype)
        denom = jnp.maximum(m.sum(), 1.0)

        outs = []
        new_means, new_vars = [], []
        ch_off, sc_off = 0, 0
        for (mul, ir), sl in zip(irr, irr.slices()):
            field = x[..., sl]
            field = field.reshape(field.shape[:-1] + (mul, ir.dim))
            w = weight[ch_off:ch_off + mul]
            if ir.l == 0:
                batch_mean = (field[..., 0] * m[..., None]).sum(
                    axis=tuple(range(m.ndim))
                ) / denom
                if use_running_average:
                    mean = ra_mean.value[sc_off:sc_off + mul]
                else:
                    mean = batch_mean
                    new_means.append(batch_mean)
                centered = field[..., 0] - mean
                batch_var = ((centered**2) * m[..., None]).sum(
                    axis=tuple(range(m.ndim))
                ) / denom
                if use_running_average:
                    var = ra_var.value[ch_off:ch_off + mul]
                else:
                    var = batch_var
                    new_vars.append(batch_var)
                out = centered * jax.lax.rsqrt(var + self.eps) * w + bias[sc_off:sc_off + mul]
                outs.append(out[..., None])
                sc_off += mul
            else:
                power = (field**2).mean(axis=-1)  # component power per field
                batch_var = (power * m[..., None]).sum(axis=tuple(range(m.ndim))) / denom
                if use_running_average:
                    var = ra_var.value[ch_off:ch_off + mul]
                else:
                    var = batch_var
                    new_vars.append(batch_var)
                out = field * (jax.lax.rsqrt(var + self.eps) * w)[..., None]
                outs.append(out)
            ch_off += mul
        if not use_running_average and not self.is_initializing():
            if new_means:
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * jnp.concatenate(new_means)
            ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * jnp.concatenate(new_vars)
        flat = [o.reshape(o.shape[:-2] + (-1,)) for o in outs]
        return jnp.concatenate(flat, axis=-1)


class DenseTPConv(nn.Module):
    """Tensor-product message passing over a dense (receiver, sender) grid.

    Equivalent of the reference TensorProductConvLayer (:76-149) with the
    scatter replaced by a masked mean.  Multiple edge channels (e.g. bond
    edges + radius edges between the same atom pair, which the reference
    concatenates as separate edge-list entries) are supported by calling with
    an extra leading channel axis on edge_attr/edge_sh/edge_mask.
    """

    in_irreps: str
    out_irreps: str
    sh_irreps: str = "1x0e + 1x1o + 1x2e"
    n_edge_features: int = 48
    hidden_features: Optional[int] = None
    residual: bool = False
    batch_norm: bool = True
    dropout: float = 0.0
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" for the hot path
    #: "fully_connected" = reference e3nn parameterization (uvw weights per
    #: edge); "channelwise" = uvu weights per edge + static per-irrep mix -
    #: same function class, ~20x smaller per-edge weight tensors (the TPU
    #: fast path; see ops.tensor_product.ChannelwiseTP)
    tp_mode: str = "fully_connected"
    #: use the fused edge-MLP + TP-aggregate pallas kernel for deterministic
    #: channelwise calls on TPU (ops/pallas/tp_fused.py)
    use_pallas_fused: bool = False

    @nn.compact
    def __call__(
        self,
        sender_feat: jnp.ndarray,   # (..., M, dim_in) features of senders
        edge_attr: jnp.ndarray,     # (..., N, M, ne) or list of C channels
        edge_sh: jnp.ndarray,       # (..., N, M, sh_dim), shared by channels
        edge_mask: jnp.ndarray,     # (..., N, M) bool or list of C channels
        receiver_feat: Optional[jnp.ndarray] = None,  # (..., N, dim) residual
        receiver_mask: Optional[jnp.ndarray] = None,  # (..., N) for batchnorm
        deterministic: bool = True,
        use_running_average: bool = True,
    ) -> jnp.ndarray:
        """Multiple edge channels between the same (receiver, sender) pairs -
        the reference's concatenated bond + radius ligand edge lists - share
        the geometric sh but have distinct attrs/masks; pass lists for
        edge_attr/edge_mask.  The TP is linear in the edge weights, so the
        channels are fused into a single contraction; the masked mean counts
        every channel edge like the reference's scatter-mean.

        ``sender_feat`` may alternatively carry per-receiver gathered
        senders, shape (..., N, M, dim_in) - i.e. the same rank as
        ``edge_sh`` - for KNN-compacted grids where sender M indexes each
        receiver's own neighbor list rather than a global node set."""
        channelwise = self.tp_mode == "channelwise"
        gathered = sender_feat.ndim == edge_sh.ndim
        tp = (channelwise_tp if channelwise else fully_connected_tp)(
            self.in_irreps, self.sh_irreps, self.out_irreps)
        hidden = self.hidden_features or self.n_edge_features
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None

        if isinstance(edge_attr, SplitEdgeAttr) or not isinstance(edge_attr, (list, tuple)):
            attrs = [edge_attr]
        else:
            attrs = edge_attr
        masks = edge_mask if isinstance(edge_mask, (list, tuple)) else [edge_mask]
        counts = 0.0
        for m in masks:
            counts = counts + m.sum(axis=-1)  # (..., N)
        denom = jnp.maximum(counts, 1.0)

        if channelwise:
            # explicit edge-MLP params: the SAME tensors drive the XLA path
            # and the fused pallas kernel (which computes the MLP in VMEM)
            a0 = attrs[0]
            E = a0.num_features if isinstance(a0, SplitEdgeAttr) else a0.shape[-1]
            w1 = self.param("fc_w1", nn.initializers.lecun_normal(), (E, hidden))
            b1 = self.param("fc_b1", nn.initializers.zeros, (hidden,))
            w2 = self.param("fc_w2", nn.initializers.lecun_normal(),
                            (hidden, tp.weight_numel))
            b2 = self.param("fc_b2", nn.initializers.zeros, (tp.weight_numel,))
            cd = cdt or jnp.float32

            use_fused = (
                self.use_pallas_fused
                and not gathered  # kernel expects a global sender set
                and deterministic  # kernel has no dropout / custom VJP
                and jax.default_backend() == "tpu"
                and all(ir.l <= 1 for _, ir in tp.irreps_out.items)
                and all(ir.l <= 1 for _, ir in tp.irreps_in.items)
            )
            if use_fused:
                from ..ops.pallas.tp_aggregate import blocks_from_padded
                from ..ops.pallas.tp_fused import tp_aggregate_fused

                padded = tp_aggregate_fused(
                    tp, sender_feat.astype(jnp.float32),
                    edge_sh.astype(jnp.float32),
                    tuple(
                        (a.dense() if isinstance(a, SplitEdgeAttr) else a)
                        .astype(jnp.float32) for a in attrs),
                    tuple(masks), w1, b1, w2, b2,
                )
                blocks = blocks_from_padded(tp, padded)
                w = padded  # only .shape[:-3] and dtype are consumed below
            else:
                w = 0.0
                drop = nn.Dropout(self.dropout, deterministic=deterministic)
                for attr, m in zip(attrs, masks):
                    if isinstance(attr, SplitEdgeAttr):
                        pre = attr.matmul(w1.astype(cd), b1.astype(cd))
                    else:
                        pre = attr.astype(cd) @ w1.astype(cd) + b1.astype(cd)
                    h = drop(nn.relu(pre))
                    wc = h @ w2.astype(cd) + b2.astype(cd)
                    w = w + wc * m[..., None]
                # one einsum per path with the sender-sum folded in: never
                # materializes per-edge contributions or a broadcast of x
                # over receivers (those relayout copies dominated the
                # profile)
                blocks = tp.aggregate(
                    sender_feat.astype(w.dtype), edge_sh.astype(w.dtype), w)
        else:
            fc = MLP(hidden, tp.weight_numel, self.dropout, dtype=cdt, name="fc")
            w = 0.0
            for attr, m in zip(attrs, masks):
                if isinstance(attr, SplitEdgeAttr):
                    attr = attr.dense()
                w = w + fc(attr, deterministic=deterministic) * m[..., None]
            if gathered:
                x = sender_feat  # already (..., N, M, dim)
            else:
                x = sender_feat[..., None, :, :]  # (..., 1, M, dim) over receivers
            if cdt is not None:
                x = x.astype(cdt)
                edge_sh = edge_sh.astype(cdt)
        if channelwise:
            parts = []
            for (k, fan_in, mul_out), block in zip(tp.mix_specs, blocks):
                mul, ir = tp.irreps_out.items[k]
                if block is None:
                    parts.append(jnp.zeros(
                        w.shape[:-3] + (w.shape[-3], mul * ir.dim), jnp.float32))
                    continue
                agg = block.astype(jnp.float32) / denom[..., None, None]
                mix = self.param(f"mix_{k}", nn.initializers.glorot_uniform(),
                                 (fan_in, mul_out))
                mixed = jnp.einsum("...fd,fv->...vd", agg, mix)
                parts.append(mixed.reshape(mixed.shape[:-2] + (mul * ir.dim,)))
            out = jnp.concatenate(parts, axis=-1)
        else:
            msg = tp(jnp.broadcast_to(x, w.shape[:-1] + (x.shape[-1],)), edge_sh, w)
            msg = msg.astype(jnp.float32)
            out = msg.sum(axis=-2) / denom[..., None]

        if self.residual and receiver_feat is not None:
            pad = out.shape[-1] - receiver_feat.shape[-1]
            out = out + jnp.pad(receiver_feat, [(0, 0)] * (out.ndim - 1) + [(0, pad)])
        if self.batch_norm:
            if receiver_mask is None:
                receiver_mask = jnp.ones(out.shape[:-1], bool)
            out = EquivariantBatchNorm(self.out_irreps, name="bn")(
                out, receiver_mask, use_running_average=use_running_average
            )
        return out
