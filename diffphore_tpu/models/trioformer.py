"""Trioformer: AlphaFold-style pair-biased cross attention between the ligand
and pharmacophore node sets (reference src/models/e3phore.py).

Consumed by the encoder when ``use_att=True`` (off in the shipped best
config, model_parameters.yml:139, but part of the model family): node sets
attend to each other with a pair-embedding bias, the pair embedding updates
by outer products and geometry-aware row attention over intra-set distance
matrices.  Also provides the standalone (experimental) E3Phore model, kept
with the same no-op CoordRefine head as the reference (e3phore.py:200-206).

All sets are dense padded arrays with masks - the natural TPU layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


class MHAWithPairBias(nn.Module):
    """Cross attention q<-set1, k/v<-set2 with a per-head pair bias."""

    inp_dim: int = 16
    c: int = 32
    num_heads: int = 4
    bias: bool = True

    @nn.compact
    def __call__(self, q, k, v, mask=None, bias=None):
        H, C = self.num_heads, self.c
        B, Q, _ = q.shape
        qh = nn.Dense(H * C, use_bias=False, name="linear_q")(q).reshape(B, Q, H, C)
        kh = nn.Dense(H * C, use_bias=False, name="linear_k")(k).reshape(B, -1, H, C)
        vh = nn.Dense(H * C, use_bias=False, name="linear_v")(v).reshape(B, -1, H, C)
        logits = jnp.einsum("bqhc,bkhc->bhqk", qh, kh) * (H ** -0.5)
        if mask is not None:  # (B, Q, K) valid-pair mask
            logits = jnp.where(mask[:, None, :, :], logits, -1e9)
        if bias is not None and self.bias:
            b = nn.Dense(H, use_bias=False, name="linear_b")(bias)  # (B,Q,K,H)
            logits = logits + jnp.transpose(b, (0, 3, 1, 2))
        w = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", w, vh).reshape(B, Q, H * C)
        out = nn.Dense(self.inp_dim, name="final_linear")(out)
        return nn.LayerNorm(name="layernorm")(out)


class OuterProductModule(nn.Module):
    """Pair embedding from node outer products (e3phore.py:83-96)."""

    c: int = 16
    out_dim: int = 32
    bias: bool = False

    @nn.compact
    def __call__(self, h_l, h_p):
        a = nn.Dense(self.c, use_bias=self.bias, name="linear_l")(
            nn.LayerNorm(name="layernorm_l")(h_l))
        b = nn.Dense(self.c, use_bias=self.bias, name="linear_p")(
            nn.LayerNorm(name="layernorm_p")(h_p))
        z = jnp.mean(a[:, :, None, :] * b[:, None, :, :], axis=-1, keepdims=True)
        return nn.Dense(self.out_dim, name="linear_final")(z)


class GeometryConstraintUpdate(nn.Module):
    """Row attention over the pair embedding with a distance bias
    (e3phore.py:99-145)."""

    inp_dim: int
    c: int = 32
    num_heads: int = 8

    @nn.compact
    def __call__(self, z_ij, d_jk, mask_z=None):
        H, C = self.num_heads, self.c
        B, I, J, _ = z_ij.shape
        z = nn.LayerNorm(name="layernorm")(z_ij)
        q = nn.Dense(H * C, use_bias=False, name="linear_q")(z).reshape(B, I, J, H, C) * (H ** -0.5)
        k = nn.Dense(H * C, use_bias=False, name="linear_k")(z).reshape(B, I, J, H, C)
        v = nn.Dense(H * C, use_bias=False, name="linear_v")(z).reshape(B, I, J, H, C)
        b = nn.Dense(H, use_bias=False, name="linear_b")(z)         # (B,I,J,H)
        b = jnp.transpose(b, (0, 1, 3, 2))[..., None]               # (B,I,H,J,1)
        d = nn.Dense(H, use_bias=False, name="linear_d")(d_jk)      # (B,J,J,H)
        d = jnp.transpose(d, (0, 3, 1, 2))[:, None]                 # (B,1,H,J,J)
        logits = jnp.einsum("biqhc,bikhc->bihqk", q, k) + b + d
        if mask_z is not None:  # (B, I, J)
            logits = jnp.where(mask_z[:, :, None, None, :], logits, -1e9)
        w = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bihqk,bikhc->biqhc", w, v)
        g = nn.sigmoid(nn.Dense(H * C, name="g")(z).reshape(B, I, J, H, C))
        out = (g * out).reshape(B, I, J, H * C)
        out = nn.Dense(self.inp_dim, name="final_linear")(out)
        if mask_z is not None:
            out = out * mask_z[..., None]
        return out


class Trioformer(nn.Module):
    """One block: node cross-attention + transitions + OPM + geometry update
    (e3phore.py:148-197)."""

    inp_dim: int = 16
    c: int = 32
    num_heads: int = 4
    bias: bool = True
    c_opm: int = 8
    gatt_head: int = 8
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h_l, h_p, z_ij, d_ik, d_jk, mask_l=None, mask_p=None,
                 deterministic: bool = True):
        mask_z = None
        if mask_l is not None and mask_p is not None:
            mask_z = mask_l[:, :, None] & mask_p[:, None, :]
        h_l = h_l + MHAWithPairBias(self.inp_dim, self.c, self.num_heads,
                                    self.bias, name="mha_l")(
            h_l, h_p, h_p, mask_z, z_ij)
        h_p = h_p + MHAWithPairBias(self.inp_dim, self.c, self.num_heads,
                                    self.bias, name="mha_p")(
            h_p, h_l, h_l,
            None if mask_z is None else jnp.swapaxes(mask_z, 1, 2),
            jnp.swapaxes(z_ij, 1, 2))

        def transition(name, x):
            h = nn.Dense(self.inp_dim * 2, use_bias=False, name=f"{name}_1")(x)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            return nn.Dense(self.inp_dim, use_bias=False, name=f"{name}_2")(h)

        h_l = h_l + transition("transition_l", h_l)
        h_p = h_p + transition("transition_p", h_p)

        z_ij = z_ij + OuterProductModule(self.c_opm, self.inp_dim, name="opm")(h_l, h_p)
        upd_l = GeometryConstraintUpdate(self.inp_dim, self.c, self.gatt_head, name="gapu_l")(
            jnp.swapaxes(z_ij, 1, 2), d_ik[..., None],
            None if mask_z is None else jnp.swapaxes(mask_z, 1, 2))
        upd_p = GeometryConstraintUpdate(self.inp_dim, self.c, self.gatt_head, name="gapu_p")(
            z_ij, d_jk[..., None], mask_z)
        z_ij = z_ij + jnp.swapaxes(upd_l, 1, 2) + upd_p
        return h_l, h_p, z_ij


class GeometricAttention(nn.Module):
    """The encoder's use_att branch (score_model_phore.py:938-975): project
    node features, run Trioformer block(s), return updated nodes + pair
    embedding z_ij for cross-edge conditioning."""

    ns: int
    trioformer_layers: int = 1

    @nn.compact
    def __call__(self, lig_feat, phore_feat, lig_pos, phore_pos, lig_mask,
                 phore_mask, deterministic: bool = True):
        h_l = nn.Dense(self.ns, use_bias=False, name="linear_att_l")(lig_feat)
        h_p = nn.Dense(self.ns, use_bias=False, name="linear_att_p")(phore_feat)
        d_ik = jnp.linalg.norm(
            lig_pos[:, :, None, :] - lig_pos[:, None, :, :], axis=-1
        ) * (lig_mask[:, :, None] & lig_mask[:, None, :])
        d_jk = jnp.linalg.norm(
            phore_pos[:, :, None, :] - phore_pos[:, None, :, :], axis=-1
        ) * (phore_mask[:, :, None] & phore_mask[:, None, :])
        z_ij = OuterProductModule(self.ns // 2, self.ns, name="OPM")(h_l, h_p)
        for i in range(self.trioformer_layers):
            h_l, h_p, z_ij = Trioformer(
                self.ns, self.ns * 2, 4, True, self.ns // 2, 8,
                name=f"trioformer_{i}")(
                h_l, h_p, z_ij, d_ik, d_jk, lig_mask, phore_mask,
                deterministic=deterministic)
        return h_l, h_p, z_ij


class E3Phore(nn.Module):
    """Standalone Trioformer model (experimental in the reference,
    e3phore.py:226-241; CoordRefine is a documented no-op there too)."""

    hidden_dim: int = 16
    n_blocks: int = 8

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        from ..chem.features import LIG_FEATURE_DIMS
        from ..data.phore import PHORE_FEATURE_DIMS
        from .layers import CategoricalEncoder

        h_l = CategoricalEncoder(self.hidden_dim, LIG_FEATURE_DIMS,
                                 name="lig_node_embedding")(batch.lig_feat)
        h_p = CategoricalEncoder(self.hidden_dim, PHORE_FEATURE_DIMS[0],
                                 num_scalars=2, name="phore_node_embedding")(
            batch.phore_x[..., :3].astype(jnp.int32), batch.phore_x[..., 3:])
        att = GeometricAttention(self.hidden_dim, self.n_blocks, name="att")
        h_l, h_p, z_ij = att(h_l, h_p, batch.lig_pos, batch.phore_pos,
                             batch.lig_mask, batch.phore_mask, deterministic)
        # CoordRefine: identity (parity with the reference's stub)
        return h_l, h_p, z_ij


class TankPhore(nn.Module):
    """TANKBind-style model for ``model_type='tank'``: Trioformer trunk +
    distance-map and affinity heads.

    The reference declares the mode (parsing.py:39, loss_function_tank /
    train_tank_epoch in utils/training.py:150-166,557-589 expect
    ``model(data) -> (y_pred, affinity_pred)``) but its E3Phore forward is a
    stub (e3phore.py:236-241 calls CoordRefine, a no-op); this is the working
    TPU realization.  ``y_pred`` is the raw per-pair head output - cross
    distances under the MSE loss (pred_dis=True) or contact logits under the
    BCE loss - and ``affinity_pred`` pools the pair embedding per graph.
    Predicted distance maps feed ops/coord_recovery.recover_coords for pose
    generation.
    """

    hidden_dim: int = 16
    n_blocks: int = 8

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        h_l, h_p, z_ij = E3Phore(self.hidden_dim, self.n_blocks,
                                 name="trunk")(batch, deterministic)
        pair_mask = (batch.lig_mask[:, :, None]
                     & batch.phore_mask[:, None, :]).astype(z_ij.dtype)

        d = nn.Dense(self.hidden_dim, name="dis_head_1")(z_ij)
        d = nn.relu(d)
        y_pred = nn.Dense(1, name="dis_head_2")(d)[..., 0]          # (B, A, P)

        pooled = (z_ij * pair_mask[..., None]).sum((1, 2)) / jnp.maximum(
            pair_mask.sum((1, 2)), 1.0)[:, None]
        a = nn.Dense(self.hidden_dim, name="aff_head_1")(pooled)
        a = nn.relu(a)
        affinity_pred = nn.Dense(1, name="aff_head_2")(a)[..., 0]   # (B,)
        return y_pred, affinity_pred
