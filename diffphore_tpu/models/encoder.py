"""Knowledge-guided ligand-pharmacophore ("LMP") encoder.

Dense-grid re-design of the reference LigPhoreEncoder
(score_model_phore.py:440-975): ligand graph (bond + radius channels over a
dense (A, A) grid), phore graph (dataset topology over (P, P)), and the
knowledge-guided bipartite cross graph as a dense (A, P) grid carrying
pharmacophore-type agreement weighting, learned direction flips, per-atom
softmax weights and the norm-angle alignment channel.

All masking happens through the grids; there are no edge lists, sorts or
scatters (reference fully_connect_two_graphs/my_sort_edge_index become
identity by construction).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..chem.features import LIG_FEATURE_DIMS
from ..data.phore import NUM_PHORETYPE, PHORE_FEATURE_DIMS
from ..ops.geometry import angle_between
from ..ops.sh import spherical_harmonics_lmax2
from .layers import CategoricalEncoder, DenseTPConv, GaussianSmearing, MLP, SplitEdgeAttr


def _irrep_seq(ns: int, nv: int, second_order: bool):
    if second_order:
        return [
            f"{ns}x0e",
            f"{ns}x0e + {nv}x1o + {nv}x2e",
            f"{ns}x0e + {nv}x1o + {nv}x2e + {nv}x1e + {nv}x2o",
            f"{ns}x0e + {nv}x1o + {nv}x2e + {nv}x1e + {nv}x2o + {ns}x0o",
        ]
    return [
        f"{ns}x0e",
        f"{ns}x0e + {nv}x1o",
        f"{ns}x0e + {nv}x1o + {nv}x1e",
        f"{ns}x0e + {nv}x1o + {nv}x1e + {ns}x0o",
    ]


class LigPhoreEncoder(nn.Module):
    """Produces per-atom and per-phore-point equivariant features."""

    ns: int = 20
    nv: int = 10
    num_conv_layers: int = 4
    sigma_embed_dim: int = 20
    distance_embed_dim: int = 20
    cross_distance_embed_dim: int = 20
    lig_max_radius: float = 5.0
    phore_max_radius: float = 5.0
    cross_max_distance: float = 25.0
    in_lig_edge_features: int = 4
    use_second_order_repr: bool = False
    batch_norm: bool = True
    dropout: float = 0.0
    # knowledge-guidance knobs (shipped best config values as defaults)
    consider_norm: bool = True
    angle_match: bool = True
    phoretype_match: bool = True
    use_phore_match_feat: bool = True
    cross_distance_transition: bool = True
    phore_direction_transition: bool = True
    phoretype_match_transition: bool = True
    atom_weight: str = "phore"
    scaler: float = 100.0
    multiple: bool = True
    boarder: bool = True
    clash_cutoff: Tuple[float, ...] = (1.0, 2.0, 3.0, 4.0, 5.0)
    by_radius: bool = False
    clash_tolerance: float = 0.4
    auto_phorefp: bool = False
    use_att: bool = False
    trioformer_layer: int = 1
    compute_dtype: str = "float32"
    tp_mode: str = "fully_connected"
    use_pallas_fused: bool = False
    # compact the (P, P) phore-phore grid to K nearest masked neighbors per
    # receiver (see ScoreModelConfig.phore_knn); 0 = dense
    phore_knn: int = 0

    @property
    def irrep_seq(self):
        return _irrep_seq(self.ns, self.nv, self.use_second_order_repr)

    @property
    def out_irreps(self) -> str:
        seq = self.irrep_seq
        return seq[min(self.num_conv_layers, len(seq) - 1)]

    @nn.compact
    def __call__(self, batch, sigma_emb, deterministic=True, use_running_average=True,
                 pose_group: int = 1):
        """Args:
          batch: ComplexBatch.
          sigma_emb: (B, sigma_embed_dim) per-graph diffusion-time embedding.
          pose_group: static pose-factoring hint for screen dispatches whose
            rows are ``pose_group`` poses of each complex, complex-major
            (FitEngine.run_complexes packing).  Phore-side tensors - the
            phore node/edge embeddings, edge SH, and the ENTIRE layer-0
            phore-phore conv - depend only on (phore, sigma), which is
            identical across the poses of one complex at a shared diffusion
            time, so they are computed once per complex (B/pose_group rows)
            and broadcast back (VERDICT r3 item 5; the (B, P, P, .)
            phore-edge tensors are the top HBM buffers at screen shapes,
            analysis/HBM_FLOOR.md).  Exact - not an approximation.  Ignored
            (=1) in training mode, when B is not divisible, or with
            use_att/phore_knn (those paths break the invariance/indexing).
        Returns:
          (lig_node_attr (B, A, D_out), phore_node_attr (B, P, D_phore)).
        """
        ns = self.ns
        B, A = batch.lig_pos.shape[:2]
        P = batch.phore_pos.shape[1]
        lig_mask = batch.lig_mask
        phore_mask = batch.phore_mask
        pg = int(pose_group) if pose_group else 1
        if pg > 1 and (B % pg or not use_running_average or self.use_att
                       or self.phore_knn):
            pg = 1
        rep = slice(None, None, pg)  # representative row of each pose group
        rep_b = (lambda x: jnp.repeat(x, pg, axis=0)) if pg > 1 else (lambda x: x)

        lig_dist_exp = GaussianSmearing(0.0, self.lig_max_radius, self.distance_embed_dim, name="lig_distance_expansion")
        phore_dist_exp = GaussianSmearing(0.0, self.phore_max_radius, self.distance_embed_dim, name="phore_distance_expansion")
        cross_dist_exp = GaussianSmearing(0.0, self.cross_max_distance, self.cross_distance_embed_dim, name="cross_distance_expansion")

        node_sigma = jnp.broadcast_to(sigma_emb[:, None, :], (B, A, sigma_emb.shape[-1]))
        phore_sigma = jnp.broadcast_to(sigma_emb[:, None, :], (B, P, sigma_emb.shape[-1]))

        # ---------------- ligand node embedding (+ exclusion-volume clashes)
        lig_node_attr = CategoricalEncoder(
            ns, LIG_FEATURE_DIMS, num_scalars=self.sigma_embed_dim, name="lig_node_embedding"
        )(batch.lig_feat, node_sigma)
        if self.boarder:
            lig_node_attr = lig_node_attr + self._boarder_embedding(batch)

        # ---------------- ligand intra graph: bond + radius channels on (A, A)
        lig_vec = batch.lig_pos[:, None, :, :] - batch.lig_pos[:, :, None, :]  # recv a, send a'
        lig_d = jnp.linalg.norm(lig_vec, axis=-1)
        eye = jnp.eye(A, dtype=bool)
        pair_valid = lig_mask[:, :, None] & lig_mask[:, None, :] & ~eye
        radius_mask = pair_valid & (lig_d < self.lig_max_radius)
        bond_mask = batch.bond_mask & pair_valid
        d_emb = lig_dist_exp(lig_d)
        sig_e = jnp.broadcast_to(node_sigma[:, :, None, :], (B, A, A, self.sigma_embed_dim))
        attr_bond = jnp.concatenate([batch.bond_attr, sig_e, d_emb], -1)
        attr_rad = jnp.concatenate([jnp.zeros_like(batch.bond_attr), sig_e, d_emb], -1)
        lig_edge_emb = MLP(ns, ns, self.dropout, name="lig_edge_embedding")
        lig_edge_attr = [
            lig_edge_emb(attr_bond, deterministic=deterministic),
            lig_edge_emb(attr_rad, deterministic=deterministic),
        ]
        lig_edge_sh = spherical_harmonics_lmax2(lig_vec)

        # ---------------- phore graph (computed on the C = B/pg
        # representative rows; pg == 1 makes every slice/broadcast identity)
        C = B // pg
        phore_cat = batch.phore_x[rep, :, :3].astype(jnp.int32)
        phore_sigma_c = phore_sigma[rep]
        phore_mask_c = phore_mask[rep]
        phore_node_attr_c = CategoricalEncoder(
            ns, PHORE_FEATURE_DIMS[0], num_scalars=2 + self.sigma_embed_dim,
            name="phore_node_embedding",
        )(phore_cat, jnp.concatenate([batch.phore_x[rep, :, 3:], phore_sigma_c], -1))
        phore_pos_c = batch.phore_pos[rep]
        p_vec = phore_pos_c[:, None, :, :] - phore_pos_c[:, :, None, :]
        p_d = jnp.linalg.norm(p_vec, axis=-1)
        p_pair_mask_c = (batch.phore_edge_mask[rep]
                         & phore_mask_c[:, :, None] & phore_mask_c[:, None, :])
        # KNN compaction: the phore topology is sparse (reference
        # get_phore_graph radius rule for EX nodes), so gather each
        # receiver's K nearest masked senders and run every phore-phore
        # edge tensor on a (P, K) grid instead of (P, P).  The phore is
        # diffusion-invariant, so XLA hoists the top_k/gathers out of the
        # sampler's lax.scan.  Exact (same edge set) when K >= max
        # in-degree; otherwise the farthest neighbors drop first.
        phore_nbr = None
        if 0 < self.phore_knn < P:
            sel = jnp.where(p_pair_mask_c, p_d, jnp.inf)
            _, nbr = jax.lax.top_k(-sel, self.phore_knn)  # (B, P, K)
            bidx = jnp.arange(B)[:, None, None]
            phore_nbr = (bidx, nbr)
            p_pair_mask_c = jnp.take_along_axis(p_pair_mask_c, nbr, axis=2)
            p_vec = phore_pos_c[bidx, nbr] - phore_pos_c[:, :, None, :]
            p_d = jnp.take_along_axis(p_d, nbr, axis=2)
        M_p = p_d.shape[-1]  # P (dense) or K (compacted)
        p_attr = jnp.concatenate(
            [jnp.broadcast_to(phore_sigma_c[:, :, None, :], (C, P, M_p, self.sigma_embed_dim)),
             phore_dist_exp(p_d)], -1)
        phore_edge_attr_c = MLP(ns, ns, self.dropout, name="phore_edge_embedding")(
            p_attr, deterministic=deterministic)
        phore_edge_sh_c = spherical_harmonics_lmax2(p_vec)
        phore_node_attr = rep_b(phore_node_attr_c)
        phore_edge_attr = rep_b(phore_edge_attr_c)
        phore_edge_sh = rep_b(phore_edge_sh_c)
        p_pair_mask = rep_b(p_pair_mask_c)

        # ---------------- geometric attention (use_att branch,
        # score_model_phore.py:938-975): Trioformer-updated node features and
        # a pair embedding conditioning the cross edges
        z_ij = None
        if self.use_att:
            from .trioformer import GeometricAttention

            lig_node_attr, phore_node_attr, z_ij = GeometricAttention(
                ns, self.trioformer_layer, name="geometric_attention")(
                lig_node_attr, phore_node_attr, batch.lig_pos, batch.phore_pos,
                lig_mask, phore_mask, deterministic)

        # ---------------- knowledge-guided cross graph on (A, P)
        (cross_attr, cross_sh, cross_norm_sh, cross_mask) = self._cross_graph(
            batch, node_sigma, cross_dist_exp, deterministic, z_ij
        )

        # ---------------- message passing
        seq = self.irrep_seq
        conv = lambda name, i: DenseTPConv(
            in_irreps=seq[min(i, len(seq) - 1)],
            out_irreps=seq[min(i + 1, len(seq) - 1)],
            n_edge_features=3 * ns, hidden_features=3 * ns,
            batch_norm=self.batch_norm, dropout=self.dropout,
            compute_dtype=self.compute_dtype, tp_mode=self.tp_mode,
            use_pallas_fused=self.use_pallas_fused, name=f"{name}_{i}",
        )

        # Edge attrs ride as SplitEdgeAttr: the receiver/sender scalar
        # blocks stay node-level (part order matches the reference's
        # concat([edge_attr, recv_scalars, send_scalars]), so fc_w1 row
        # slices - and checkpoints - are unchanged).  Static per-trace
        # choice from the measured TPU crossover (SplitEdgeAttr docstring):
        # the split matmul wins on screen-size dispatches, one fused
        # concat+matmul wins on small single-complex ones.
        split_edges = B >= 96

        def edge_attr(parts, axes):
            a = SplitEdgeAttr(parts, axes)
            return a if split_edges else a.dense()

        for l in range(self.num_conv_layers):
            lig_sc = lig_node_attr[..., :ns]
            phore_sc = phore_node_attr[..., :ns]
            kw = dict(deterministic=deterministic, use_running_average=use_running_average)

            # ligand <- ligand
            lig_edge_attr_ = [
                edge_attr((e, lig_sc, lig_sc), ("e", "r", "s"))
                for e in lig_edge_attr
            ]
            lig_intra = conv("lig_conv", l)(
                lig_node_attr, lig_edge_attr_, lig_edge_sh,
                [bond_mask, radius_mask], receiver_mask=lig_mask, **kw)

            # ligand <- phore (and norm channel)
            cross_attr_ = edge_attr(
                (cross_attr, lig_sc, phore_sc), ("e", "r", "s"))
            lig_inter = conv("phore_to_lig_conv", l)(
                phore_node_attr, cross_attr_, cross_sh, cross_mask,
                receiver_mask=lig_mask, **kw)
            lig_inter_norm = 0.0
            if self.consider_norm:
                lig_inter_norm = conv("phore_to_lig_norm_conv", l)(
                    phore_node_attr, cross_attr_, cross_norm_sh, cross_mask,
                    receiver_mask=lig_mask, **kw)

            phore_intra = phore_inter = phore_inter_norm = 0.0
            if l != self.num_conv_layers - 1:
                if l == 0 and pg > 1:
                    # layer-0 phore conv is pose-invariant: before any cross
                    # message arrives, phore node attrs depend only on
                    # (phore, sigma) - run the whole (C, P, P) conv on the
                    # representative rows and broadcast the (C, P, D) result
                    phore_sc_c = phore_node_attr_c[..., :ns]
                    p_attr_c = edge_attr(
                        (phore_edge_attr_c, phore_sc_c, phore_sc_c),
                        ("e", "r", "s"))
                    phore_intra = rep_b(conv("phore_conv", l)(
                        phore_node_attr_c, p_attr_c, phore_edge_sh_c,
                        p_pair_mask_c, receiver_mask=phore_mask_c, **kw))
                else:
                    if phore_nbr is None:
                        send_sc = phore_sc
                        phore_sender = phore_node_attr
                    else:
                        bidx, nbr = phore_nbr
                        send_sc = phore_sc[bidx, nbr]        # (B, P, K, ns)
                        phore_sender = phore_node_attr[bidx, nbr]
                    p_attr_ = edge_attr(
                        (phore_edge_attr, phore_sc, send_sc), ("e", "r", "s"))
                    phore_intra = conv("phore_conv", l)(
                        phore_sender, p_attr_, phore_edge_sh, p_pair_mask,
                        receiver_mask=phore_mask, **kw)
                # phore <- ligand: transpose the cross grids (part order in
                # the transposed concat keeps lig_sc before phore_sc, so the
                # axis tags swap rather than the parts)
                cross_attr_T = edge_attr(
                    (jnp.swapaxes(cross_attr, 1, 2), lig_sc, phore_sc),
                    ("e", "s", "r"))
                phore_inter = conv("lig_to_phore_conv", l)(
                    lig_node_attr, cross_attr_T, jnp.swapaxes(cross_sh, 1, 2),
                    jnp.swapaxes(cross_mask, 1, 2), receiver_mask=phore_mask, **kw)
                if self.consider_norm:
                    phore_inter_norm = conv("lig_to_phore_norm_conv", l)(
                        lig_node_attr, cross_attr_T, jnp.swapaxes(cross_norm_sh, 1, 2),
                        jnp.swapaxes(cross_mask, 1, 2), receiver_mask=phore_mask, **kw)

            pad = lig_intra.shape[-1] - lig_node_attr.shape[-1]
            lig_node_attr = jnp.pad(lig_node_attr, ((0, 0), (0, 0), (0, pad)))
            lig_node_attr = lig_node_attr + lig_intra + lig_inter + lig_inter_norm
            if l != self.num_conv_layers - 1:
                pad = phore_intra.shape[-1] - phore_node_attr.shape[-1]
                phore_node_attr = jnp.pad(phore_node_attr, ((0, 0), (0, 0), (0, pad)))
                phore_node_attr = phore_node_attr + phore_intra + phore_inter + phore_inter_norm

        return lig_node_attr, phore_node_attr

    # ------------------------------------------------------------------ parts
    def _boarder_embedding(self, batch) -> jnp.ndarray:
        """Exclusion-volume clash features (reference boarder_analyze :898-935).

        Min distance from each atom to any EX sphere -> one-hot clash flags at
        the configured cutoffs + the distance itself.
        """
        ex_mask = (batch.phoretype[..., -1] == 1) & batch.phore_mask  # (B, P)
        d = jnp.linalg.norm(
            batch.lig_pos[:, :, None, :] - batch.phore_pos[:, None, :, :], axis=-1
        )
        big = 1e9
        d = jnp.where(ex_mask[:, None, :], d, big)
        dis_min = d.min(axis=-1)  # (B, A)
        # cap so the scalar linear layer stays sane when no EX exists
        dis_min = jnp.minimum(dis_min, 1e2)
        if self.by_radius:
            from ..chem.mol import vdw_radius

            import numpy as np

            radii = jnp.asarray([vdw_radius(z + 1) for z in range(119)], dtype=jnp.float32)
            r_atom = radii[batch.lig_feat[..., 0]]
            r_ex = (2.41798725037 / 0.837) ** 0.5
            clashed = (dis_min - r_atom - r_ex <= self.clash_tolerance)[..., None]
        else:
            cut = jnp.asarray(self.clash_cutoff)
            clashed = dis_min[..., None] <= cut  # (B, A, K)
        return CategoricalEncoder(
            self.ns, [2] * clashed.shape[-1], num_scalars=1, name="boarder_embedding"
        )(clashed.astype(jnp.int32), dis_min[..., None])

    def _cross_graph(self, batch, node_sigma, cross_dist_exp, deterministic, z_ij=None):
        """The knowledge-guided (A, P) bipartite grid
        (_build_phoretype_cross_conv_graph :759-895)."""
        ns = self.ns
        B, A = batch.lig_pos.shape[:2]
        P = batch.phore_pos.shape[1]
        lig_fp = batch.lig_phorefp  # (B, A, 11); auto_phorefp handled upstream
        cross_mask = batch.lig_mask[:, :, None] & batch.phore_mask[:, None, :]

        edge_vec = batch.phore_pos[:, None, :, :] - batch.lig_pos[:, :, None, :]
        edge_len = jnp.linalg.norm(edge_vec, axis=-1)
        len_emb = cross_dist_exp(edge_len)
        sig_e = jnp.broadcast_to(node_sigma[:, :, None, :], (B, A, P, node_sigma.shape[-1]))
        edge_attr = jnp.concatenate([sig_e, len_emb], -1)

        rotate_norm = jnp.zeros_like(edge_vec)
        if self.phoretype_match or self.angle_match:
            # type agreement: phoretype[p] * phorefp[a]; EX columns vanish
            # because ligand fingerprints never set the EX lane.
            aggreement = batch.phoretype[:, None, :, :] * lig_fp[:, :, None, :]
            phoretype_attr = jnp.concatenate(
                [aggreement,
                 jnp.broadcast_to(batch.phoretype[:, None, :, :], (B, A, P, NUM_PHORETYPE)),
                 jnp.broadcast_to(lig_fp[:, :, None, :], (B, A, P, NUM_PHORETYPE))], -1)

            if self.phoretype_match:
                total_weight = jnp.ones((B, A, P, 1))
                if self.cross_distance_transition:
                    dist_w = nn.softplus(MLP(
                        self.cross_distance_embed_dim // 2, 1, self.dropout,
                        name="cross_distance_transition")(len_emb, deterministic=deterministic))
                    total_weight = total_weight * dist_w
                if self.phoretype_match_transition:
                    match_w = nn.softplus(MLP(
                        NUM_PHORETYPE, 1, self.dropout,
                        name="phoretype_match_transition")(phoretype_attr, deterministic=deterministic))
                    total_weight = total_weight * match_w
                total_weight = total_weight * self.scaler
                if self.phore_direction_transition:
                    dir_logit = MLP(
                        NUM_PHORETYPE, 1, self.dropout, activation=nn.leaky_relu,
                        name="phore_direction_transition")(total_weight, deterministic=deterministic)
                    dir_logit = nn.leaky_relu(dir_logit)
                    direction = jnp.where(dir_logit < 0, -1.0, 1.0)
                    edge_vec = edge_vec * direction

                # masked softmax with a finite floor: fully-padded rows
                # produce harmless uniform weights instead of NaN (their
                # edges are masked out of the convs anyway).
                neg = -1e9
                if self.atom_weight in ("softmax", "atomwise"):
                    # per-graph normalization over every edge
                    logits = jnp.where(cross_mask[..., None], total_weight, neg)
                    flat = logits.reshape(B, A * P)
                    aw = jax.nn.softmax(flat, axis=-1).reshape(B, A, P, 1)
                elif self.atom_weight == "sigmoid":
                    aw = jax.nn.sigmoid(total_weight)
                elif self.atom_weight == "phore":
                    # normalize over the phore points seen by each atom
                    logits = jnp.where(cross_mask[..., None], total_weight, neg)
                    aw = jax.nn.softmax(logits, axis=2)
                else:
                    aw = 1.0
                total_weight = (
                    total_weight * aw + 1e-12 if self.multiple else aw
                )
                edge_vec = edge_vec * total_weight

                if self.use_phore_match_feat:
                    edge_attr = jnp.concatenate([edge_attr, phoretype_attr], -1)

            if self.use_att and z_ij is not None:
                edge_attr = jnp.concatenate([edge_attr, z_ij], -1)
                att_w = MLP(self.ns * 2, 1, self.dropout,
                            activation=nn.leaky_relu, name="mlp_att")(
                    z_ij, deterministic=deterministic)
                edge_vec = edge_vec * nn.leaky_relu(att_w)

            if self.angle_match:
                # lig norm selected by type agreement (B, A, P, 3)
                lig_norm_sel = jnp.einsum(
                    "bapk,bkac->bapc", aggreement, batch.lig_norm
                )
                pnorm = jnp.broadcast_to(
                    batch.phore_norm[:, None, :, :], lig_norm_sel.shape)
                cross_np = jnp.cross(lig_norm_sel, pnorm)
                # deviation: the reference clamps each component at 1e-12
                # (torch.clip(x, 1e-12), :877) which erases negative
                # components; we keep the true rotation axis.
                agg_sum = aggreement.sum(-1, keepdims=True)
                rot = cross_np * agg_sum
                rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
                curr_angle = angle_between(lig_norm_sel, pnorm)[..., None]
                a1 = jnp.einsum("bapk,bak->bap", aggreement, batch.lig_norm_angle1)[..., None]
                a2 = jnp.einsum("bapk,bak->bap", aggreement, batch.lig_norm_angle2)[..., None]
                d1, d2 = curr_angle - a1, curr_angle - a2
                norm_real = jnp.where(jnp.abs(d1) <= jnp.abs(d2), d1, d2)
                rotate_norm = rot * norm_real

        edge_sh = spherical_harmonics_lmax2(edge_vec)
        edge_norm_sh = spherical_harmonics_lmax2(rotate_norm, zero_safe=True)
        cross_edge_dim_in = edge_attr.shape[-1]
        edge_attr = MLP(ns, ns, self.dropout, name="cross_edge_embedding")(
            edge_attr, deterministic=deterministic)
        return edge_attr, edge_sh, edge_norm_sh, cross_mask
