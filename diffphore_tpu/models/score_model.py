"""The DiffPhore score network: encoder + (translation, rotation, torsion)
score heads.  Re-design of the reference TensorProductScoreModel
(score_model_phore.py:152-437) over dense masked grids.

Outputs are padded: tr/rot are (B, 3); torsion scores are (B, T) with
tor_mask marking real bonds (the reference returns a flat ragged vector).
SO(3)/torus score-norm scaling uses the device-resident tables - the
reference round-trips to CPU numpy inside the forward pass (:352, :376).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import so3, torus
from ..ops.diffusion import SigmaSchedule, timestep_embedding
from ..ops.sh import sh_l2, normalize_vec, spherical_harmonics_lmax2, irrep1_to_cartesian
from ..ops.tensor_product import full_tensor_product
from .encoder import LigPhoreEncoder
from .layers import DenseTPConv, GaussianSmearing, MLP


@dataclasses.dataclass(frozen=True)
class ScoreModelConfig:
    """Model hyperparameters; field names follow the reference YAML keys so
    shipped configs (weights/.../model_parameters.yml) map one-to-one."""

    ns: int = 20
    nv: int = 10
    num_conv_layers: int = 4
    sigma_embed_dim: int = 20
    distance_embed_dim: int = 20
    cross_distance_embed_dim: int = 20
    max_radius: float = 5.0
    cross_max_distance: float = 25.0
    center_max_distance: float = 30.0
    dropout: float = 0.1
    no_batch_norm: bool = False
    use_second_order_repr: bool = False
    scale_by_sigma: bool = True
    no_torsion: bool = False
    embedding_type: str = "sinusoidal"
    embedding_scale: float = 10000
    # knowledge guidance
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
    # tr/rot magnitude head: "norm_gated" = reference semantics
    # (vec/|vec| * MLP(|vec|, sigma)); "linear" = vec * (1 + softplus(MLP))
    # - a saddle-free variant, see magnitude_head() in __call__
    magnitude_head: str = "norm_gated"
    # computation precision of the tensor-product convolutions ("bfloat16"
    # drives the MXU; geometry/score math stays float32)
    compute_dtype: str = "bfloat16"
    # tensor-product parameterization: "channelwise" (uvu + static mix, the
    # TPU fast path) or "fully_connected" (reference e3nn uvw semantics)
    tp_mode: str = "channelwise"
    # fused edge-MLP + TP-aggregate pallas kernel for deterministic
    # (inference) channelwise convs on TPU (ops/pallas/tp_fused.py)
    use_pallas_fused: bool = False
    # compact the dense (P, P) phore-phore conv grid to each receiver's K
    # nearest masked neighbors.  The phore-graph topology is sparse (real
    # features fully connect only to each other; EX volumes connect within
    # 5 A - reference get_phore_graph, process_pharmacophore.py:634-712), so
    # on EX-heavy phores the dense grid wastes most of its nominal HBM
    # traffic: the sQC example phore is P=79 with max in-degree 18.  Exact
    # (same edge set, reordered) whenever K >= the graph's max in-degree;
    # larger degrees degrade gracefully by dropping the farthest neighbors.
    # MEASURED NEGATIVE on TPU v5e at sQC shapes: K=24 cut XLA-counted
    # bytes 13.8->11.1 GB per 40-pose forward but ran 1.44x SLOWER e2e
    # (234 vs 338 poses/s at 24 poses) - the per-step take_along_axis
    # gathers (phore node attrs depend on the step's sigma embedding, so
    # nothing hoists out of the sampler scan) cost more than the dense-grid
    # rows they avoid, mirroring the pallas-kernel findings: XLA's fused
    # dense formulation wins at these graph sizes.  Default 0 (dense);
    # the lever remains for much larger P where the P^2 term dominates.
    phore_knn: int = 0
    # diffusion schedule
    tr_sigma_min: float = 0.1
    tr_sigma_max: float = 5.0
    rot_sigma_min: float = 0.1
    rot_sigma_max: float = 1.5
    tor_sigma_min: float = 0.0314
    tor_sigma_max: float = 3.14

    @property
    def sigma_schedule(self) -> SigmaSchedule:
        return SigmaSchedule(
            self.tr_sigma_min, self.tr_sigma_max,
            self.rot_sigma_min, self.rot_sigma_max,
            self.tor_sigma_min, self.tor_sigma_max,
        )

    @classmethod
    def from_reference_yaml(cls, d: dict) -> "ScoreModelConfig":
        """Build from a reference model_parameters.yml dict, ignoring keys
        that belong to training/dataset layers."""
        names = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in names}
        if "clash_cutoff" in kw and isinstance(kw["clash_cutoff"], list):
            kw["clash_cutoff"] = tuple(kw["clash_cutoff"])
        return cls(**kw)


class ScoreModel(nn.Module):
    cfg: ScoreModelConfig

    @nn.compact
    def __call__(self, batch, deterministic: bool = True, use_running_average: bool = True,
                 pose_group: int = 1):
        """ComplexBatch -> (tr_pred (B,3), rot_pred (B,3), tor_pred (B,T)).

        ``pose_group``: static hint that rows are pose_group poses per
        complex (complex-major); enables exact pose-invariant factoring of
        the phore-side tensors in the encoder (see LigPhoreEncoder)."""
        cfg = self.cfg
        ns = cfg.ns
        B, A = batch.lig_pos.shape[:2]
        T = batch.tor_edges.shape[1]
        t = batch.t  # (B,)
        sched = cfg.sigma_schedule
        tr_sigma, rot_sigma, tor_sigma = sched(t)
        emb_fn = timestep_embedding(cfg.embedding_type, cfg.sigma_embed_dim, cfg.embedding_scale)
        sigma_emb = emb_fn(t)  # (B, E)

        encoder = LigPhoreEncoder(
            ns=ns, nv=cfg.nv, num_conv_layers=cfg.num_conv_layers,
            sigma_embed_dim=cfg.sigma_embed_dim,
            distance_embed_dim=cfg.distance_embed_dim,
            cross_distance_embed_dim=cfg.cross_distance_embed_dim,
            lig_max_radius=cfg.max_radius, phore_max_radius=cfg.max_radius,
            cross_max_distance=cfg.cross_max_distance,
            use_second_order_repr=cfg.use_second_order_repr,
            batch_norm=not cfg.no_batch_norm, dropout=cfg.dropout,
            consider_norm=cfg.consider_norm, angle_match=cfg.angle_match,
            phoretype_match=cfg.phoretype_match,
            use_phore_match_feat=cfg.use_phore_match_feat,
            cross_distance_transition=cfg.cross_distance_transition,
            phore_direction_transition=cfg.phore_direction_transition,
            phoretype_match_transition=cfg.phoretype_match_transition,
            atom_weight=cfg.atom_weight, scaler=cfg.scaler, multiple=cfg.multiple,
            boarder=cfg.boarder, clash_cutoff=tuple(cfg.clash_cutoff),
            by_radius=cfg.by_radius, clash_tolerance=cfg.clash_tolerance,
            auto_phorefp=cfg.auto_phorefp, use_att=cfg.use_att,
            trioformer_layer=cfg.trioformer_layer,
            compute_dtype=cfg.compute_dtype, tp_mode=cfg.tp_mode,
            use_pallas_fused=cfg.use_pallas_fused, phore_knn=cfg.phore_knn,
            name="encoder",
        )
        lig_attr, _ = encoder(
            batch, sigma_emb, deterministic=deterministic,
            use_running_average=use_running_average, pose_group=pose_group,
        )
        lig_irreps = encoder.out_irreps

        # ------------------------------------------------ tr/rot star conv
        m = batch.lig_mask.astype(jnp.float32)
        center = (batch.lig_pos * m[..., None]).sum(1) / jnp.maximum(m.sum(1), 1.0)[:, None]
        center_vec = batch.lig_pos - center[:, None, :]  # receiver=graph, sender=atom
        center_d = jnp.linalg.norm(center_vec, axis=-1)
        center_attr = jnp.concatenate(
            [GaussianSmearing(0.0, cfg.center_max_distance, cfg.distance_embed_dim,
                              name="center_distance_expansion")(center_d),
             jnp.broadcast_to(sigma_emb[:, None, :], (B, A, cfg.sigma_embed_dim))], -1)
        center_attr = MLP(ns, ns, cfg.dropout, name="center_edge_embedding")(
            center_attr, deterministic=deterministic)
        center_attr = jnp.concatenate([center_attr, lig_attr[..., :ns]], -1)
        center_sh = spherical_harmonics_lmax2(center_vec)
        # dense conv with one receiver per graph: N=1
        global_pred = DenseTPConv(
            in_irreps=lig_irreps, out_irreps="2x1o + 2x1e",
            n_edge_features=2 * ns, batch_norm=not cfg.no_batch_norm,
            dropout=cfg.dropout, compute_dtype=cfg.compute_dtype,
            tp_mode=cfg.tp_mode, use_pallas_fused=cfg.use_pallas_fused,
            name="final_conv",
        )(
            lig_attr, center_attr[:, None], center_sh[:, None],
            batch.lig_mask[:, None, :], receiver_mask=jnp.ones((B, 1), bool),
            deterministic=deterministic, use_running_average=use_running_average,
        )[:, 0]  # (B, 12)

        # 1o/1e blocks live in the internal real-SH basis (y, z, x); convert
        # to Cartesian before interpreting as translation/rotation vectors.
        tr_pred = irrep1_to_cartesian(global_pred[:, 0:3] + global_pred[:, 6:9])
        rot_pred = irrep1_to_cartesian(global_pred[:, 3:6] + global_pred[:, 9:12])

        def magnitude_head(vec, name):
            norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
            h = nn.Dense(ns, name=f"{name}_dense1")(jnp.concatenate([norm, sigma_emb], -1))
            h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
            h = nn.relu(h)
            mag = nn.Dense(1, name=f"{name}_dense2")(h)
            if cfg.magnitude_head == "linear":
                # gradient-friendly variant: scale the raw covariant vector
                # by a positive sigma-conditioned gain instead of replacing
                # its norm.  The reference's norm-gated head (vec/|vec|*mag)
                # is a training saddle: when the initial direction is
                # uninformative, mag collapses to 0 and the gradient into
                # vec (proportional to mag) vanishes - observed as the
                # translation loss pinning at its base value while
                # rotation/torsion train (see tests/test_train_cli.py).
                return vec * (1.0 + nn.softplus(mag))
            return vec / jnp.maximum(norm, 1e-12) * mag

        tr_pred = magnitude_head(tr_pred, "tr_final_layer")
        rot_pred = magnitude_head(rot_pred, "rot_final_layer")

        if cfg.scale_by_sigma:
            tr_pred = tr_pred / tr_sigma[:, None]
            rot_pred = rot_pred * so3.score_norm(rot_sigma)[:, None]

        if cfg.no_torsion:
            return tr_pred, rot_pred, jnp.zeros((B, T))

        # ------------------------------------------------ torsion head
        u = batch.tor_edges[..., 0]
        v = batch.tor_edges[..., 1]
        take = lambda x, idx: jnp.take_along_axis(x, idx[..., None], axis=1)
        pos_u = take(batch.lig_pos, u)
        pos_v = take(batch.lig_pos, v)
        bond_pos = 0.5 * (pos_u + pos_v)  # (B, T, 3)
        bond_vec = pos_v - pos_u
        tor_attr_nodes = take(lig_attr, u) + take(lig_attr, v)  # (B, T, D)

        tvec = batch.lig_pos[:, None, :, :] - bond_pos[:, :, None, :]  # (B, T, A, 3)
        td = jnp.linalg.norm(tvec, axis=-1)
        tmask = (
            batch.tor_mask[:, :, None]
            & batch.lig_mask[:, None, :]
            & (td < cfg.max_radius)
        )
        t_attr = GaussianSmearing(0.0, cfg.max_radius, cfg.distance_embed_dim,
                                  name="tor_distance_expansion")(td)
        t_attr = MLP(ns, ns, cfg.dropout, name="final_edge_embedding")(
            t_attr, deterministic=deterministic)
        t_attr = jnp.concatenate(
            [t_attr,
             jnp.broadcast_to(lig_attr[:, None, :, :ns], (B, T, A, ns)),
             jnp.broadcast_to(tor_attr_nodes[:, :, None, :ns], (B, T, A, ns))], -1)

        edge_sh = spherical_harmonics_lmax2(tvec)  # (B, T, A, 9)
        bond_sh = sh_l2(normalize_vec(bond_vec))   # (B, T, 5)
        tor_sh, tor_sh_irreps = full_tensor_product(
            edge_sh, jnp.broadcast_to(bond_sh[:, :, None, :], (B, T, A, 5)),
            "1x0e+1x1o+1x2e", "1x2e", filter_out=("0e", "1o", "1e"),
        )
        tor_pred = DenseTPConv(
            in_irreps=lig_irreps, out_irreps=f"{ns}x0o + {ns}x0e",
            sh_irreps=repr(tor_sh_irreps), n_edge_features=3 * ns,
            batch_norm=not cfg.no_batch_norm, dropout=cfg.dropout,
            compute_dtype=cfg.compute_dtype, tp_mode=cfg.tp_mode,
            use_pallas_fused=cfg.use_pallas_fused, name="tor_bond_conv",
        )(
            lig_attr, t_attr, tor_sh, tmask,
            receiver_mask=batch.tor_mask,
            deterministic=deterministic, use_running_average=use_running_average,
        )  # (B, T, 2ns)
        h = nn.Dense(ns, use_bias=False, name="tor_final_dense1")(tor_pred)
        h = jnp.tanh(h)
        h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
        tor_pred = nn.Dense(1, use_bias=False, name="tor_final_dense2")(h)[..., 0]

        if cfg.scale_by_sigma:
            tor_pred = tor_pred * jnp.sqrt(torus.score_norm(tor_sigma))[:, None]
        tor_pred = tor_pred * batch.tor_mask
        return tr_pred, rot_pred, tor_pred
