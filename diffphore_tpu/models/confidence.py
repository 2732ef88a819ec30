"""Confidence model: predict pose fitness from the encoder embedding.

The reference declares ``confidence_mode`` end to end - flags
(parsing.py:127-130), constructor plumbing (score_model_phore.py:170-171,
217, 468, 485) and epoch-loop branches expecting
``model(data) -> (fitscore, ph_overlap, ex_overlap)``
(utils/training.py:253-261, 336-343) - but no forward in the shipped model
ever produces those outputs, and its labels come from caching AncPhore
subprocess scores per pose (pdbbind_phore.py:1412-1533 score_func /
cache_label / calc_label).

This is the working TPU realization: the same knowledge-guided encoder
trunk as the score model, a masked-mean readout over the ligand scalar
channels, and a small MLP head emitting (fitscore, ph_overlap, ex_overlap).
Labels are computed on device by the analytic scorer (ops/fitscore.py), so
no subprocess caching stage exists - see train/confidence.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import MLP
from .score_model import ScoreModelConfig
from ..ops.diffusion import timestep_embedding


class ConfidenceModel(nn.Module):
    cfg: ScoreModelConfig
    confidence_dropout: float = 0.0
    confidence_no_batchnorm: bool = False
    num_confidence_outputs: int = 3  # fitscore, ph_overlap, ex_overlap

    @nn.compact
    def __call__(self, batch, deterministic: bool = True,
                 use_running_average: bool = True):
        from .encoder import LigPhoreEncoder

        cfg = self.cfg
        emb_fn = timestep_embedding(cfg.embedding_type, cfg.sigma_embed_dim,
                                    cfg.embedding_scale)
        sigma_emb = emb_fn(batch.t)
        encoder = LigPhoreEncoder(
            ns=cfg.ns, nv=cfg.nv, num_conv_layers=cfg.num_conv_layers,
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
            atom_weight=cfg.atom_weight, scaler=cfg.scaler,
            multiple=cfg.multiple, boarder=cfg.boarder,
            clash_cutoff=tuple(cfg.clash_cutoff), by_radius=cfg.by_radius,
            clash_tolerance=cfg.clash_tolerance,
            auto_phorefp=cfg.auto_phorefp, use_att=cfg.use_att,
            trioformer_layer=cfg.trioformer_layer,
            compute_dtype=cfg.compute_dtype, tp_mode=cfg.tp_mode,
            phore_knn=cfg.phore_knn, name="encoder",
        )
        lig_attr, _ = encoder(batch, sigma_emb, deterministic=deterministic,
                              use_running_average=use_running_average)
        # masked-mean readout over the ligand scalar channels ('readout'
        # mean, score_model_phore.py:179)
        m = batch.lig_mask.astype(jnp.float32)
        scalars = lig_attr[..., : cfg.ns]
        pooled = (scalars * m[..., None]).sum(1) / jnp.maximum(
            m.sum(1), 1.0)[:, None]
        out = MLP(
            2 * cfg.ns, self.num_confidence_outputs,
            dropout=self.confidence_dropout, name="confidence_head",
        )(pooled, deterministic=deterministic)
        return out[:, 0], out[:, 1], out[:, 2]
