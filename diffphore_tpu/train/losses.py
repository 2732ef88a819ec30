"""Sigma-weighted denoising score-matching loss.

Mirrors reference loss_function (utils/training.py:80-148): translation MSE
scaled by sigma_tr^2, rotation MSE normalized by the IGSO3 score-norm table,
torsion MSE normalized by the torus score-norm table - with padded torsion
slots masked out instead of ragged concatenation.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

from ..ops import so3, torus
from ..ops.diffusion import SigmaSchedule


class ScoreTargets(NamedTuple):
    """Ground-truth scores produced by the noise transform."""

    tr_score: jnp.ndarray   # (B, 3)
    rot_score: jnp.ndarray  # (B, 3)
    tor_score: jnp.ndarray  # (B, T)
    tor_sigma: jnp.ndarray  # (B,) per-graph torsion sigma


def score_matching_loss(
    preds,
    targets: ScoreTargets,
    t: jnp.ndarray,
    tor_mask: jnp.ndarray,
    schedule: SigmaSchedule,
    tr_weight: float = 0.33,
    rot_weight: float = 0.33,
    tor_weight: float = 0.33,
    no_torsion: bool = False,
    apply_mean: bool = True,
    valid=None,
) -> Dict[str, jnp.ndarray]:
    """``apply_mean=False`` returns per-graph (B,) losses instead of scalars
    (the reference's apply_mean=False used by test_epoch's sigma-interval
    bucketing, training.py:321,330-339).  ``valid`` is a (B,) weight mask:
    repeat-padded rows from short final batches (data/loaders.py) contribute
    zero to every reduction, so padding never biases loss or the plateau-LR
    signal."""
    tr_pred, rot_pred, tor_pred = preds
    tr_sigma, rot_sigma, tor_sigma = schedule(t)
    w = jnp.ones(t.shape, tr_pred.dtype) if valid is None else valid.astype(tr_pred.dtype)
    if apply_mean:
        # per-graph mean over the trailing axis, then validity-weighted mean
        red = lambda x: (x.mean(-1) * w).sum() / jnp.maximum(w.sum(), 1.0)
    else:
        red = lambda x: x.mean(-1)

    tr_loss = red((tr_pred - targets.tr_score) ** 2 * tr_sigma[:, None] ** 2)
    tr_base = red((targets.tr_score**2) * tr_sigma[:, None] ** 2)

    rot_norm = so3.score_norm(rot_sigma)[:, None]
    rot_loss = red(((rot_pred - targets.rot_score) / rot_norm) ** 2)
    rot_base = red((targets.rot_score / rot_norm) ** 2)

    if no_torsion:
        tor_loss = tor_base = jnp.zeros(() if apply_mean else t.shape)
    else:
        tor_norm2 = torus.score_norm(targets.tor_sigma)[:, None]  # (B, 1)
        m = tor_mask.astype(tr_pred.dtype)
        if apply_mean:
            # reference semantics: element-weighted over the concatenated
            # torsion edges (training.py:128-140); invalid graphs zeroed
            m = m * w[:, None]
            denom = jnp.maximum(m.sum(), 1.0)
            tor_loss = (((tor_pred - targets.tor_score) ** 2 / tor_norm2) * m).sum() / denom
            tor_base = (((targets.tor_score**2) / tor_norm2) * m).sum() / denom
        else:
            denom = jnp.maximum(m.sum(-1), 1.0)
            tor_loss = (((tor_pred - targets.tor_score) ** 2 / tor_norm2) * m).sum(-1) / denom
            tor_base = (((targets.tor_score**2) / tor_norm2) * m).sum(-1) / denom

    loss = tr_loss * tr_weight + rot_loss * rot_weight + tor_loss * tor_weight
    return {
        "loss": loss,
        "tr_loss": tr_loss, "rot_loss": rot_loss, "tor_loss": tor_loss,
        "tr_base_loss": tr_base, "rot_base_loss": rot_base, "tor_base_loss": tor_base,
    }
