"""Confidence-mode training: regress pose fitness from noised poses.

Realizes the reference's declared-but-unimplemented ``confidence_mode``
(training.py:253-261 expects ``model(data) -> (fitscore, ph_overlap,
ex_overlap)`` with metrics ['loss', 'loss_ph', 'loss_ex']; labels were to be
cached from AncPhore subprocess runs, pdbbind_phore.py:1412-1533).

TPU inversion: poses are noised on device exactly like diffusion training
(a random t per graph), and the labels - total fitscore plus the
ph/ex-overlap percentages - are computed in the same jitted step by the
analytic scorer (ops/fitscore.py), so there is no label-caching stage at
all.  ``by_total`` (parsing.py:130) selects the total-fitscore MSE instead
of the ph&ex pair.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..data.transforms import apply_noise
from ..models.confidence import ConfidenceModel
from ..ops.fitscore import PhoreArrays, fitscore
from .state import TrainState, make_optimizer


def batch_phore_arrays(batch) -> PhoreArrays:
    """Per-graph reference-pharmacophore arrays straight from batch fields
    (all already in the phore-centered frame)."""
    return PhoreArrays(
        coord=batch.phore_pos,
        type_onehot=batch.phoretype,
        alpha=batch.phore_x[..., 3],
        weight=batch.phore_x[..., 4],
        anchor=jnp.where(batch.phore_mask, 1.0, 0.0),
        is_ex=batch.phoretype[..., -1] == 1,
        mask=batch.phore_mask,
    )


def confidence_labels(batch, vdw_table: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(fitscore, ph_overlap, ex_overlap) of the batch's current poses,
    vmapped over heterogeneous graphs."""
    ref = batch_phore_arrays(batch)
    vdw = jnp.asarray(vdw_table)[batch.lig_feat[..., 0]]

    def one(pos, mask, fp, v, r):
        s = fitscore(pos, mask, fp, v, r)
        return s["phscore1"], s["ov_pct"], s["ex_pct"]

    sfp = (batch.lig_scorer_fp if batch.lig_scorer_fp is not None
           else batch.lig_phorefp)
    return jax.vmap(one)(batch.lig_pos, batch.lig_mask, sfp, vdw, ref)


def confidence_loss(preds, labels, by_total: bool = False,
                    label_mode: str = "fitness"):
    """MSE over (fitscore, ph, ex) or total-only (reference by_total).

    ``label_mode='rmsd_lt2'``: the first label is the binary pose-correct
    target (RMSD < 2 A of the noised pose) and the first head output is its
    logit (sigmoid BCE), the DiffDock-style confidence objective; ph/ex
    stay as auxiliary regressions.  Unlike the fitness label - which the
    analytic scorer computes exactly at inference anyway - this target lets
    the ranked pose be chosen by predicted *correctness*, which fitness
    ranking approximates only loosely."""
    fit_p, ph_p, ex_p = preds
    fit_l, ph_l, ex_l = labels
    loss_ph = ((ph_p - ph_l) ** 2).mean()
    loss_ex = ((ex_p - ex_l) ** 2).mean()
    if label_mode == "rmsd_lt2":
        # sigmoid BCE on the logit, numerically stable form
        loss_total = (jnp.maximum(fit_p, 0.0) - fit_p * fit_l
                      + jnp.log1p(jnp.exp(-jnp.abs(fit_p)))).mean()
        loss = loss_total + 0.1 * (loss_ph + loss_ex)
    else:
        loss_total = ((fit_p - fit_l) ** 2).mean()
        loss = loss_total if by_total else loss_ph + loss_ex
    return {"loss": loss, "loss_ph": loss_ph, "loss_ex": loss_ex,
            "loss_total": loss_total}


def pose_rmsd_to_clean(noised_pos, clean_pos, lig_mask) -> jnp.ndarray:
    """Per-graph RMSD between the noised and clean pose (same frame, no
    realignment - the pose ERROR is the quantity of interest)."""
    d2 = ((noised_pos - clean_pos) ** 2).sum(-1)
    m = lig_mask.astype(d2.dtype)
    return jnp.sqrt((d2 * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0))


def create_confidence_train_state(
    model: ConfidenceModel, example_batch, seed: int = 0, lr: float = 1e-3,
    weight_decay: float = 0.0,
) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), example_batch)
    tx = make_optimizer(lr, weight_decay)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            ema_params=variables["params"],
        ),
        tx,
    )


def make_confidence_train_step(
    model: ConfidenceModel,
    tx: optax.GradientTransformation,
    vdw_table: jnp.ndarray,
    ema_decay: float = 0.999,
    by_total: bool = False,
    label_mode: str = "fitness",
):
    """(state, batch, key) -> (state, metrics); the forward sees the noised
    pose and regresses its analytic fitness (label_mode='fitness') or the
    binary RMSD<2 pose-correctness target (label_mode='rmsd_lt2')."""
    schedule = model.cfg.sigma_schedule

    def step(state: TrainState, batch, key):
        k_noise, k_drop = jax.random.split(key)
        noised, _ = apply_noise(batch, k_noise, schedule,
                                no_torsion=model.cfg.no_torsion)
        labels = confidence_labels(noised, vdw_table)
        if label_mode == "rmsd_lt2":
            rmsd = pose_rmsd_to_clean(noised.lig_pos, batch.lig_pos,
                                      batch.lig_mask)
            labels = ((rmsd < 2.0).astype(jnp.float32),) + tuple(labels[1:])

        def loss_fn(params):
            preds, new_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                noised, deterministic=False, use_running_average=False,
                mutable=["batch_stats"], rngs={"dropout": k_drop},
            )
            metrics = confidence_loss(preds, labels, by_total, label_mode)
            return metrics["loss"], (metrics, new_state["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        ok = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, jnp.nan_to_num(g), 0.0), grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params, new_params)
        new_state = TrainState(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, ema_params=new_ema)
        metrics = dict(metrics)
        metrics["grad_finite"] = ok.astype(jnp.float32)
        return new_state, metrics

    return step


def make_confidence_eval_step(model: ConfidenceModel, vdw_table: jnp.ndarray,
                              by_total: bool = False,
                              label_mode: str = "fitness"):
    """(variables, batch, key) -> metrics on freshly noised poses."""
    schedule = model.cfg.sigma_schedule

    def step(variables, batch, key):
        noised, _ = apply_noise(batch, key, schedule,
                                no_torsion=model.cfg.no_torsion)
        labels = confidence_labels(noised, vdw_table)
        if label_mode == "rmsd_lt2":
            rmsd = pose_rmsd_to_clean(noised.lig_pos, batch.lig_pos,
                                      batch.lig_mask)
            labels = ((rmsd < 2.0).astype(jnp.float32),) + tuple(labels[1:])
        preds = model.apply(variables, noised, deterministic=True,
                            use_running_average=False,
                            mutable=["batch_stats"])[0]
        return confidence_loss(preds, labels, by_total, label_mode)

    return step
