"""Calibrated Conformation Sampler (CCSampler): inference-aware training.

The reference's key fine-tuning trick (NoiseTransformPhore.sample_from_infer,
pdbbind_phore.py:286-391): with probability p(epoch), a training pose is not
a plain forward-noised sample but the result of one reverse Euler step of the
*current model* from t to t - delta_t; the regression targets are recomputed
from the cumulative 0 -> t_n transform recovered via Kabsch.  The reference
runs this on a CPU copy of the model inside dataloader workers; here it is a
second jitted forward inside the train step, selected per graph.

p(epoch) follows dynamic_schedule (pdbbind_phore.py:373):
    p = max_rate * (1 - u / (u + exp(c * epoch / u)))
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import so3, torus
from ..ops.diffusion import SigmaSchedule
from ..ops.geometry import kabsch, matrix_to_axis_angle
from ..ops.rigid import PoseState
from ..ops.torsion import apply_torsion_updates
from ..sampler.sampling import _apply_pose_update, sample_step
from .losses import ScoreTargets


def dynamic_schedule(epoch: int, max_rate: float = 0.4, u: float = 400, c: float = 10) -> float:
    u = max(float(u), 1.0)  # guard epoch_from_infer = 0
    return float(max_rate * (1 - u / (u + np.exp(min(c * epoch / u, 50.0)))))


def ccsampler_apply_noise(
    batch,
    key: jax.Array,
    schedule: SigmaSchedule,
    score_fn: Callable,
    p_from_infer: jnp.ndarray,
    delta_t: float = 0.05,
    no_torsion: bool = False,
) -> Tuple[object, ScoreTargets]:
    """Noise a clean batch with a per-graph mix of plain diffusion and
    one-model-step calibrated samples.

    Args:
      batch: clean ComplexBatch (ground-truth poses).
      score_fn: current-model score function (see sampler.reverse_diffusion).
      p_from_infer: scalar probability of the calibrated branch per graph.
    """
    B = batch.lig_pos.shape[0]
    T = batch.tor_edges.shape[1]
    k_t, k_tr, k_rot, k_tor, k_step, k_sel = jax.random.split(key, 6)
    t = jax.random.uniform(k_t, (B,))
    tr_sigma, rot_sigma, tor_sigma = schedule(t)

    # ---- forward noise at t (keep the drawn updates)
    tr_up = tr_sigma[:, None] * jax.random.normal(k_tr, (B, 3))
    rot_up = so3.sample_vec(k_rot, rot_sigma)
    tor_up = tor_sigma[:, None] * jax.random.normal(k_tor, (B, T))
    if no_torsion:
        tor_up = jnp.zeros((B, T))
    tor_up = tor_up * batch.tor_mask
    noised = _apply_pose_update(batch, tr_up, rot_up, tor_up)
    noised = noised.replace(t=t)

    # ---- one reverse Euler step of the current model: t -> t - delta_t
    stepped, tr_p, rot_p, tor_p = sample_step(
        score_fn, noised, k_step, schedule, tr_sigma, rot_sigma, tor_sigma, delta_t
    )
    tor_cum = tor_up + tor_p * batch.tor_mask

    # ---- recover cumulative rigid transform 0 -> t_n via Kabsch
    # (reference get_updates_from_0_to_n, sampling.py:566-597): apply the
    # cumulative torsions to the CLEAN pose, align back, then Kabsch against
    # the stepped pose gives (R1, t1).
    def cum_transform(pos0, mask, edges, mrot, tmask, tor, stepped_pos):
        flex, _ = apply_torsion_updates(pos0, edges, mrot, tor, tmask)
        Rk, tk = kabsch(flex, pos0, mask=mask)
        aligned = jnp.einsum("ni,ji->nj", flex, Rk) + tk
        R1, t1 = kabsch(aligned, stepped_pos, mask=mask)
        w = mask.astype(pos0.dtype)[:, None]
        c0 = (aligned * w).sum(0) / jnp.maximum(w.sum(), 1.0)
        cB = (stepped_pos * w).sum(0) / jnp.maximum(w.sum(), 1.0)
        tr_cum = cB - c0
        rot_cum = matrix_to_axis_angle(R1)
        return tr_cum, rot_cum

    tr_cum, rot_cum = jax.vmap(cum_transform)(
        batch.lig_pos, batch.lig_mask, batch.tor_edges, batch.mask_rotate,
        batch.tor_mask, tor_cum, stepped.lig_pos,
    )

    # ---- rebuild the sample at t_n from the clean pose + cumulative updates
    t_n = jnp.maximum(t - delta_t, 1e-3)
    trs_n, rots_n, tors_n = schedule(t_n)
    rebuilt = _apply_pose_update(batch, tr_cum, rot_cum, tor_cum)

    # ---- per-graph branch selection
    use_cc = (jax.random.uniform(k_sel, (B,)) < p_from_infer) & (t > delta_t)
    sel = lambda a, b: jnp.where(
        use_cc.reshape((B,) + (1,) * (a.ndim - 1)), a, b
    )
    out = noised.replace(
        lig_pos=sel(rebuilt.lig_pos, noised.lig_pos),
        lig_norm=sel(rebuilt.lig_norm, noised.lig_norm),
        t=jnp.where(use_cc, t_n, t),
    )
    tr_sig_eff = jnp.where(use_cc, trs_n, tr_sigma)
    rot_sig_eff = jnp.where(use_cc, rots_n, rot_sigma)
    tor_sig_eff = jnp.where(use_cc, tors_n, tor_sigma)
    tr_eff = sel(tr_cum, tr_up)
    rot_eff = sel(rot_cum, rot_up)
    tor_eff = sel(tor_cum, tor_up)

    targets = ScoreTargets(
        tr_score=-tr_eff / tr_sig_eff[:, None] ** 2,
        rot_score=so3.score_vec(rot_sig_eff, rot_eff),
        tor_score=torus.score(tor_eff, tor_sig_eff[:, None]) * batch.tor_mask,
        tor_sigma=tor_sig_eff,
    )
    return out, targets


def make_ccsampler_train_step(cfg, tx, ema_decay=0.999, tr_weight=0.33,
                              rot_weight=0.33, tor_weight=0.33, delta_t=0.05):
    """Train step with the CCSampler branch.  p_from_infer is a traced scalar
    argument so the schedule can change per epoch without recompiling."""
    from ..models import ScoreModel
    from .losses import score_matching_loss
    from .state import TrainState

    import optax

    model = ScoreModel(cfg)
    schedule = cfg.sigma_schedule

    def step(state: TrainState, batch, key, p_from_infer):
        k_noise, k_drop = jax.random.split(key)

        def frozen_score_fn(b):
            # the sampler step uses the current weights WITHOUT gradient flow
            return model.apply(
                {"params": jax.lax.stop_gradient(state.params),
                 "batch_stats": state.batch_stats}, b,
            )

        noised, targets = ccsampler_apply_noise(
            batch, k_noise, schedule, frozen_score_fn, p_from_infer, delta_t,
            cfg.no_torsion,
        )

        def loss_fn(params):
            preds, new_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                noised, deterministic=False, use_running_average=False,
                mutable=["batch_stats"], rngs={"dropout": k_drop},
            )
            metrics = score_matching_loss(
                preds, targets, noised.t, batch.tor_mask, schedule,
                tr_weight, rot_weight, tor_weight, cfg.no_torsion,
                valid=batch.valid,
            )
            return metrics["loss"], (metrics, new_state["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        ok = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(lambda g: jnp.where(ok, jnp.nan_to_num(g), 0.0), grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params, new_params,
        )
        metrics = dict(metrics)
        metrics["grad_finite"] = ok.astype(jnp.float32)
        return TrainState(state.step + 1, new_params, new_bs, new_opt, new_ema), metrics

    return step
