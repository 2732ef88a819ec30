"""Train state: optimizer, EMA shadow weights, LR plateau control.

Reference counterparts: get_optimizer_and_scheduler (utils/utils.py:100-110,
Adam + ReduceLROnPlateau patience 40 x0.9) and ExponentialMovingAverage
(utils/utils.py:249-343, decay 0.999).  The plateau controller runs host-side
between epochs and writes the learning rate through optax
``inject_hyperparams``; EMA is a plain pytree blend inside the jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data.transforms import apply_noise
from ..models import ScoreModel, ScoreModelConfig
from .losses import score_matching_loss


@struct.dataclass
class TrainState:
    step: Any
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any

    @property
    def variables(self) -> Dict:
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def ema_variables(self) -> Dict:
        return {"params": self.ema_params, "batch_stats": self.batch_stats}


def make_optimizer(lr: float = 1e-3, weight_decay: float = 0.0) -> optax.GradientTransformation:
    if weight_decay > 0:
        return optax.inject_hyperparams(optax.adamw)(learning_rate=lr, weight_decay=weight_decay)
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def create_train_state(
    cfg: ScoreModelConfig, example_batch, seed: int = 0, lr: float = 1e-3,
    weight_decay: float = 0.0,
) -> Tuple[TrainState, optax.GradientTransformation]:
    model = ScoreModel(cfg)
    # strip host metadata: numpy arrays inside the static names/meta fields
    # break jit treedef equality checks
    example_batch = example_batch.replace(names=(), meta=())
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), example_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(lr, weight_decay)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=params,
        ),
        tx,
    )


def set_learning_rate(state: TrainState, tx_unused, lr: float) -> TrainState:
    """Plateau controller hook: write the LR into the injected hyperparams."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def make_train_step(
    cfg: ScoreModelConfig,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.999,
    tr_weight: float = 0.33,
    rot_weight: float = 0.33,
    tor_weight: float = 0.33,
    reject: bool = False,
):
    """Build the pure (state, batch, key) -> (state, metrics) step.

    The forward runs with dropout + batch statistics (training mode); noising
    happens on device (data/transforms.py).  The function is jit/pjit-ready:
    shard the batch axis, replicate state, and XLA inserts the gradient psum.
    """
    model = ScoreModel(cfg)
    schedule = cfg.sigma_schedule

    def step(state: TrainState, batch, key, reject_prob=0.0):
        k_noise, k_drop = jax.random.split(key)
        noised, targets = apply_noise(
            batch, k_noise, schedule, no_torsion=cfg.no_torsion,
            reject_prob=reject_prob if reject else 0.0,
        )

        def loss_fn(params):
            preds, new_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                noised,
                deterministic=False,
                use_running_average=False,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop},
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
        # NaN-loss guard (reference drops such batches, training.py:322-327):
        # zero the update instead of dropping, keeping the step count aligned.
        ok = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, jnp.nan_to_num(g), 0.0), grads
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params, new_params,
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        metrics = dict(metrics)
        metrics["grad_finite"] = ok.astype(jnp.float32)
        return new_state, metrics

    return step


def make_eval_step(
    cfg: ScoreModelConfig,
    tr_weight: float = 0.33,
    rot_weight: float = 0.33,
    tor_weight: float = 0.33,
):
    """Validation loss step (reference test_epoch, training.py:288-367):
    noise the clean batch, run the eval-mode forward (running batch-norm
    averages, matching the reference's model.eval(), training.py:302), and
    return PER-GRAPH loss components plus t/valid so the host can bucket by
    sigma interval (test_sigma_intervals) and drop repeat-padded rows."""
    model = ScoreModel(cfg)
    schedule = cfg.sigma_schedule

    def step(variables, batch, key):
        noised, targets = apply_noise(batch, key, schedule,
                                      no_torsion=cfg.no_torsion)
        preds = model.apply(variables, noised, deterministic=True,
                            use_running_average=True)
        metrics = score_matching_loss(
            preds, targets, noised.t, batch.tor_mask, schedule,
            tr_weight, rot_weight, tor_weight, cfg.no_torsion,
            apply_mean=False,
        )
        metrics["t"] = noised.t
        return metrics

    return step
