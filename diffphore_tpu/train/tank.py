"""TANKBind-style training: distance-map regression + affinity.

TPU realization of the reference ``model_type='tank'`` path
(utils/training.py:150-166 loss_function_tank, :557-589 train_tank_epoch,
:593-624 test_tank_epoch): the model predicts the ligand-phore cross
distance map (MSE against the true map clamped at ``dis_cutoff``, or
BCE-with-logits against the contact map when ``pred_dis=False``) plus an
optional per-graph affinity (MSE x affinity_weight).  The reference loops
host-side with OOM/skip handling; here the whole step - target construction,
forward, loss, grads, EMA - is one jittable function over the dense padded
batch, and pose generation goes through ops/coord_recovery.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.trioformer import TankPhore
from .state import TrainState


def dis_map_targets(batch, dis_cutoff: float = 10.0) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(dis_map, contact_y, pair_mask) from the clean batch.

    Mirrors the reference dataset's ``data.dis_map`` / ``data.y`` fields
    (TANKBind convention: cross distances clamped at 10 A; a pair is a
    positive contact below the same cutoff).  Computed on device from the
    batch positions instead of in dataloader workers.

    Assumes complex-frame data (PDBbind-style: the ligand pose and the
    pharmacophore share the input coordinate frame, like every training
    path here); a screening-style record whose ligand sits in an arbitrary
    frame yields degenerate all-clamped targets.
    """
    d = jnp.linalg.norm(
        batch.lig_pos[:, :, None, :] - batch.phore_pos[:, None, :, :], axis=-1
    )
    pair_mask = (batch.lig_mask[:, :, None] & batch.phore_mask[:, None, :])
    dis_map = jnp.minimum(d, dis_cutoff)
    contact_y = (d < dis_cutoff).astype(jnp.float32)
    return dis_map, contact_y, pair_mask.astype(jnp.float32)


def tank_loss(
    y_pred: jnp.ndarray,        # (B, A, P) distances or contact logits
    affinity_pred: jnp.ndarray, # (B,)
    dis_map: jnp.ndarray,
    contact_y: jnp.ndarray,
    pair_mask: jnp.ndarray,
    affinity: jnp.ndarray,      # (B,)
    consider_affinity: bool = True,
    pred_dis: bool = True,
    contact_weight: float = 1.0,
    affinity_weight: float = 0.01,
    pose_weight: float = 5.0,
):
    """Masked loss_function_tank (utils/training.py:150-166)."""
    n = jnp.maximum(pair_mask.sum(), 1.0)
    if pred_dis:
        contact_loss = (((y_pred - dis_map) ** 2) * pair_mask).sum() / n
    else:
        # BCEWithLogits with pos_weight on the positive class
        logp = jax.nn.log_sigmoid(y_pred)
        log1mp = jax.nn.log_sigmoid(-y_pred)
        bce = -(pose_weight * contact_y * logp + (1.0 - contact_y) * log1mp)
        contact_loss = (bce * pair_mask).sum() / n
    contact_loss = contact_loss * contact_weight
    if consider_affinity:
        affinity_loss = ((affinity_pred - affinity) ** 2).mean() * affinity_weight
    else:
        affinity_loss = jnp.zeros(())
    loss = contact_loss + affinity_loss
    return {"loss": loss, "contact_loss": contact_loss,
            "affinity_loss": affinity_loss}


def create_tank_train_state(
    model: TankPhore, example_batch, seed: int = 0, lr: float = 1e-3,
    weight_decay: float = 0.0,
) -> Tuple[TrainState, optax.GradientTransformation]:
    from .state import make_optimizer

    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), example_batch)
    params = variables["params"]
    tx = make_optimizer(lr, weight_decay)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            ema_params=params,
        ),
        tx,
    )


def make_tank_train_step(
    model: TankPhore,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.999,
    consider_affinity: bool = True,
    pred_dis: bool = True,
    contact_weight: float = 1.0,
    affinity_weight: float = 0.01,
    pose_weight: float = 5.0,
    dis_cutoff: float = 10.0,
):
    """(state, batch, key, affinity) -> (state, metrics), jit-ready."""

    def step(state: TrainState, batch, key, affinity):
        dis_map, contact_y, pair_mask = dis_map_targets(batch, dis_cutoff)

        def loss_fn(params):
            y_pred, aff_pred = model.apply(
                {"params": params}, batch, deterministic=False,
                rngs={"dropout": key},
            )
            return tank_loss(
                y_pred, aff_pred, dis_map, contact_y, pair_mask, affinity,
                consider_affinity, pred_dis, contact_weight,
                affinity_weight, pose_weight,
            )["loss"], None

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
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
            step=state.step + 1, params=new_params,
            batch_stats=state.batch_stats, opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, {"loss": loss, "grad_finite": ok.astype(jnp.float32)}

    return step


def make_tank_eval_step(
    model: TankPhore,
    consider_affinity: bool = True,
    pred_dis: bool = True,
    contact_weight: float = 1.0,
    affinity_weight: float = 0.01,
    pose_weight: float = 5.0,
    dis_cutoff: float = 10.0,
):
    """(variables, batch, affinity) -> metrics (test_tank_epoch body)."""

    def step(variables, batch, affinity):
        dis_map, contact_y, pair_mask = dis_map_targets(batch, dis_cutoff)
        y_pred, aff_pred = model.apply(variables, batch, deterministic=True)
        return tank_loss(
            y_pred, aff_pred, dis_map, contact_y, pair_mask, affinity,
            consider_affinity, pred_dis, contact_weight, affinity_weight,
            pose_weight,
        )

    return step


def tank_pose_metrics(
    model: TankPhore,
    variables,
    batch,
    mols,
    key: jax.Array,
    n_init: int = 4,
) -> dict:
    """Pose generation + RMSD gate for the tank model: predict the cross
    distance map, recover coordinates against LAS-constrained intra
    distances, and report the rmsds_lt2 / rmsds_lt5 percentages (reference
    inference_tank_epoch, utils/training.py:628-660, which loops per complex;
    the recovery itself is jitted per graph here).

    ``mols`` are the host Molecule objects aligned with the batch rows
    (needed for the LAS matrices).  RMSD is against ``batch.lig_pos`` (the
    crystal pose in the clean batch frame).
    """
    import numpy as np

    from ..ops.coord_recovery import las_distance_matrix, recover_coords

    y_pred, _ = model.apply(variables, batch, deterministic=True)
    y_pred = jnp.abs(y_pred)
    A = batch.num_atoms
    rmsds = []
    for g, mol in enumerate(mols):
        holo, intra_mask = las_distance_matrix(mol)
        n = holo.shape[0]
        holo = jnp.pad(holo, ((0, A - n), (0, A - n)))
        intra_mask = jnp.pad(intra_mask, ((0, A - n), (0, A - n)))
        cross_mask = batch.lig_mask[g][:, None] & batch.phore_mask[g][None, :]
        key, sub = jax.random.split(key)
        coords, _ = recover_coords(
            sub, batch.phore_pos[g], y_pred[g], cross_mask, holo, intra_mask,
            n_init=n_init,
        )
        m = np.asarray(batch.lig_mask[g], bool)
        diff = np.asarray(coords)[m] - np.asarray(batch.lig_pos[g])[m]
        rmsds.append(float(np.sqrt((diff ** 2).sum(-1).mean())))
    rmsds = np.asarray(rmsds)
    return {
        "rmsds": rmsds.tolist(),
        "rmsds_lt2": float(100.0 * (rmsds < 2.0).mean()),
        "rmsds_lt5": float(100.0 * (rmsds < 5.0).mean()),
    }
