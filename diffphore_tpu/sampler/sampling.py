"""Reverse diffusion over T(3) x SO(3) x SO(2)^m, fully on device.

The reference sampler (sampling.py:174-280) runs a Python loop over 20 steps
with host->device transfers, CPU score-table lookups and a per-graph Python
``modify_conformer`` every step.  Here the entire chain - model forward,
Euler-Maruyama perturbation, torsion apply, Kabsch re-alignment - is one
``lax.scan`` compiled once; poses are just rows of the batch.

All randomness is jax.random with explicit keys (deterministic given a seed,
unlike the reference's global numpy/torch RNG).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import so3
from ..ops.diffusion import SigmaSchedule, t_schedule
from ..ops.geometry import axis_angle_to_matrix
from ..ops.rigid import PoseState, modify_conformer


def _apply_pose_update(batch, tr, rot, tor):
    """vmap modify_conformer over the batch; returns updated batch."""

    def one(pos, norm, mask, edges, mrot, tmask, tr_u, rot_u, tor_u):
        st = modify_conformer(
            PoseState(pos, norm), mask, edges, mrot, tmask, tr_u, rot_u, tor_u
        )
        return st.pos, st.norm

    pos, norm = jax.vmap(one)(
        batch.lig_pos, batch.lig_norm, batch.lig_mask, batch.tor_edges,
        batch.mask_rotate, batch.tor_mask, tr, rot, tor,
    )
    return batch.replace(lig_pos=pos, lig_norm=norm)


def randomize_position(
    batch,
    key: jax.Array,
    no_torsion: bool = False,
    no_random: bool = False,
    tr_sigma_max: float = 5.0,
):
    """Draw the t=1 prior pose: uniform torsions, uniform SO(3) orientation
    about the ligand centroid, N(0, tr_sigma_max) translation (reference
    randomize_position, sampling.py:16-63).
    """
    B, A = batch.lig_pos.shape[:2]
    T = batch.tor_edges.shape[1]
    k_tor, k_rot, k_tr = jax.random.split(key, 3)

    if not no_torsion:
        tor = jax.random.uniform(k_tor, (B, T), minval=-jnp.pi, maxval=jnp.pi)
    else:
        tor = jnp.zeros((B, T))

    # uniform rotation: normalized quaternion
    quat = jax.random.normal(k_rot, (B, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    from ..ops.geometry import matrix_to_axis_angle, quaternion_to_matrix

    rot = matrix_to_axis_angle(quaternion_to_matrix(quat))

    tr = (
        jnp.zeros((B, 3))
        if no_random
        else tr_sigma_max * jax.random.normal(k_tr, (B, 3))
    )

    # reference order: torsions on the input pose, then center+rotate, then
    # translate; a single modify_conformer(tr, rot, tor) applies torsions
    # after the rigid move, but the final distribution is identical because
    # the prior draws are independent and the pose is re-centered.  We keep
    # one fused update and subtract the centroid so the rigid move acts about
    # the origin like the reference.
    m = batch.lig_mask.astype(batch.lig_pos.dtype)
    center = (batch.lig_pos * m[..., None]).sum(1) / jnp.maximum(
        m.sum(1), 1.0
    )[:, None]
    batch = _apply_pose_update(batch, tr - center, rot, tor)
    return batch


@dataclasses.dataclass(frozen=True)
class SamplerSettings:
    inference_steps: int = 20
    actual_steps: Optional[int] = None
    no_random: bool = False
    no_final_step_noise: bool = False
    ode: bool = False
    no_torsion: bool = False
    #: >1 enables per-step candidate resampling ranked by on-device fitness
    #: (reference sampling_phore_with_fitscore, sampling.py:283-424, which
    #: shells out to AncPhore per candidate set per step)
    random_samples: int = 1

    @property
    def steps(self) -> int:
        return self.actual_steps or self.inference_steps


def reverse_diffusion(
    score_fn: Callable,
    batch,
    key: jax.Array,
    schedule: SigmaSchedule,
    settings: SamplerSettings,
    return_trajectory: bool = False,
    fitness_fn: Optional[Callable] = None,
):
    """Run the reverse SDE/ODE.

    Args:
      score_fn: (batch) -> (tr_pred (B,3), rot_pred (B,3), tor_pred (B,T)).
        Typically ``lambda b: model.apply(variables, b)`` with eval-mode
        batchnorm; the caller jits the whole thing.
      batch: randomized ComplexBatch (all poses stacked along B).
      fitness_fn: (batch) -> (B,) pose fitness; required when
        settings.random_samples > 1: each step draws that many candidate
        noise realizations and keeps the best-scoring pose per row (the
        reference's fitscore-guided sampler, but with the AncPhore subprocess
        replaced by the on-device scorer so it stays inside the scan).
    Returns:
      final batch (and the (steps, B, A, 3) position trajectory if requested).
    """
    steps = settings.steps
    ts = t_schedule(settings.inference_steps)[:steps]
    dts = np.diff(np.append(ts, 0.0)) * -1.0  # dt_i = t_i - t_{i+1}; last = t
    is_last = np.zeros(steps, bool)
    is_last[-1] = True
    xs = (
        jnp.asarray(ts, jnp.float32),
        jnp.asarray(dts, jnp.float32),
        jnp.asarray(is_last),
        jax.random.split(key, steps),
    )
    B, T = batch.lig_pos.shape[0], batch.tor_edges.shape[1]

    def step(carry, x):
        b = carry
        t, dt, last, k = x
        b = b.replace(t=jnp.full((B,), t, jnp.float32))
        tr_sigma, rot_sigma, tor_sigma = schedule(t)
        tr_score, rot_score, tor_score = score_fn(b)
        # NaN/inf guard: a trained model never produces these; with garbage
        # weights this keeps the scan finite instead of poisoning every pose
        # (the reference instead catches exceptions and skips the complex,
        # inference.py:199-221).
        tr_score = jnp.nan_to_num(tr_score, posinf=0.0, neginf=0.0)
        rot_score = jnp.nan_to_num(rot_score, posinf=0.0, neginf=0.0)
        tor_score = jnp.nan_to_num(tor_score, posinf=0.0, neginf=0.0)

        g_tr = schedule.g_tr(tr_sigma)
        g_rot = schedule.g_rot(rot_sigma)
        g_tor = schedule.g_tor(tor_sigma)

        k_tr, k_rot, k_tor = jax.random.split(k, 3)
        S = max(settings.random_samples, 1)
        if settings.ode:
            tr_p = 0.5 * g_tr**2 * dt * tr_score
            rot_p = 0.5 * g_rot**2 * dt * rot_score
            tor_p = 0.5 * g_tor**2 * dt * tor_score
            S = 1
        else:
            noise_on = jnp.logical_not(
                jnp.logical_or(settings.no_random, settings.no_final_step_noise & last)
            ).astype(jnp.float32)
            z_tr = jax.random.normal(k_tr, (S, B, 3)) * noise_on
            z_rot = jax.random.normal(k_rot, (S, B, 3)) * noise_on
            z_tor = jax.random.normal(k_tor, (S, B, T)) * noise_on
            sqrt_dt = jnp.sqrt(dt)
            tr_p = g_tr**2 * dt * tr_score + g_tr * sqrt_dt * z_tr
            rot_p = g_rot**2 * dt * rot_score + g_rot * sqrt_dt * z_rot
            tor_p = g_tor**2 * dt * tor_score + g_tor * sqrt_dt * z_tor
        if settings.no_torsion:
            tor_p = jnp.zeros(tor_p.shape[:-1] + (T,)) if tor_p.ndim > 2 else jnp.zeros((B, T))
        # sanity clamps: torsion updates are angles (wrapping is exact);
        # translation/rotation magnitudes are bounded far above anything a
        # trained score model produces, so this only guards un/under-trained
        # weights from overflowing fp32 over the scan.
        tor_p = (tor_p + jnp.pi) % (2 * jnp.pi) - jnp.pi
        tr_p = jnp.clip(tr_p, -50.0, 50.0)
        rot_p = jnp.clip(rot_p, -2 * jnp.pi, 2 * jnp.pi)
        tor_p = tor_p * b.tor_mask

        if S == 1 or fitness_fn is None:
            if tr_p.ndim == 3:  # drop the candidate axis
                tr_p, rot_p, tor_p = tr_p[0], rot_p[0], tor_p[0]
            b = _apply_pose_update(b, tr_p, rot_p, tor_p)
        else:
            # candidate resampling: apply every noise draw, keep the
            # best-scoring pose per row (one model forward, S cheap updates)
            cands = jax.vmap(lambda a, c, d: _apply_pose_update(b, a, c, d))(
                tr_p, rot_p, tor_p
            )
            fits = jax.vmap(fitness_fn)(cands)  # (S, B)
            best = jnp.argmax(fits, axis=0)     # (B,)
            sel = lambda arr: jnp.take_along_axis(
                arr, best.reshape((1, B) + (1,) * (arr.ndim - 2)), axis=0
            )[0]
            b = b.replace(lig_pos=sel(cands.lig_pos), lig_norm=sel(cands.lig_norm))
        y = b.lig_pos if return_trajectory else None
        return b, y

    final, traj = jax.lax.scan(step, batch, xs)
    if return_trajectory:
        return final, traj
    return final


def sample_step(
    score_fn: Callable,
    batch,
    key: jax.Array,
    schedule: SigmaSchedule,
    tr_sigma,
    rot_sigma,
    tor_sigma,
    delta_t: float = 0.05,
    no_random: bool = False,
    ode: bool = False,
):
    """One Euler step at fixed sigmas - the CCSampler building block
    (reference sampling.py:501-559).  Returns (batch', tr_p, rot_p, tor_p)."""
    B, T = batch.lig_pos.shape[0], batch.tor_edges.shape[1]
    tr_score, rot_score, tor_score = score_fn(batch)
    tr_score = jnp.nan_to_num(tr_score, posinf=0.0, neginf=0.0)
    rot_score = jnp.nan_to_num(rot_score, posinf=0.0, neginf=0.0)
    tor_score = jnp.nan_to_num(tor_score, posinf=0.0, neginf=0.0)
    # sigmas may be per-graph arrays (CCSampler path): broadcast over the
    # trailing component axis
    col = lambda g: jnp.asarray(g).reshape(-1, 1) if jnp.ndim(g) else g
    g_tr = col(schedule.g_tr(tr_sigma))
    g_rot = col(schedule.g_rot(rot_sigma))
    g_tor = col(schedule.g_tor(tor_sigma))
    k_tr, k_rot, k_tor = jax.random.split(key, 3)
    noise = 0.0 if no_random else 1.0
    if ode:
        tr_p = 0.5 * g_tr**2 * delta_t * tr_score
        rot_p = 0.5 * g_rot**2 * delta_t * rot_score
        tor_p = 0.5 * g_tor**2 * delta_t * tor_score
    else:
        sq = jnp.sqrt(delta_t)
        tr_p = g_tr**2 * delta_t * tr_score + g_tr * sq * noise * jax.random.normal(k_tr, (B, 3))
        rot_p = g_rot**2 * delta_t * rot_score + g_rot * sq * noise * jax.random.normal(k_rot, (B, 3))
        tor_p = g_tor**2 * delta_t * tor_score + g_tor * sq * noise * jax.random.normal(k_tor, (B, T))
    # same sanity clamps as the reverse-diffusion scan
    tor_p = (tor_p + jnp.pi) % (2 * jnp.pi) - jnp.pi
    tr_p = jnp.clip(tr_p, -50.0, 50.0)
    rot_p = jnp.clip(rot_p, -2 * jnp.pi, 2 * jnp.pi)
    tor_p = tor_p * batch.tor_mask
    return _apply_pose_update(batch, tr_p, rot_p, tor_p), tr_p, rot_p, tor_p
