"""On-device forward-diffusion noise transform.

The reference noises each training sample inside CPU dataloader workers
(NoiseTransformPhore, pdbbind_phore.py:36-233).  TPU-native inversion: the
clean batch is noised *inside the jitted train step* - per-graph t ~ U(0,1),
tr ~ N(0, sigma_tr), rot ~ IGSO3(sigma_rot), tor ~ N(0, sigma_tor) - and the
matching score targets are computed from the device-resident tables.

The calibrated-conformation-sampler branch (sample_from_infer) lives in
train/ccsampler.py and composes with this module.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import so3, torus
from ..ops.diffusion import SigmaSchedule
from ..sampler.sampling import _apply_pose_update
from ..train.losses import ScoreTargets


def apply_noise(
    batch,
    key: jax.Array,
    schedule: SigmaSchedule,
    t: jnp.ndarray | None = None,
    no_torsion: bool = False,
    reject_prob: float = 0.0,
    max_reject_tries: int = 8,
) -> Tuple[object, ScoreTargets]:
    """Noise a clean batch and return (noised batch, score targets).

    Equivalent to reference apply_noise (pdbbind_phore.py:127-170):
      targets:  tr_score = -tr/sigma^2, rot_score = IGSO3 score at the drawn
      rotation, tor_score = wrapped-normal score at the drawn torsions.

    ``reject_prob`` > 0 enables the curriculum rejection of
    sample_modification (pdbbind_phore.py:184-223): with that probability a
    draw whose normalized translation magnitude exceeds the rotation /
    torsion magnitudes (or rotation exceeds torsion) is resampled - here as
    a fixed number of vectorized redraws with first-accepted selection
    (device-friendly bound instead of the reference's unbounded loop).
    """
    B = batch.lig_pos.shape[0]
    T = batch.tor_edges.shape[1]
    k_t, k_tr, k_rot, k_tor, k_rej = jax.random.split(key, 5)
    if t is None:
        t = jax.random.uniform(k_t, (B,))
    tr_sigma, rot_sigma, tor_sigma = schedule(t)

    # static gate: reject_prob may be a traced scalar when rejection is
    # enabled; the draw count must stay static
    enable_reject = not (isinstance(reject_prob, (int, float)) and reject_prob <= 0)
    K = max_reject_tries if enable_reject else 1
    tr_draws = tr_sigma[None, :, None] * jax.random.normal(k_tr, (K, B, 3))
    rot_draws = so3.sample_vec(
        k_rot, jnp.broadcast_to(rot_sigma, (K, B))
    )
    tor_draws = tor_sigma[None, :, None] * jax.random.normal(k_tor, (K, B, T))

    if enable_reject:
        x1, x2 = jax.random.uniform(k_rej, (2, K, B))
        T_ = jnp.linalg.norm(tr_draws, axis=-1) / tr_sigma
        R_ = jnp.linalg.norm(rot_draws, axis=-1) / rot_sigma
        n_tor = jnp.maximum(batch.tor_mask.sum(-1), 1)
        Theta_ = (jnp.abs(tor_draws) * batch.tor_mask).sum(-1) / n_tor / tor_sigma
        has_tor = batch.tor_mask.any(-1)
        rej = (x1 <= reject_prob) & ((T_ > R_) | (has_tor & (T_ > Theta_)))
        rej = rej | ((x2 <= reject_prob) & has_tor & (R_ > Theta_))
        # first accepted draw per row; fall back to the last draw
        accept = ~rej
        first = jnp.argmax(accept, axis=0)
        first = jnp.where(accept.any(0), first, K - 1)
    else:
        first = jnp.zeros((B,), jnp.int32)
    pick = lambda d: jnp.take_along_axis(
        d, first.reshape((1, B) + (1,) * (d.ndim - 2)), axis=0
    )[0]
    tr_update = pick(tr_draws)
    rot_update = pick(rot_draws)
    tor_update = pick(tor_draws)
    if no_torsion:
        tor_update = jnp.zeros((B, T))
    tor_update = tor_update * batch.tor_mask

    noised = _apply_pose_update(batch, tr_update, rot_update, tor_update)
    noised = noised.replace(t=t)

    targets = ScoreTargets(
        tr_score=-tr_update / tr_sigma[:, None] ** 2,
        rot_score=so3.score_vec(rot_sigma, rot_update),
        tor_score=torus.score(tor_update, tor_sigma[:, None]) * batch.tor_mask,
        tor_sigma=tor_sigma,
    )
    return noised, targets
