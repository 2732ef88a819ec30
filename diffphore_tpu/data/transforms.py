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
) -> Tuple[object, ScoreTargets]:
    """Noise a clean batch and return (noised batch, score targets).

    Equivalent to reference apply_noise (pdbbind_phore.py:127-170):
      targets:  tr_score = -tr/sigma^2, rot_score = IGSO3 score at the drawn
      rotation, tor_score = wrapped-normal score at the drawn torsions.
    """
    B = batch.lig_pos.shape[0]
    T = batch.tor_edges.shape[1]
    k_t, k_tr, k_rot, k_tor = jax.random.split(key, 4)
    if t is None:
        t = jax.random.uniform(k_t, (B,))
    tr_sigma, rot_sigma, tor_sigma = schedule(t)

    tr_update = tr_sigma[:, None] * jax.random.normal(k_tr, (B, 3))
    rot_update = so3.sample_vec(k_rot, rot_sigma)
    tor_update = tor_sigma[:, None] * jax.random.normal(k_tor, (B, T))
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
