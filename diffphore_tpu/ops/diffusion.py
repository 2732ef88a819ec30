"""Diffusion schedule, sigma interpolation and timestep embeddings.

Mirrors /root/reference/src/utils/diffusion_utils.py:16-145 in pure JAX.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SigmaSchedule:
    """Geometric interpolation sigma(t) = min^(1-t) * max^t per group."""

    tr_sigma_min: float = 0.1
    tr_sigma_max: float = 5.0
    rot_sigma_min: float = 0.1
    rot_sigma_max: float = 1.5
    tor_sigma_min: float = 0.0314
    tor_sigma_max: float = 3.14

    def __call__(self, t_tr, t_rot=None, t_tor=None):
        t_rot = t_tr if t_rot is None else t_rot
        t_tor = t_tr if t_tor is None else t_tor
        tr = self.tr_sigma_min ** (1 - t_tr) * self.tr_sigma_max**t_tr
        rot = self.rot_sigma_min ** (1 - t_rot) * self.rot_sigma_max**t_rot
        tor = self.tor_sigma_min ** (1 - t_tor) * self.tor_sigma_max**t_tor
        return tr, rot, tor

    # SDE diffusion coefficients g(t) (reference sampling.py:115-130).
    def g_tr(self, tr_sigma):
        return tr_sigma * math.sqrt(2.0 * math.log(self.tr_sigma_max / self.tr_sigma_min))

    def g_rot(self, rot_sigma):
        return 2.0 * rot_sigma * math.sqrt(math.log(self.rot_sigma_max / self.rot_sigma_min))

    def g_tor(self, tor_sigma):
        return tor_sigma * math.sqrt(2.0 * math.log(self.tor_sigma_max / self.tor_sigma_min))


def t_schedule(inference_steps: int) -> np.ndarray:
    """linspace(1 -> 0), endpoint dropped (reference diffusion_utils.py:135)."""
    return np.linspace(1.0, 0.0, inference_steps + 1)[:-1]


def sinusoidal_embedding(
    t: jnp.ndarray, embedding_dim: int, max_positions: int = 10000
) -> jnp.ndarray:
    """Transformer-style sinusoidal embedding of (possibly fractional) steps.

    Matches reference diffusion_utils.py:82-93 (timesteps pre-scaled by
    ``embedding_scale`` before the call).
    """
    half = embedding_dim // 2
    freq = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(max_positions) / (half - 1))
    )
    emb = t[..., None].astype(jnp.float32) * freq
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def gaussian_fourier_embedding(
    t: jnp.ndarray, embedding_dim: int, scale: float = 1.0, seed: int = 0
) -> jnp.ndarray:
    """Gaussian Fourier noise-level embedding (reference
    diffusion_utils.py:96-110, GaussianFourierProjection).

    The reference draws a frozen non-trainable projection W ~ N(0, scale^2)
    at module construction; here W is derived from a fixed PRNG seed so the
    embedding is deterministic across processes and checkpoints.
    """
    w = jax.random.normal(
        jax.random.PRNGKey(seed), (embedding_dim // 2,), jnp.float32
    ) * scale
    proj = t[..., None].astype(jnp.float32) * w * (2.0 * math.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def timestep_embedding(embedding_type: str, embedding_dim: int, embedding_scale: float = 10000):
    """Factory matching reference get_timestep_embedding
    (diffusion_utils.py:111-133): 'sinusoidal' or 'fourier'."""
    if embedding_type == "sinusoidal":
        return lambda t: sinusoidal_embedding(embedding_scale * t, embedding_dim)
    if embedding_type == "fourier":
        return lambda t: gaussian_fourier_embedding(t, embedding_dim, embedding_scale)
    raise NotImplementedError(embedding_type)
