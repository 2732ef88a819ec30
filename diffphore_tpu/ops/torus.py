"""Wrapped-normal (torus / SO(2)) score tables, device-resident.

Math mirrors /root/reference/src/utils/torus.py (5001x5001 log-spaced grids,
truncated wrapped-normal series with N=100 images).  Deviations, both
deliberate:
  * E[score^2] per sigma is computed by deterministic trapezoid quadrature of
    p(x) s(x)^2 on the existing grid instead of the reference's 10k-sample
    Monte-Carlo draw - reproducible and more accurate.
  * Runtime lookups are jnp gathers so they run inside jitted code (the
    reference calls numpy on `.cpu()` tensors inside the forward pass,
    score_model_phore.py:376).
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

from .so3 import cache_dir

import os as _os

X_MIN = 1e-5
SIGMA_MIN, SIGMA_MAX = 3e-3, 2.0
# Reduced-resolution grids (reference: 5001 x 5001 float64; see ops/so3.py
# for the rationale - the lookup functions are smooth in log space).
X_N = int(_os.environ.get("DIFFPHORE_TORUS_X_N", 1024))
SIGMA_N = int(_os.environ.get("DIFFPHORE_TORUS_SIGMA_N", 1024))
# The reference sums 201 wrapped images (torus.py:39); for sigma <= 2*pi the
# terms beyond |i| ~ 12 are below float64 epsilon (exp(-i^2/2) at sigma_max),
# so 16 images reproduce the table to machine precision at ~6x less build time.
_N_IMAGES = 16


def _build_tables() -> dict:
    x = 10.0 ** np.linspace(np.log10(X_MIN), 0, X_N + 1) * np.pi  # (X_N+1,)
    sigma = 10.0 ** np.linspace(np.log10(SIGMA_MIN), np.log10(SIGMA_MAX), SIGMA_N + 1) * np.pi

    p = np.zeros((SIGMA_N + 1, X_N + 1))
    grad = np.zeros_like(p)
    # stable score: factor out the dominant image's exponent so the
    # grad/p ratio never becomes 0/0 at small sigma (the reference's table
    # has NaNs there, torus.py:42; lookups just never hit them).
    p_shift = np.zeros_like(p)
    grad_shift = np.zeros_like(p)
    inv_var = 1.0 / sigma[:, None] ** 2
    images = np.arange(-_N_IMAGES, _N_IMAGES + 1)
    z = x[None, :] + 2.0 * np.pi * images[:, None, None]  # (I, 1, X)
    z2_min = (z**2).min(axis=0)  # (1, X): dominant image per x
    for i in range(len(images)):
        xi = z[i]
        e = np.exp(-0.5 * xi**2 * inv_var)
        p += e
        grad += xi * inv_var * e
        e_s = np.exp(-0.5 * (xi**2 - z2_min) * inv_var)
        p_shift += e_s
        grad_shift += xi * inv_var * e_s
    score = grad_shift / p_shift

    # E[score(x; sigma)^2] under the wrapped normal, by symmetry 2x the
    # integral over (0, pi] normalized by the mass there.
    num = np.trapezoid(p * score**2, x, axis=1)
    den = np.trapezoid(p, x, axis=1)
    score_norm = num / den
    return {
        "p": p.astype(np.float32),
        "score": score.astype(np.float32),
        "score_norm": score_norm.astype(np.float32),
    }


@functools.lru_cache(maxsize=1)
def _tables() -> dict:
    path = os.path.join(cache_dir(), f"torus_tables_v2_{SIGMA_N}x{X_N}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    t = _build_tables()
    np.savez(path, **t)
    return t


@functools.lru_cache(maxsize=1)
def _device_tables() -> dict:
    # See so3._device_tables: must escape any enclosing jit trace.
    import jax

    with jax.ensure_compile_time_eval():
        return {k: jnp.asarray(v) for k, v in _tables().items()}


def _x_idx(x: jnp.ndarray) -> jnp.ndarray:
    xx = jnp.log(jnp.maximum(jnp.abs(x), 1e-30) / jnp.pi)
    xx = (xx - np.log(X_MIN)) / (0.0 - np.log(X_MIN)) * X_N
    return jnp.clip(jnp.round(xx), 0, X_N).astype(jnp.int32)


def _sigma_idx(sigma: jnp.ndarray) -> jnp.ndarray:
    s = jnp.log(sigma / jnp.pi)
    s = (s - np.log(SIGMA_MIN)) / (np.log(SIGMA_MAX) - np.log(SIGMA_MIN)) * SIGMA_N
    return jnp.clip(jnp.round(s), 0, SIGMA_N).astype(jnp.int32)


def wrap(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to (-pi, pi]."""
    return (x + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def score(x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """d/dx log p_wrapped-normal(x; sigma); broadcasts x against sigma."""
    x = wrap(x)
    sign = jnp.sign(x)
    t = _device_tables()
    return -sign * t["score"][_sigma_idx(sigma), _x_idx(x)]


def p(x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized wrapped-normal density at x."""
    t = _device_tables()
    return t["p"][_sigma_idx(sigma), _x_idx(wrap(x))]


def score_norm(sigma: jnp.ndarray) -> jnp.ndarray:
    """E[score^2] per sigma (the torsion-score scaling table)."""
    return _device_tables()["score_norm"][_sigma_idx(sigma)]


def sample(key, sigma: jnp.ndarray) -> jnp.ndarray:
    """Sample from the wrapped normal: wrap(sigma * N(0,1))."""
    import jax

    return wrap(sigma * jax.random.normal(key, jnp.shape(sigma)))
