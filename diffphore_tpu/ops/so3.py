"""IGSO(3) sampling / score tables, device-resident.

Table construction mirrors the truncated-series math of the reference
(/root/reference/src/utils/so3.py) but builds the 1000x2000 grids with two
BLAS matmuls instead of per-epsilon Python loops, and the runtime lookups are
pure jnp gathers/interp so they live inside jitted samplers (the reference
does `.cpu()` numpy lookups in the middle of the model forward,
score_model_phore.py:352).

Tables are built once per machine and cached as .npz under
``~/.cache/diffphore_tpu`` (override with $DIFFPHORE_TPU_CACHE).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

import os as _os

MIN_EPS, MAX_EPS = 0.01, 2.0
# Table resolution.  The reference uses 1000 x 2000 float64 grids; the
# lookups are nearest-neighbor/interp on smooth log-spaced functions, so a
# 512 x 1024 float32 grid reproduces values to <0.5% while keeping the
# device-resident tables small (large constants would otherwise stream
# hundreds of MB to the accelerator at first use).
N_EPS = int(_os.environ.get("DIFFPHORE_SO3_N_EPS", 512))
X_N = int(_os.environ.get("DIFFPHORE_SO3_X_N", 1024))
_L_TRUNC = 2000


def cache_dir() -> str:
    d = os.environ.get(
        "DIFFPHORE_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "diffphore_tpu")
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build_tables() -> dict:
    eps = 10.0 ** np.linspace(np.log10(MIN_EPS), np.log10(MAX_EPS), N_EPS)
    omega = np.linspace(0, np.pi, X_N + 1)[1:]
    ls = np.arange(_L_TRUNC, dtype=np.float64)

    # E[e, l] = exp(-l(l+1) eps_e^2);   expansion = E @ S  with
    # S[l, w] = (2l+1) sin(w(l+1/2)) / sin(w/2)
    E = np.exp(-ls[None, :] * (ls[None, :] + 1.0) * (eps[:, None] ** 2))
    half = ls + 0.5
    lo = np.sin(omega / 2.0)[None, :]
    hi = np.sin(np.outer(half, omega))
    S = (2.0 * ls[:, None] + 1.0) * hi / lo
    expansion = E @ S

    # d/dw log expansion numerator:  (2l+1) (lo*dhi - hi*dlo) / lo^2
    dhi = half[:, None] * np.cos(np.outer(half, omega))
    dlo = 0.5 * np.cos(omega / 2.0)[None, :]
    S2 = (2.0 * ls[:, None] + 1.0) * (lo * dhi - hi * dlo) / lo**2
    score_norms = (E @ S2) / expansion

    pdf = expansion * (1.0 - np.cos(omega)[None, :]) / np.pi
    cdf = np.cumsum(pdf, axis=1) / X_N * np.pi
    exp_score_norms = np.sqrt(
        np.sum(score_norms**2 * pdf, axis=1) / np.sum(pdf, axis=1) / np.pi
    )
    return {
        "omega": omega.astype(np.float32),
        "cdf": cdf.astype(np.float32),
        "score_norms": score_norms.astype(np.float32),
        "exp_score_norms": exp_score_norms.astype(np.float32),
    }


@functools.lru_cache(maxsize=1)
def _tables() -> dict:
    path = os.path.join(cache_dir(), f"so3_tables_v2_{N_EPS}x{X_N}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    t = _build_tables()
    np.savez(path, **t)
    return t


@functools.lru_cache(maxsize=1)
def _device_tables() -> dict:
    # ensure_compile_time_eval: this cache may first be populated inside a jit
    # trace; without escaping the trace the constants would be cached as
    # tracers and leak into later traces.
    with jax.ensure_compile_time_eval():
        return {k: jnp.asarray(v) for k, v in _tables().items()}


def _eps_idx(eps: jnp.ndarray) -> jnp.ndarray:
    """Nearest epsilon-grid index (reference so3.py:71-72 rounding)."""
    x = (jnp.log10(eps) - np.log10(MIN_EPS)) / (np.log10(MAX_EPS) - np.log10(MIN_EPS)) * N_EPS
    return jnp.clip(jnp.round(x).astype(jnp.int32), 0, N_EPS - 1)


def sample(key: jax.Array, eps: jnp.ndarray) -> jnp.ndarray:
    """Sample rotation angles omega ~ IGSO3(eps) by inverse CDF. eps: (...)."""
    t = _device_tables()
    idx = _eps_idx(eps)
    u = jax.random.uniform(key, jnp.shape(eps))
    cdf = t["cdf"][idx]  # (..., X_N)
    interp = jax.vmap(lambda uu, cc: jnp.interp(uu, cc, t["omega"]))
    flat_u, flat_c = u.reshape(-1), cdf.reshape(-1, X_N)
    return interp(flat_u, flat_c).reshape(jnp.shape(eps))


def sample_vec(key: jax.Array, eps: jnp.ndarray) -> jnp.ndarray:
    """Sample axis-angle rotation vectors (..., 3) from IGSO3(eps)."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, jnp.shape(eps) + (3,))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    return axis * sample(k2, eps)[..., None]


def score_vec(eps: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Score of IGSO3 density at rotation vector `vec` (..., 3)."""
    t = _device_tables()
    idx = _eps_idx(eps)
    om = jnp.linalg.norm(vec, axis=-1)
    rows = t["score_norms"][idx]  # (..., X_N)
    interp = jax.vmap(lambda o, r: jnp.interp(o, t["omega"], r))
    mag = interp(om.reshape(-1), rows.reshape(-1, X_N)).reshape(om.shape)
    return mag[..., None] * vec / jnp.maximum(om, 1e-12)[..., None]


def score_norm(eps: jnp.ndarray) -> jnp.ndarray:
    """E[||score||^2]^(1/2) per epsilon - the rot-score scaling table."""
    return _device_tables()["exp_score_norms"][_eps_idx(eps)]
