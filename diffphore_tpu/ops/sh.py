"""Real spherical harmonics, closed form up to l = 2, 'component' normalized.

Replaces e3nn's ``o3.spherical_harmonics(lmax=2, normalize=True,
normalization='component')`` (reference: score_model_phore.py:404,434,737,891)
with plain jnp that XLA fuses into the surrounding elementwise graph.

Component normalization: E_{u~S^2}[Y_lm(u)^2] = 1 for every m, i.e.
Y_l = sqrt(4*pi) * orthonormal_Y_l, so ||Y_l(u)||^2 = 2l+1 for any unit u.

Ordering: m = -l..l with the same real basis as :mod:`.wigner`, i.e.
  l=1 -> sqrt(3) * (y, z, x)     (m=-1,0,+1)
  l=2 -> sqrt(15)*xy, sqrt(15)*yz, sqrt(5)/2*(3z^2-1), sqrt(15)*zx,
         sqrt(15)/2*(x^2-y^2)
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_SQRT3 = math.sqrt(3.0)
_SQRT5 = math.sqrt(5.0)
_SQRT15 = math.sqrt(15.0)

#: sizes of the l = 0, 1, 2 blocks in a concatenated lmax=2 SH vector
SH_DIM_LMAX2 = 9


def normalize_vec(vec: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Safe unit-normalization along the last axis."""
    n = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    return vec / jnp.maximum(n, eps)


def sh_l1(unit: jnp.ndarray) -> jnp.ndarray:
    """l=1 component-normalized SH of unit vectors (..., 3) -> (..., 3)."""
    x, y, z = unit[..., 0], unit[..., 1], unit[..., 2]
    return _SQRT3 * jnp.stack([y, z, x], axis=-1)


def sh_l2(unit: jnp.ndarray) -> jnp.ndarray:
    """l=2 component-normalized SH of unit vectors (..., 3) -> (..., 5)."""
    x, y, z = unit[..., 0], unit[..., 1], unit[..., 2]
    return jnp.stack(
        [
            _SQRT15 * x * y,
            _SQRT15 * y * z,
            _SQRT5 * 0.5 * (3.0 * z * z - 1.0),
            _SQRT15 * z * x,
            _SQRT15 * 0.5 * (x * x - y * y),
        ],
        axis=-1,
    )


def irrep1_to_cartesian(v: jnp.ndarray) -> jnp.ndarray:
    """Convert an l=1 irrep feature (m = -1, 0, +1 ~ (y, z, x)) to a
    Cartesian (x, y, z) vector.  Needed wherever a model's 1o/1e output is
    interpreted geometrically (e.g. the tr/rot score heads)."""
    return jnp.stack([v[..., 2], v[..., 0], v[..., 1]], axis=-1)


def cartesian_to_irrep1(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`irrep1_to_cartesian`."""
    return jnp.stack([v[..., 1], v[..., 2], v[..., 0]], axis=-1)


def spherical_harmonics_lmax2(
    vec: jnp.ndarray, normalize: bool = True, zero_safe: bool = False
) -> jnp.ndarray:
    """Concatenated (Y0 | Y1 | Y2) of shape (..., 9).

    With ``normalize`` the input is unit-normalized first (e3nn
    ``normalize=True`` semantics).  ``zero_safe`` maps zero-length inputs to
    an all-zero SH vector: a fixed nonzero SH of a degenerate direction would
    break rotation equivariance (the reference side-steps this with a
    clip-to-positive hack on the norm channel, score_model_phore.py:877,
    which itself injects a constant direction).
    """
    u = normalize_vec(vec) if normalize else vec
    y0 = jnp.ones(u.shape[:-1] + (1,), dtype=u.dtype)
    out = jnp.concatenate([y0, sh_l1(u), sh_l2(u)], axis=-1)
    if zero_safe:
        nz = jnp.linalg.norm(vec, axis=-1, keepdims=True) > 1e-8
        out = out * nz
    return out
