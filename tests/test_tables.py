"""SO(3) / torus score tables vs analytic small-/large-sigma limits."""

import numpy as np
import jax
import jax.numpy as jnp

from diffphore_tpu.ops import so3, torus


def test_so3_score_norm_small_eps_gaussian_limit():
    # The series exp(-l(l+1)eps^2) is the SO(3) heat kernel at time 2*eps^2,
    # so for small eps the rotvec is ~ N(0, 2 eps^2 I3).  With the reference's
    # score_norm convention (sqrt(E[score^2]/pi), so3.py:62) the limit is
    # sqrt(1.5/pi)/eps.
    for eps in (0.02, 0.05, 0.1):
        got = float(so3.score_norm(jnp.asarray(eps)))
        want = np.sqrt(1.5 / np.pi) / eps
        assert abs(got - want) / want < 0.05, (eps, got, want)


def test_so3_score_vec_small_eps():
    vec = jnp.asarray([0.03, -0.02, 0.01])
    eps = jnp.asarray(0.05)
    got = np.asarray(so3.score_vec(eps, vec))
    want = -np.asarray(vec) / (2 * 0.05**2)  # heat-kernel Gaussian limit
    assert np.allclose(got, want, rtol=0.1)


def test_so3_sample_distribution():
    key = jax.random.PRNGKey(0)
    eps = jnp.full((4000,), 0.5)
    omega = np.asarray(so3.sample(key, eps))
    assert (omega >= 0).all() and (omega <= np.pi).all()
    # mean angle grows with eps; crude sanity window for eps=0.5
    assert 0.4 < omega.mean() < 1.5


def test_torus_score_small_sigma_matches_gaussian():
    sigma = jnp.asarray(0.1)
    x = jnp.asarray([0.05, -0.12, 0.2])
    got = np.asarray(torus.score(x, sigma))
    want = -np.asarray(x) / 0.1**2
    assert np.allclose(got, want, rtol=0.05)


def test_torus_score_norm_limits():
    # small sigma: E[s^2] ~ 1/sigma^2 ; large sigma: uniform, score ~ 0.
    small = float(torus.score_norm(jnp.asarray(0.05)))
    assert abs(small - 1 / 0.05**2) / (1 / 0.05**2) < 0.05
    big = float(torus.score_norm(jnp.asarray(2.0 * np.pi)))
    assert big < 1.5


def test_torus_sample_wraps():
    key = jax.random.PRNGKey(1)
    s = np.asarray(torus.sample(key, jnp.full((1000,), 3.0)))
    assert (s > -np.pi - 1e-6).all() and (s <= np.pi + 1e-6).all()


def test_lookup_functions_jit_and_batch():
    @jax.jit
    def f(eps, vec, x, sig):
        return so3.score_norm(eps), so3.score_vec(eps, vec), torus.score(x, sig)

    eps = jnp.asarray([0.1, 0.5, 1.0])
    vec = jnp.asarray(np.random.default_rng(0).normal(size=(3, 3)), dtype=jnp.float32)
    out = f(eps, vec, jnp.asarray([0.1, 0.2, 0.3]), jnp.asarray([0.5, 0.5, 0.5]))
    assert out[0].shape == (3,) and out[1].shape == (3, 3) and out[2].shape == (3,)
