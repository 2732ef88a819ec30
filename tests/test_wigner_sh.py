"""Wigner-3j + spherical harmonics: algebraic identities and equivariance."""

import numpy as np
import pytest

from diffphore_tpu.ops import sh
from diffphore_tpu.ops.wigner import wigner_3j

rng = np.random.default_rng(0)


def random_rotation():
    from scipy.spatial.transform import Rotation

    return Rotation.random(random_state=rng.integers(1 << 30)).as_matrix()


def sh_l(unit, l):
    import jax.numpy as jnp

    u = jnp.asarray(unit)
    if l == 0:
        return np.ones(unit.shape[:-1] + (1,))
    if l == 1:
        return np.asarray(sh.sh_l1(u))
    if l == 2:
        return np.asarray(sh.sh_l2(u))
    raise ValueError(l)


def wigner_D(l, R, n=64):
    """Real Wigner-D from SH samples: Y_l(R u) = D Y_l(u), solved by lstsq."""
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    Y = sh_l(u, l)
    YR = sh_l(u @ R.T, l)
    D, *_ = np.linalg.lstsq(Y, YR, rcond=None)
    return D.T


def test_w3j_110_is_dot_product():
    C = wigner_3j(1, 1, 0)[:, :, 0]
    assert np.allclose(C, C[0, 0] * np.eye(3), atol=1e-12)
    assert np.isclose(np.abs(C[0, 0]), 1 / np.sqrt(3))


def test_w3j_111_is_cross_product_like():
    C = wigner_3j(1, 1, 1)
    # fully antisymmetric 3-tensor
    assert np.allclose(C, -np.transpose(C, (1, 0, 2)), atol=1e-12)
    assert np.allclose(C, -np.transpose(C, (0, 2, 1)), atol=1e-12)


def test_sh_component_normalization():
    u = rng.normal(size=(2000, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    for l in (1, 2):
        Y = sh_l(u, l)
        # ||Y_l(u)||^2 == 2l+1 pointwise (addition theorem)
        assert np.allclose((Y**2).sum(-1), 2 * l + 1, atol=1e-4)


def test_sh_squared_couples_to_l2_via_w3j():
    """w3j(1,1,2)-contraction of Y1 x Y1 must be parallel to Y2 pointwise."""
    u = rng.normal(size=(32, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    y1, y2 = sh_l(u, 1), sh_l(u, 2)
    C = wigner_3j(1, 1, 2)
    coupled = np.einsum("ni,nj,ijk->nk", y1, y1, C)
    ratio = coupled / y2
    assert np.allclose(ratio, ratio[:, :1], atol=1e-5)


@pytest.mark.parametrize("lll", [(1, 1, 0), (1, 1, 1), (1, 1, 2), (1, 2, 1), (2, 2, 0), (2, 2, 1), (2, 2, 2), (0, 2, 2)])
def test_w3j_equivariance(lll):
    l1, l2, l3 = lll
    C = wigner_3j(l1, l2, l3)
    R = random_rotation()
    D1, D2, D3 = wigner_D(l1, R), wigner_D(l2, R), wigner_D(l3, R)
    # invariance: C = D1^T C' with C'[a,b,c] = sum C[i,j,k] D1[i,a] D2[j,b] D3[k,c]
    Crot = np.einsum("ijk,ia,jb,kc->abc", C, D1, D2, D3)
    assert np.allclose(Crot, C, atol=1e-5)


def test_sh_rotation_equivariance():
    R = random_rotation()
    u = rng.normal(size=(16, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    for l in (1, 2):
        D = wigner_D(l, R)
        assert np.allclose(sh_l(u @ R.T, l), sh_l(u, l) @ D.T, atol=1e-5)
        # D must be orthogonal
        assert np.allclose(D @ D.T, np.eye(2 * l + 1), atol=1e-5)
