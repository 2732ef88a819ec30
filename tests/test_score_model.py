"""Score network: shapes, finiteness, SE(3) equivariance, permutation safety.

Equivariance is the core correctness property (reference has no such test):
rotating the complex must co-rotate tr/rot predictions and leave torsion
scores invariant.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.data.graphs import build_complex, repeat_batch
from diffphore_tpu.data.phore import parse_phore
from diffphore_tpu.models import ScoreModel, ScoreModelConfig

SQC = "/root/reference/examples/phore/sQC_QFA_complex.phore"
LIG = "/root/reference/examples/ligands/STK243239.sdf"

CFG = ScoreModelConfig(ns=8, nv=4, num_conv_layers=2, dropout=0.0, compute_dtype="float32")


@pytest.fixture(scope="module")
def complex_batch():
    mol = parse_sdf(LIG)[0].remove_hs()
    phore = parse_phore(SQC)[0]
    c = build_complex("t", mol, phore)
    return c.replace(t=jnp.full((1,), 0.4, jnp.float32))


@pytest.fixture(scope="module")
def model_and_params(complex_batch):
    model = ScoreModel(CFG)
    variables = model.init(jax.random.PRNGKey(0), complex_batch)
    return model, variables


def apply_batch_stats(model, variables, batch):
    """Forward in batch-stats mode: with untrained parameters the eval-mode
    running stats are identity and activations compound to 1e7 over the conv
    stack (the reference's torch BatchNorm behaves the same before training),
    so tests drive the normalizing path."""
    out, _ = model.apply(
        variables, batch, use_running_average=False, mutable=["batch_stats"]
    )
    return out


def test_forward_shapes_and_finiteness(complex_batch, model_and_params):
    model, variables = model_and_params
    tr, rot, tor = apply_batch_stats(model, variables, complex_batch)
    B, T = complex_batch.batch_size, complex_batch.num_torsions
    assert tr.shape == (B, 3) and rot.shape == (B, 3) and tor.shape == (B, T)
    for x in (tr, rot, tor):
        assert bool(jnp.isfinite(x).all())
    # padded torsion slots are zero
    tor_np = np.asarray(tor)
    mask = np.asarray(complex_batch.tor_mask)
    assert np.allclose(tor_np[~mask], 0.0)


def _rotate_batch(batch, R):
    R = jnp.asarray(R, dtype=jnp.float32)
    rot = lambda x: x @ R.T
    return batch.replace(
        lig_pos=rot(batch.lig_pos),
        phore_pos=rot(batch.phore_pos),
        phore_norm=rot(batch.phore_norm),
        lig_norm=rot(batch.lig_norm),
    )


def test_se3_equivariance(complex_batch, model_and_params):
    model, variables = model_and_params
    tr, rot, tor = apply_batch_stats(model, variables, complex_batch)
    R = Rotation.random(random_state=11).as_matrix().astype(np.float32)
    tr2, rot2, tor2 = apply_batch_stats(model, variables, _rotate_batch(complex_batch, R))
    assert np.allclose(np.asarray(tr2), np.asarray(tr) @ R.T, atol=5e-3), (
        np.abs(np.asarray(tr2) - np.asarray(tr) @ R.T).max())
    assert np.allclose(np.asarray(rot2), np.asarray(rot) @ R.T, atol=5e-3)
    assert np.allclose(np.asarray(tor2), np.asarray(tor), atol=5e-3)


def test_batch_consistency(complex_batch, model_and_params):
    """Same complex repeated -> identical outputs per row (masked batchnorm
    and pooling must not leak across the batch in eval mode)."""
    model, variables = model_and_params
    rep = repeat_batch(complex_batch, 3)
    rep = rep.replace(t=jnp.full((3,), 0.4, jnp.float32))
    tr, rot, tor = apply_batch_stats(model, variables, rep)
    assert np.allclose(np.asarray(tr[0]), np.asarray(tr[2]), atol=1e-5)
    assert np.allclose(np.asarray(tor[0]), np.asarray(tor[1]), atol=1e-5)


def test_padding_invariance(model_and_params):
    """Growing the pad sizes must not change predictions."""
    model, variables = model_and_params
    mol = parse_sdf(LIG)[0].remove_hs()
    phore = parse_phore(SQC)[0]
    c1 = build_complex("t", mol, phore).replace(t=jnp.full((1,), 0.4, jnp.float32))
    c2 = build_complex(
        "t", mol, phore, a_pad=c1.num_atoms + 8, p_pad=c1.num_phore + 8,
        t_pad=c1.num_torsions + 4,
    ).replace(t=jnp.full((1,), 0.4, jnp.float32))
    tr1, rot1, tor1 = apply_batch_stats(model, variables, c1)
    tr2, rot2, tor2 = apply_batch_stats(model, variables, c2)
    assert np.allclose(np.asarray(tr1), np.asarray(tr2), atol=2e-4)
    assert np.allclose(np.asarray(rot1), np.asarray(rot2), atol=2e-4)
    n = c1.num_torsions
    assert np.allclose(np.asarray(tor1), np.asarray(tor2)[:, :n], atol=2e-4)


def test_full_config_compiles(complex_batch):
    """The shipped-config model (ns=20, nv=10, 4 layers) initializes and runs."""
    model = ScoreModel(ScoreModelConfig())
    variables = model.init(jax.random.PRNGKey(1), complex_batch)
    tr, rot, tor = jax.jit(
        lambda v, b: model.apply(v, b, use_running_average=False, mutable=["batch_stats"])[0]
    )(variables, complex_batch)
    assert bool(jnp.isfinite(tr).all() and jnp.isfinite(rot).all() and jnp.isfinite(tor).all())


def test_reference_yaml_config_loads():
    import yaml

    with open("/root/reference/weights/diffphore_calibrated_warmuped_ft/model_parameters.yml") as f:
        d = yaml.safe_load(f)
    cfg = ScoreModelConfig.from_reference_yaml(d)
    assert cfg.ns == 20 and cfg.nv == 10 and cfg.num_conv_layers == 4
    assert cfg.atom_weight == "phore" and cfg.scaler == 100.0
    assert cfg.clash_cutoff == (1.0, 2.0, 3.0, 4.0, 5.0)
    assert cfg.tr_sigma_max == 5.0


def test_linear_magnitude_head(complex_batch):
    """magnitude_head='linear' (saddle-free variant): finite, co-rotating
    outputs of the same shapes as the reference-faithful norm-gated head."""
    cfg2 = CFG.__class__(**{**CFG.__dict__, "magnitude_head": "linear"})
    model = ScoreModel(cfg2)
    variables = model.init(jax.random.PRNGKey(0), complex_batch)
    tr, rot, tor = apply_batch_stats(model, variables, complex_batch)
    assert tr.shape == (1, 3) and rot.shape == (1, 3)
    assert bool(jnp.isfinite(tr).all() and jnp.isfinite(rot).all())

    R = jnp.asarray(Rotation.from_euler("xyz", [0.3, -0.5, 0.8]).as_matrix(),
                    jnp.float32)
    rotate = lambda x: jnp.einsum("...i,ji->...j", x, R)
    b2 = complex_batch.replace(
        lig_pos=rotate(complex_batch.lig_pos),
        phore_pos=rotate(complex_batch.phore_pos),
        phore_norm=rotate(complex_batch.phore_norm),
        lig_norm=rotate(complex_batch.lig_norm),
    )
    tr2, rot2, _ = apply_batch_stats(model, variables, b2)
    np.testing.assert_allclose(np.asarray(rotate(tr)), np.asarray(tr2),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rotate(rot)), np.asarray(rot2),
                               rtol=2e-3, atol=2e-4)


def test_pose_group_factoring_exact():
    """pose_group factoring (compute pose-invariant phore tensors once per
    complex, broadcast over poses) is EXACT: a screen-packed batch of
    2 complexes x 4 poses scores identically with pose_group=4 and
    pose_group=1 (VERDICT r3 item 5)."""
    from diffphore_tpu.data.graphs import concat_batches
    from diffphore_tpu.data.phore_sampling import random_ligand_phore

    mol1 = parse_sdf(LIG)[0].remove_hs()
    mol2 = parse_sdf("/root/reference/examples/ligands/STK930543.sdf")[0].remove_hs()
    phore1 = parse_phore(SQC)[0]
    phore2 = random_ligand_phore(mol2, "p2", num_ex=3, seed=7)
    # common bucket pads so the complexes concatenate into one batch
    c1 = build_complex("c1", mol1, phore1, a_pad=32, p_pad=112, t_pad=8)
    c2 = build_complex("c2", mol2, phore2, a_pad=32, p_pad=112, t_pad=8)
    batch = concat_batches([repeat_batch(c1, 4), repeat_batch(c2, 4)])
    batch = batch.replace(t=jnp.full((8,), 0.35, jnp.float32))
    # poses of one complex differ in ligand coordinates only
    key = jax.random.PRNGKey(3)
    jitter = 0.3 * jax.random.normal(key, batch.lig_pos.shape)
    batch = batch.replace(lig_pos=batch.lig_pos + jitter)

    model = ScoreModel(CFG)
    variables = model.init(jax.random.PRNGKey(0), batch)
    # populate batchnorm running stats so eval mode is numerically sane
    for _ in range(5):
        _, st = model.apply(variables, batch, use_running_average=False,
                            mutable=["batch_stats"])
        variables = {**variables, "batch_stats": st["batch_stats"]}

    out_ref = model.apply(variables, batch, use_running_average=True)
    out_fac = model.apply(variables, batch, use_running_average=True,
                          pose_group=4)
    for a, b in zip(out_ref, out_fac):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
