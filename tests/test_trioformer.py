"""Trioformer / use_att path + E3Phore experimental model."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.data.graphs import build_complex
from diffphore_tpu.data.phore import parse_phore
from diffphore_tpu.models import ScoreModel, ScoreModelConfig
from diffphore_tpu.models.trioformer import E3Phore

pytestmark = pytest.mark.slow


def _batch():
    mol = parse_sdf("/root/reference/examples/ligands/STK936575.sdf")[0].remove_hs()
    phore = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
    c = build_complex("t", mol, phore)
    return c.replace(t=jnp.full((1,), 0.5, jnp.float32))


def test_use_att_model_runs():
    b = _batch()
    cfg = ScoreModelConfig(ns=8, nv=4, num_conv_layers=2, dropout=0.0,
                           use_att=True, trioformer_layer=2)
    model = ScoreModel(cfg)
    v = model.init(jax.random.PRNGKey(0), b)
    (tr, rot, tor), _ = model.apply(v, b, use_running_average=False,
                                    mutable=["batch_stats"])
    assert tr.shape == (1, 3) and np.isfinite(np.asarray(tr)).all()
    assert np.isfinite(np.asarray(tor)).all()
    # trioformer params actually exist
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    assert any("trioformer" in jax.tree_util.keystr(k) for k, _ in flat)


def test_e3phore_standalone():
    b = _batch()
    model = E3Phore(hidden_dim=8, n_blocks=2)
    v = model.init(jax.random.PRNGKey(0), b)
    h_l, h_p, z = model.apply(v, b)
    assert h_l.shape == (1, b.num_atoms, 8)
    assert z.shape == (1, b.num_atoms, b.num_phore, 8)
    assert np.isfinite(np.asarray(z)).all()


def test_tank_training_step_and_recovery():
    """model_type='tank': loss drops over a few jitted steps, eval step runs,
    and the predicted distance map drives coordinate recovery."""
    from diffphore_tpu.models.trioformer import TankPhore
    from diffphore_tpu.train.tank import (create_tank_train_state,
                                          dis_map_targets,
                                          make_tank_eval_step,
                                          make_tank_train_step)

    b = _batch().replace(names=(), meta=())
    model = TankPhore(hidden_dim=8, n_blocks=1)
    state, tx = create_tank_train_state(model, b, lr=5e-3)
    step = jax.jit(make_tank_train_step(model, tx))
    key = jax.random.PRNGKey(0)
    aff = jnp.asarray([1.5], jnp.float32)
    losses = []
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, m = step(state, b, sub, aff)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    ev = jax.jit(make_tank_eval_step(model))(state.ema_variables, b, aff)
    assert np.isfinite(float(ev["contact_loss"]))
    assert float(ev["affinity_loss"]) >= 0.0

    # BCE contact-classification variant (pred_dis=False)
    step_bce = jax.jit(make_tank_train_step(model, tx, pred_dis=False))
    _, m_bce = step_bce(state, b, key, aff)
    assert np.isfinite(float(m_bce["loss"]))

    # predicted dis_map -> pose via coordinate recovery
    from diffphore_tpu.chem import parse_sdf
    from diffphore_tpu.ops.coord_recovery import (las_distance_matrix,
                                                  recover_coords)

    y_pred, _ = model.apply(state.ema_variables, b)
    mol = parse_sdf("/root/reference/examples/ligands/STK936575.sdf")[0].remove_hs()
    holo, intra_mask = las_distance_matrix(mol)
    A = b.num_atoms  # batch pads atoms; pad the LAS matrices to match
    n = holo.shape[0]
    holo = jnp.pad(holo, ((0, A - n), (0, A - n)))
    intra_mask = jnp.pad(intra_mask, ((0, A - n), (0, A - n)))
    cross_mask = np.asarray(b.lig_mask[0])[:, None] & np.asarray(b.phore_mask[0])[None, :]
    coords, loss = recover_coords(
        jax.random.PRNGKey(1), b.phore_pos[0], jnp.abs(y_pred[0]),
        jnp.asarray(cross_mask), holo, intra_mask, n_init=2,
    )
    assert coords.shape == (A, 3)
    assert np.isfinite(np.asarray(coords)).all()


def test_confidence_model_training_step():
    """--confidence_mode: predictions (fitscore, ph, ex), loss drops over a
    few jitted steps against on-device analytic labels."""
    from diffphore_tpu.cli.pipeline import VDW_TABLE
    from diffphore_tpu.models.confidence import ConfidenceModel
    from diffphore_tpu.models.score_model import ScoreModelConfig
    from diffphore_tpu.train.confidence import (
        confidence_labels, create_confidence_train_state,
        make_confidence_eval_step, make_confidence_train_step)

    b = _batch().replace(names=(), meta=())
    cfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=2, dropout=0.0,
                           compute_dtype="float32")
    model = ConfidenceModel(cfg)
    fit, ph, ex = confidence_labels(b, VDW_TABLE)
    assert np.isfinite(np.asarray(fit)).all()
    state, tx = create_confidence_train_state(model, b, lr=5e-3)
    step = jax.jit(make_confidence_train_step(model, tx, VDW_TABLE))
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(6):
        key, sub = jax.random.split(key)
        state, m = step(state, b, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    ev = jax.jit(make_confidence_eval_step(model, VDW_TABLE, by_total=True))(
        state.ema_variables, b, key)
    assert np.isfinite(float(ev["loss_total"]))
