"""Trioformer / use_att path + E3Phore experimental model."""

import jax
import jax.numpy as jnp
import numpy as np

from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.data.graphs import build_complex
from diffphore_tpu.data.phore import parse_phore
from diffphore_tpu.models import ScoreModel, ScoreModelConfig
from diffphore_tpu.models.trioformer import E3Phore


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
