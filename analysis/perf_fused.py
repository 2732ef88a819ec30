"""A/B the fused pallas TP kernel vs the XLA path on the real TPU.

Run with the TPU otherwise idle:  python analysis/perf_fused.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")

from diffphore_tpu.models import ScoreModel, ScoreModelConfig
from diffphore_tpu.ops.fitscore import fitscore, make_phore_arrays
from diffphore_tpu.sampler import randomize_position, reverse_diffusion
from diffphore_tpu.sampler.sampling import SamplerSettings
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.mol import vdw_radius
from diffphore_tpu.data.graphs import build_complex, repeat_batch
from diffphore_tpu.data.phore import parse_phore

settings = SamplerSettings(inference_steps=20)
mol = parse_sdf("/root/reference/examples/ligands/STK936575.sdf")[0].remove_hs()
phore = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
c = build_complex("bench", mol, phore)


def bench(n_poses, fused):
    cfg = ScoreModelConfig(use_pallas_fused=fused)
    model = ScoreModel(cfg)
    batch = repeat_batch(c, n_poses).replace(names=(), meta=())
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    ref = make_phore_arrays(phore, pad=batch.num_phore)
    ref = ref.replace(coord=ref.coord - np.asarray(batch.orig_center[0]))
    vdw = jnp.asarray([vdw_radius(z) for z in range(1, 120)], jnp.float32)[
        batch.lig_feat[0, :, 0]]
    sfp = batch.lig_scorer_fp[0]

    @jax.jit
    def run(variables, batch, key):
        k1, k2 = jax.random.split(key)
        b = randomize_position(batch, k1, tr_sigma_max=cfg.tr_sigma_max)
        b = reverse_diffusion(lambda bb: model.apply(variables, bb), b, k2,
                              cfg.sigma_schedule, settings)
        s = fitscore(b.lig_pos, b.lig_mask[0], sfp, vdw, ref)
        return b.lig_pos, s["phscore1"]

    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, sub = jax.random.split(key)
        out = run(variables, batch, sub)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        key, sub = jax.random.split(key)
        out = run(variables, batch, sub)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    # numeric sanity: scores finite
    assert np.isfinite(np.asarray(out[1])).all()
    return dt, np.asarray(out[1])


for n in (24, 64):
    dx, sx = bench(n, False)
    df, sf = bench(n, True)
    print(f"B={n}: XLA {dx*1e3:7.1f} ms ({n/dx:6.1f} p/s) | "
          f"fused {df*1e3:7.1f} ms ({n/df:6.1f} p/s) | "
          f"speedup {dx/df:.2f}x")

# exactness on TPU (same weights, same key, deterministic forward)
cfg_x = ScoreModelConfig(use_pallas_fused=False, dropout=0.0, compute_dtype="float32")
cfg_f = ScoreModelConfig(use_pallas_fused=True, dropout=0.0, compute_dtype="float32")
batch = repeat_batch(c, 4).replace(names=(), meta=())
batch = batch.replace(t=jnp.full((4,), 0.5, jnp.float32))
mx = ScoreModel(cfg_x)
v = jax.jit(mx.init)(jax.random.PRNGKey(0), batch)
ox = jax.jit(lambda vv, bb: mx.apply(vv, bb))(v, batch)
mf = ScoreModel(cfg_f)
of = jax.jit(lambda vv, bb: mf.apply(vv, bb))(v, batch)
for name, a, b in zip(("tr", "rot", "tor"), ox, of):
    d = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
    s = float(jnp.abs(jnp.asarray(a)).max())
    print(f"{name}: max|xla-fused| = {d:.3e} (scale {s:.3e})")
