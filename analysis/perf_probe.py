"""Perf probe on the real TPU: pose-count sweep + per-component timing.

Run AFTER any other TPU job finishes (single TPU process at a time):
    python analysis/perf_probe.py
"""
import json
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

cfg = ScoreModelConfig()
model = ScoreModel(cfg)
settings = SamplerSettings(inference_steps=20)
mol = parse_sdf("/root/reference/examples/ligands/STK936575.sdf")[0].remove_hs()
phore = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
c = build_complex("bench", mol, phore)
print(f"shapes: A={c.num_atoms} P={c.num_phore} T={c.num_torsions}")


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def make_all(n):
    batch = repeat_batch(c, n).replace(names=(), meta=())
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    ref = make_phore_arrays(phore, pad=batch.num_phore)
    ref = ref.replace(coord=ref.coord - np.asarray(batch.orig_center[0]))
    vdw = jnp.asarray([vdw_radius(z) for z in range(1, 120)], jnp.float32)[
        batch.lig_feat[0, :, 0]]
    sfp = batch.lig_scorer_fp[0]
    return batch, variables, ref, vdw, sfp


# ---- pose-count sweep (end-to-end)
for n in (24, 32, 40, 48, 64, 96, 128, 192, 256):
    batch, variables, ref, vdw, sfp = make_all(n)

    @jax.jit
    def run(variables, batch, key):
        k1, k2 = jax.random.split(key)
        b = randomize_position(batch, k1, tr_sigma_max=cfg.tr_sigma_max)
        b = reverse_diffusion(lambda bb: model.apply(variables, bb), b, k2,
                              cfg.sigma_schedule, settings)
        s = fitscore(b.lig_pos, b.lig_mask[0], sfp, vdw, ref)
        return b.lig_pos, s["phscore1"]

    dt = timeit(lambda v, b: run(v, b, jax.random.PRNGKey(1)), variables, batch,
                reps=5)
    print(f"B={n:4d}: {dt*1e3:7.1f} ms e2e  {n/dt:7.1f} poses/s  "
          f"{dt*1e3/20:5.2f} ms/step")

# ---- component timing at B=64
B = 64
batch, variables, ref, vdw, sfp = make_all(B)
batch = batch.replace(t=jnp.full((B,), 0.5, jnp.float32))

fwd = jax.jit(lambda v, b: model.apply(v, b))
print(f"forward only  B={B}: {timeit(fwd, variables, batch)*1e3:.2f} ms")

from diffphore_tpu.ops.rigid import PoseState
from diffphore_tpu.sampler.sampling import _apply_pose_update

upd = jax.jit(lambda b, a, r, t: _apply_pose_update(b, a, r, t))
tr = jnp.zeros((B, 3)); rot = jnp.zeros((B, 3)); tor = jnp.zeros((B, batch.num_torsions))
print(f"pose update   B={B}: {timeit(upd, batch, tr, rot, tor)*1e3:.2f} ms")

fs = jax.jit(lambda pos: fitscore(pos, batch.lig_mask[0], sfp, vdw, ref)["phscore1"])
print(f"fitscore      B={B}: {timeit(fs, batch.lig_pos)*1e3:.2f} ms")

# forward cost analysis
cost = fwd.lower(variables, batch).compile().cost_analysis()
if isinstance(cost, (list, tuple)):
    cost = cost[0]
print("forward flops:", cost.get("flops"), " bytes:", cost.get("bytes accessed"))
