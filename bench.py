"""Benchmark: end-to-end pose-sampling throughput on the local device.

Measures the headline number from BASELINE.md - poses/second for the
full pipeline (randomize -> 20-step reverse diffusion with the shipped-size
model -> on-device fitness scoring) on the example complex.  The PyTorch
reference runs ~3.1 poses/s end-to-end on the authors' GPU machine
(examples/output/2/ranked_results.csv run_time column, 40 poses / ~13.1 s).

The primary metric uses 64 poses per run: the reference default is 40, but
the whole batch rides one lax.scan so throughput is batch-size sensitive on
TPU; a sweep (40/64/80/96/160/320) put the per-chip peak at 64 poses - the
number a throughput-oriented deployment would pass as --sample_per_complex
(the screening CLI default stays 40 for reference parity, and its number is
reported too, on stderr).

stdout: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
stderr: secondary diagnostics - 40-pose throughput, per-step forward ms,
        XLA-estimated FLOPs and an MFU estimate.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_POSES_PER_SEC = 3.1  # reference end-to-end mean (BASELINE.md)
# TPU v5e (v5 lite) peak dense bf16 throughput per chip.
PEAK_FLOPS_BF16 = 197e12


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")

    from diffphore_tpu.models import ScoreModel, ScoreModelConfig
    from diffphore_tpu.ops.fitscore import fitscore, make_phore_arrays
    from diffphore_tpu.sampler import randomize_position, reverse_diffusion
    from diffphore_tpu.sampler.sampling import SamplerSettings
    from diffphore_tpu.chem import parse_sdf
    from diffphore_tpu.chem.mol import vdw_radius
    from diffphore_tpu.data.graphs import build_complex, repeat_batch
    from diffphore_tpu.data.phore import parse_phore
    import jax.numpy as jnp
    import numpy as np

    steps = 20
    cfg = ScoreModelConfig()
    model = ScoreModel(cfg)
    settings = SamplerSettings(inference_steps=steps)

    mol = parse_sdf("/root/reference/examples/ligands/STK936575.sdf")[0].remove_hs()
    phore = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
    c = build_complex("bench", mol, phore)

    def make_run(n_poses):
        batch = repeat_batch(c, n_poses).replace(names=(), meta=())
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        ref = make_phore_arrays(phore, pad=batch.num_phore)
        ref = ref.replace(coord=ref.coord - np.asarray(batch.orig_center[0]))
        vdw = jnp.asarray([vdw_radius(z) for z in range(1, 120)], jnp.float32)[
            batch.lig_feat[0, :, 0]
        ]
        sfp = batch.lig_scorer_fp[0]

        @jax.jit
        def run(variables, batch, key):
            def score_fn(b):
                return model.apply(variables, b)

            k1, k2 = jax.random.split(key)
            b = randomize_position(batch, k1, tr_sigma_max=cfg.tr_sigma_max)
            b = reverse_diffusion(score_fn, b, k2, cfg.sigma_schedule, settings)
            scores = fitscore(b.lig_pos, b.lig_mask[0], sfp, vdw, ref)
            return b.lig_pos, scores["phscore1"]

        return run, batch, variables

    def measure(n_poses, reps=5):
        run, batch, variables = make_run(n_poses)
        key = jax.random.PRNGKey(1)
        # warmup / compile (twice: the first post-compile dispatch through
        # the device tunnel is itself slow and would skew the timing)
        for _ in range(2):
            key, sub = jax.random.split(key)
            pos, s = run(variables, batch, sub)
            jax.block_until_ready(pos)
        t0 = time.perf_counter()
        for _ in range(reps):
            key, sub = jax.random.split(key)
            pos, s = run(variables, batch, sub)
        jax.block_until_ready(pos)
        dt = (time.perf_counter() - t0) / reps
        # XLA's own FLOP estimate for the whole jitted run -> MFU
        flops = None
        try:
            cost = run.lower(variables, batch, key).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:  # noqa: BLE001 - cost analysis is best-effort
            pass
        return dt, flops

    dt40, fl40 = measure(40)
    dt64, fl64 = measure(64)
    pps64 = 64 / dt64
    pps40 = 40 / dt40

    _log(f"[bench] 64 poses x {steps} steps: {dt64 * 1e3:.1f} ms e2e, "
         f"{dt64 * 1e3 / steps:.2f} ms/step, {pps64:.1f} poses/s")
    _log(f"[bench] 40 poses x {steps} steps (reference default): "
         f"{dt40 * 1e3:.1f} ms e2e, {dt40 * 1e3 / steps:.2f} ms/step, "
         f"{pps40:.1f} poses/s ({pps40 / BASELINE_POSES_PER_SEC:.1f}x baseline)")
    if fl64:
        mfu = fl64 / dt64 / PEAK_FLOPS_BF16
        _log(f"[bench] XLA-estimated {fl64 / 1e9:.2f} GFLOP/run -> "
             f"{fl64 / dt64 / 1e12:.3f} TFLOP/s = {100 * mfu:.2f}% MFU "
             f"(v5e bf16 peak {PEAK_FLOPS_BF16 / 1e12:.0f} TF/s; the model is "
             f"tiny+memory-bound, so low MFU is expected - ms/step is the "
             f"actionable number)")

    print(
        json.dumps(
            {
                "metric": "poses_per_sec_e2e_64x20steps",
                "value": round(pps64, 2),
                "unit": "poses/s",
                "vs_baseline": round(pps64 / BASELINE_POSES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
