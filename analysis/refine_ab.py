"""Measure whether local rigid pose refinement closes the fitscore gap.

The round-2/3 identification work concluded AncPhore's remaining scoring gap
comes from an internal mapping step "and likely internal pose refinement" —
but the refinement hypothesis was never measured.  This script tests it
directly: each golden pose is locally refined by gradient ascent on PhScore1
(= ov_pct - ex_pct) over the 6 rigid degrees of freedom (axis-angle rotation
about the pose centroid + translation), then the REFINED score is compared
against the golden AncPhore PhScore1 rankings on all 15 complexes / 600
poses — the same within-complex / cross-complex Spearman axes as
analysis/assignment_ab.py.

If AncPhore optimizes each conformer's rigid placement before scoring, the
refined score should rank closer to the golden columns than the in-place
score (0.81 within / 0.75 cross today).

Run: PYTHONPATH= JAX_PLATFORMS=cpu python analysis/refine_ab.py
"""

import glob
import os
import sys

import numpy as np
from scipy.stats import spearmanr

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.mol import vdw_radius
from diffphore_tpu.chem.pharmacophore_rules import scoring_phore_fp
from diffphore_tpu.data.phore import parse_phore
from diffphore_tpu.ops.fitscore import fitscore, make_phore_arrays
from diffphore_tpu.ops.geometry import axis_angle_to_matrix

BASE = "/root/reference/examples/output/2/mapping_process"
SQC = "/root/reference/examples/phore/sQC_QFA_complex.phore"

STEPS = 60
LR = 0.05  # Angstrom-scale step on translation; radians on rotation


def make_refiner(ref, fp, vdw, mask):
    fp = jnp.asarray(fp)
    vdw = jnp.asarray(vdw)
    mask = jnp.asarray(mask)

    def score_one(coords):
        s = fitscore(coords[None], mask, fp, vdw, ref)
        return s["phscore1"][0]

    def apply_rigid(coords, rotvec, tr):
        center = coords.mean(0)
        R = axis_angle_to_matrix(rotvec)
        return (coords - center) @ R.T + center + tr

    def objective(params, coords0):
        return score_one(apply_rigid(coords0, params[:3], params[3:]))

    grad = jax.grad(objective)

    def refine(coords0):
        params = jnp.zeros(6)
        # plain gradient ascent with per-block step scaling; stays in the
        # local basin (no momentum, bounded steps)
        def body(params, _):
            g = grad(params, coords0)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            scale = jnp.array([1.0, 1.0, 1.0, 4.0, 4.0, 4.0])
            params = params + LR * scale * g
            return params, None

        params, _ = jax.lax.scan(body, params, None, length=STEPS)
        return objective(params, coords0), params

    return jax.jit(jax.vmap(refine))


def main():
    phore = parse_phore(SQC)[0]
    ref = make_phore_arrays(phore)
    within_raw, within_ref = [], []
    mx_raw, mx_ref, gold_mx = [], [], []
    shift_all = []
    for d in sorted(glob.glob(os.path.join(BASE, "*/"))):
        scores = glob.glob(os.path.join(d, "*.score"))
        sdfs = glob.glob(os.path.join(d, "*.sdf"))
        if not scores or not sdfs:
            continue
        rows = [l.strip().split("\t") for l in open(scores[0])]
        gold = np.array([float(r[-4]) for r in rows])
        poses = parse_sdf(sdfs[0])
        mol = poses[0]
        fp = np.asarray(scoring_phore_fp(mol), np.float32)
        coords = jnp.asarray(
            np.stack([p.coords for p in poses]).astype(np.float32)
        )
        vdw = np.asarray([vdw_radius(a.atomic_num) for a in mol.atoms], np.float32)
        mask = np.ones(mol.num_atoms, bool)

        s_raw = fitscore(coords, jnp.asarray(mask), jnp.asarray(fp), jnp.asarray(vdw), ref)
        raw = np.asarray(s_raw["phscore1"])

        refiner = make_refiner(ref, fp, vdw, mask)
        refined, params = refiner(coords)
        refined = np.asarray(refined)
        params = np.asarray(params)
        shift_all.append(np.linalg.norm(params[:, 3:], axis=1))

        name = os.path.basename(d.rstrip("/"))
        w_raw = spearmanr(raw, gold).correlation
        w_ref = spearmanr(refined, gold).correlation
        within_raw.append(w_raw)
        within_ref.append(w_ref)
        mx_raw.append(raw.max())
        mx_ref.append(refined.max())
        gold_mx.append(gold.max())
        print(
            f"{name}: within raw={w_raw:.3f} refined={w_ref:.3f}  "
            f"max raw={raw.max():.3f} refined={refined.max():.3f} gold={gold.max():.3f}  "
            f"median |t| shift={np.median(shift_all[-1]):.2f} A"
        )

    c_raw = spearmanr(mx_raw, gold_mx).correlation
    c_ref = spearmanr(mx_ref, gold_mx).correlation
    print("\n=== summary (15 complexes, 600 poses) ===")
    print(f"within-complex Spearman: raw={np.mean(within_raw):.3f}  refined={np.mean(within_ref):.3f}")
    print(f"cross-complex Spearman:  raw={c_raw:.3f}  refined={c_ref:.3f}")
    print(f"median rigid shift over all poses: {np.median(np.concatenate(shift_all)):.2f} A")


if __name__ == "__main__":
    main()
