"""Per-buffer HBM traffic attribution for one score-model forward.

VERDICT round 2: the 40-pose forward moves ~15 GB per XLA cost analysis
(~230 MB/pose) for a few-M-param model - "HBM-bound" needs a per-tensor
breakdown before it can be attacked.  This script compiles ONE forward
(the unit the 20-step sampler scan repeats), parses the optimized HLO, and
ranks instructions by the bytes they materialize (output + operand bytes),
aggregated by op kind and by the largest individual buffers.

Run on the TPU:  python analysis/hbm_breakdown.py [n_poses]
(CPU works too but layouts/fusions differ from the TPU compilation.)
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1, "u64": 8, "u32": 4, "u16": 2,
    "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

SHAPE_RE = re.compile(r"\b(f64|f32|bf16|f16|f8e4m3fn|f8e5m2|s64|s32|s16|s8|u64|u32|u16|u8|pred|c64|c128)\[([0-9,]*)\]")


def shape_bytes(m) -> int:
    dt, dims = m.group(1), m.group(2)
    n = 1
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return n * DTYPE_BYTES[dt]


def instr_info(line: str):
    """(op_kind, out_bytes, total_shape_bytes) for one HLO instruction."""
    line = line.strip()
    if "=" not in line or line.startswith(("ROOT", "//")):
        line = line[5:] if line.startswith("ROOT ") else line
    lhs, _, rhs = line.partition(" = ")
    shapes = list(SHAPE_RE.finditer(rhs))
    if not shapes:
        return None
    out_b = shape_bytes(shapes[0])
    tot_b = sum(shape_bytes(s) for s in shapes)
    op = rhs[: rhs.find("(")].strip()
    # strip the leading output shape from the op name
    op = SHAPE_RE.sub("", op).strip().strip(")(").strip()
    kind = op.split(".")[0].split(" ")[-1] or "?"
    return kind, out_b, tot_b, lhs.strip()


def main():
    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    import jax
    import numpy as np

    from diffphore_tpu.chem import parse_sdf
    from diffphore_tpu.data.graphs import build_complex, repeat_batch
    from diffphore_tpu.data.phore import parse_phore
    from diffphore_tpu.models import ScoreModel, ScoreModelConfig

    cfg = ScoreModelConfig()
    model = ScoreModel(cfg)
    mol = parse_sdf("/root/reference/examples/ligands/STK936575.sdf")[0].remove_hs()
    phore = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
    batch = repeat_batch(build_complex("b", mol, phore), n_poses).replace(
        names=(), meta=())
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    fwd = jax.jit(lambda v, b: model.apply(v, b))
    lowered = fwd.lower(variables, batch)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    print(f"== {n_poses}-pose forward, A={batch.num_atoms} P={batch.num_phore} "
          f"T={batch.num_torsions}")
    print(f"XLA cost analysis: {cost.get('bytes accessed', 0) / 1e9:.3f} GB accessed, "
          f"{cost.get('flops', 0) / 1e9:.2f} GFLOP")

    text = compiled.as_text()
    by_kind = defaultdict(lambda: [0, 0])
    buffers = []
    # Only instructions OUTSIDE fusion bodies materialize HBM buffers; track
    # the enclosing computation and skip %fused_computation.* blocks.  Also
    # skip pure aliasing/bookkeeping ops.
    skip_kinds = {"parameter", "bitcast", "tuple", "get-tuple-element",
                  "constant", "after-all"}
    cur_comp = ""
    for line in text.splitlines():
        s = line.strip()
        m = re.match(r"(ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->", s)
        if m and "=" not in s.split("(")[0]:
            cur_comp = m.group(2)
            continue
        if "fused" in cur_comp:
            continue
        info = instr_info(s)
        if info is None:
            continue
        kind, out_b, tot_b, name = info
        if kind in skip_kinds:
            continue
        by_kind[kind][0] += out_b
        by_kind[kind][1] += 1
        buffers.append((out_b, tot_b, kind, name[:60]))

    print("\n-- bytes materialized by op kind (output bytes, count) --")
    for k, (b, c) in sorted(by_kind.items(), key=lambda kv: -kv[1][0])[:15]:
        print(f"{k:<28} {b / 1e6:10.1f} MB   x{c}")

    print("\n-- top 20 individual buffers (output MB / with-operands MB) --")
    for out_b, tot_b, kind, name in sorted(buffers, reverse=True)[:20]:
        print(f"{out_b / 1e6:9.2f} / {tot_b / 1e6:9.2f}  {kind:<22} {name}")


if __name__ == "__main__":
    main()
