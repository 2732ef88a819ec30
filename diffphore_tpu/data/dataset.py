"""PhoreDataset: featurized ligand-pharmacophore complexes with disk caching.

Re-design of the reference PhoreDataset (pdbbind_phore.py:394-1221):
  * records are {'name', 'phore', 'ligand_description', optional 'orig_lig'};
    PDBbind-layout helpers build records from a split file + data dir, and a
    ligand-only mode synthesizes random pharmacophores (ZINC/ChEMBL path).
    A record-level 'phore_seed' (int) forces the random-phore path with that
    seed even when a real phore file is present - used by --phore_augment to
    broaden the (phore, pose) distribution per ligand (augmentation on top
    of the reference's ligand-only sampling machinery).
  * featurization runs in a multiprocessing pool (chunked, resumable) and
    caches each complex as one .npz keyed by a settings+record digest
    (reference: pickled heterograph chunks keyed by CRC32, :459-475).
  * complexes come out as B=1 ComplexBatch pytrees, bucket-padded so the
    loader can concatenate them into fixed shapes.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import multiprocessing
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..chem.sdf import read_molecule
from ..chem.smiles import mol_from_smiles
from ..utils.logging import log_info, log_warn
from .graphs import ComplexBatch, build_complex
from .phore import parse_phore


def _bucket(x: int, step: int, minimum: int) -> int:
    return max(minimum, ((x + step - 1) // step) * step)


@dataclasses.dataclass
class DatasetSettings:
    remove_hs: bool = True
    matching: bool = False
    popsize: int = 20
    maxiter: int = 20
    consider_ex: bool = True
    neighbor_cutoff: float = 5.0
    ex_connected: bool = True
    keep_original: bool = True
    min_phore_num: int = 0
    max_phore_num: int = 0        # 0 = unlimited (reference: 15 for eval)
    max_lig_size: int = 0         # 0 = unlimited
    a_step: int = 8
    p_step: int = 16
    t_step: int = 4
    # Bucket floors: raising these coarsens the shape distribution so a
    # heterogeneous library compiles few train-step variants (each distinct
    # (A, P, T) bucket is one XLA compile) at the cost of extra padding.
    a_min: int = 16
    p_min: int = 16
    t_min: int = 4
    max_atoms: int = 96
    max_phore_points: int = 160
    max_torsions: int = 32
    ligand_only: bool = False     # synthesize random phores from ligands
    seed: int = 0

    def digest(self) -> str:
        return hashlib.md5(json.dumps(dataclasses.asdict(self), sort_keys=True).encode()).hexdigest()[:10]


def _record_key(record: Dict) -> str:
    return hashlib.md5(json.dumps(record, sort_keys=True).encode()).hexdigest()[:16]


def featurize_record(record: Dict, s: DatasetSettings) -> Optional[ComplexBatch]:
    """Featurize one record -> B=1 padded ComplexBatch, or None on failure."""
    name = record.get("name") or os.path.basename(
        str(record.get("ligand_description", "lig"))
    ).split(".")[0]
    desc = record["ligand_description"]
    try:
        pose_idx = record.get("pose_index")
        if pose_idx is not None and (isinstance(pose_idx, float) and np.isnan(pose_idx)):
            pose_idx = None  # pandas NaN for rows without the column
        if os.path.exists(str(desc)) and pose_idx is not None:
            # multi-pose SDF (e.g. AncPhore mapping_process outputs, 40 poses
            # per complex sitting AT the pharmacophore): pick one pose as the
            # clean training conformation
            from ..chem import parse_sdf

            mol = parse_sdf(str(desc))[int(pose_idx)]
            if s.remove_hs:
                mol = mol.remove_hs()
        elif os.path.exists(str(desc)):
            mol = read_molecule(str(desc), remove_hs=s.remove_hs)
        else:
            mol = mol_from_smiles(str(desc))
            from ..chem.embed import embed_molecule

            embed_molecule(mol, seed=s.seed)
        if mol is None or mol.num_atoms < 2:
            return None
        if s.max_lig_size and mol.num_atoms > s.max_lig_size:
            log_warn(f"{name}: ligand too large ({mol.num_atoms} atoms), skipped")
            return None

        conf = record.get("conf_seed")
        try:
            conf = int(conf) if conf is not None and conf == conf else None
        except (TypeError, ValueError):
            conf = None
        if conf is not None:
            # Conformer augmentation (--conf_augment): re-embed the ligand
            # and use the fresh conformer as the ground-truth pose.  This is
            # the reference's ligand-only ChEMBL/ZINC training mode
            # (pdbbind_phore.py:820-918: generate a conformer, derive a
            # random phore from it) generalized to per-record seeds so one
            # ligand yields many (pose, phore) training pairs that differ in
            # torsion space, not just in phore subset.
            from ..chem.embed import embed_molecule

            embed_molecule(mol, seed=conf)

        orig_pos = mol.coords.copy()
        if s.matching:
            from ..chem.conformer_matching import optimize_rotatable_bonds
            from ..chem.embed import embed_molecule

            matched = mol.copy()
            embed_molecule(matched, seed=s.seed)
            rmsd = optimize_rotatable_bonds(matched, orig_pos, s.popsize, s.maxiter)
            mol = matched
        else:
            rmsd = 0.0

        aug = record.get("phore_seed")
        try:
            aug = int(aug) if aug is not None and aug == aug else None
        except (TypeError, ValueError):
            aug = None
        if s.ligand_only or not record.get("phore") or aug is not None \
                or conf is not None:
            from .phore_sampling import random_ligand_phore

            base = s.seed + mol.num_atoms
            try:
                num_ex = int(record.get("aug_num_ex", 5))
            except (TypeError, ValueError):
                num_ex = 5
            if aug is None and conf is None:
                phore_seed = base
            else:
                phore_seed = base + 7919 * (aug or 0) + 104729 * (conf or 0)
            phore = random_ligand_phore(
                mol, name, num_ex=num_ex, seed=phore_seed)
            if phore is None:
                return None
        else:
            phore = parse_phore(str(record["phore"]))[0]

        n_feat = len(phore.features)
        if s.min_phore_num and n_feat < s.min_phore_num:
            return None
        if s.max_phore_num and n_feat > s.max_phore_num:
            return None
        n_points = len(phore.all_points)
        from ..chem.topology import rotatable_bonds

        n_tor = len(rotatable_bonds(mol)[0])
        a_pad = _bucket(mol.num_atoms, s.a_step, s.a_min)
        p_pad = _bucket(n_points, s.p_step, s.p_min)
        t_pad = _bucket(max(n_tor, 1), s.t_step, s.t_min)
        if a_pad > s.max_atoms or p_pad > s.max_phore_points or t_pad > s.max_torsions:
            log_warn(f"{name}: exceeds bucket caps (A={a_pad}, P={p_pad}, T={t_pad}), skipped")
            return None
        return build_complex(
            name, mol, phore, a_pad=a_pad, p_pad=p_pad, t_pad=t_pad,
            orig_pos=orig_pos if s.keep_original else None,
            meta={"phore_file": str(record.get("phore", "")),
                  "ligand_description": str(desc), "rmsd_matching": rmsd},
        )
    except Exception as e:  # noqa: BLE001 - skip-and-log like the reference
        log_warn(f"Featurization failed for `{name}`: {e}")
        return None


_ARRAY_FIELDS = None


def _array_fields() -> List[str]:
    global _ARRAY_FIELDS
    if _ARRAY_FIELDS is None:
        _ARRAY_FIELDS = [
            f.name for f in dataclasses.fields(ComplexBatch)
            if f.name not in ("names", "meta")
        ]
    return _ARRAY_FIELDS


def save_complex(batch: ComplexBatch, path: str) -> None:
    arrays = {k: np.asarray(getattr(batch, k)) for k in _array_fields()}
    meta = dict(batch.meta[0])
    orig = meta.pop("orig_pos", None)
    if orig is not None:
        arrays["__orig_pos"] = np.asarray(orig)
    arrays["__meta"] = np.frombuffer(json.dumps(
        {"name": batch.names[0], **{k: v for k, v in meta.items() if isinstance(v, (str, int, float))}}
    ).encode(), dtype=np.uint8)
    # atomic write (temp + rename): a --featurize_only process may overlap
    # a training run on the same cache dir; a torn npz must never be
    # visible under the final name
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_complex(path: str) -> ComplexBatch:
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta"].tobytes()).decode())
        name = meta.pop("name")
        if "__orig_pos" in z.files:
            meta["orig_pos"] = z["__orig_pos"]
        kwargs = {k: z[k] for k in _array_fields() if k in z.files}
    # caches written before these fields existed get compatible defaults
    kwargs.setdefault("valid", np.ones(1, bool))
    kwargs.setdefault("lig_scorer_fp", kwargs["lig_phorefp"])
    return ComplexBatch(names=(name,), meta=(meta,), **kwargs)


def _worker(args):
    record, settings_dict, cache_file = args
    s = DatasetSettings(**settings_dict)
    batch = featurize_record(record, s)
    if batch is None:
        # negative-cache the skip so later dataset constructions don't
        # refeaturize records that deterministically fail or exceed caps
        with open(cache_file + ".skip", "w") as f:
            f.write("")
        return None
    save_complex(batch, cache_file)
    return cache_file


class Subset:
    """Index view of a PhoreDataset (reference _Subset,
    pdbbind_phore.py:1339-1363): used by the warmup_epochs/warmup_number
    schedule to train the first epochs on fewer samples."""

    def __init__(self, dataset: "PhoreDataset", indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)
        self.files = [dataset.files[i] for i in self.indices]

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int) -> ComplexBatch:
        return self.dataset[self.indices[idx]]


def warmup_subset(dataset, number: int, proportion: float, seed: int = 0):
    """Random warmup subset: ``number`` samples when > 0, else
    ``proportion`` of the dataset (reference warmup_number /
    warmup_propotion flags, parsing.py:51-57)."""
    n = min(number, len(dataset)) if number > 0 else max(
        1, int(proportion * len(dataset)))
    if n >= len(dataset):
        return dataset
    rng = np.random.default_rng(seed)
    return Subset(dataset, rng.permutation(len(dataset))[:n])


class PhoreDataset:
    """A list of featurized complexes, cached one .npz per complex."""

    def __init__(
        self,
        records: Sequence[Dict],
        settings: Optional[DatasetSettings] = None,
        cache_path: str = "data/cache",
        num_workers: int = 1,
        name: str = "dataset",
        ram_cache: bool = False,
    ):
        self.settings = settings or DatasetSettings()
        self.records = list(records)
        self.cache_dir = os.path.join(
            cache_path, f"{name}_{self.settings.digest()}"
        )
        os.makedirs(self.cache_dir, exist_ok=True)
        self.files: List[str] = []
        # in-RAM complex cache: a training epoch re-reads every .npz once
        # per epoch (thousands of decompress+parse calls on a 1-core host
        # feeding a fast chip); memoizing costs ~100 KB per complex
        self._ram: Optional[Dict[int, ComplexBatch]] = {} if ram_cache else None
        self._preprocess(num_workers)

    def _preprocess(self, num_workers: int) -> None:
        todo = []
        for r in self.records:
            f = os.path.join(self.cache_dir, _record_key(r) + ".npz")
            if os.path.exists(f):
                self.files.append(f)
            elif not os.path.exists(f + ".skip"):
                todo.append((r, dataclasses.asdict(self.settings), f))
        if todo:
            log_info(f"Featurizing {len(todo)} complexes "
                     f"({len(self.records) - len(todo)} cached) -> {self.cache_dir}")
            if num_workers > 1:
                # close+join rather than the context manager: Pool.__exit__
                # calls terminate(), which kills maxtasksperchild respawns
                # mid-queue-write and spams BrokenPipeError tracebacks.
                pool = multiprocessing.Pool(num_workers, maxtasksperchild=32)
                try:
                    results = pool.map(_worker, todo)
                finally:
                    pool.close()
                    pool.join()
            else:
                results = [_worker(t) for t in todo]
            self.files.extend(f for f in results if f)
        log_info(f"Dataset ready: {len(self.files)}/{len(self.records)} complexes")

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> ComplexBatch:
        if self._ram is not None:
            hit = self._ram.get(idx)
            if hit is None:
                hit = self._ram[idx] = load_complex(self.files[idx])
            return hit
        return load_complex(self.files[idx])


# ---------------------------------------------------------------- records IO
def records_from_csv(path: str) -> List[Dict]:
    import pandas as pd

    rows = pd.read_csv(path).drop_duplicates().to_dict("records")
    # Drop NaN cells (rows without a value for an optional column such as
    # pose_index / conf_seed): the record dict is the featurization cache
    # key, so a `conf_seed=NaN` entry must hash identically to a record
    # from a CSV without the column at all.
    return [
        {k: v for k, v in r.items() if not (isinstance(v, float) and np.isnan(v))}
        for r in rows
    ]


def records_from_pdbbind_split(
    split_file: str, data_dir: str, flag: str = "phore"
) -> List[Dict]:
    """PDBbind layout: {data_dir}/{flag}/{name}/{name}_complex.phore +
    {data_dir}/ligands/{name}_ligand.(sdf|mol2) (reference pdbbind_phore.py
    read_mol conventions)."""
    names = [l.strip() for l in open(split_file) if l.strip()]
    records = []
    for n in names:
        phore = os.path.join(data_dir, flag, n, f"{n}_complex.phore")
        lig = None
        for cand in (
            os.path.join(data_dir, n, f"{n}_ligand.sdf"),
            os.path.join(data_dir, n, f"{n}_ligand.mol2"),
            os.path.join(data_dir, "ligands", f"{n}_ligand.sdf"),
        ):
            if os.path.exists(cand):
                lig = cand
                break
        if lig and os.path.exists(phore):
            records.append({"name": n, "phore": phore, "ligand_description": lig})
    return records
