"""Small runtime utilities mirroring reference utils/utils.py odds and ends."""

from __future__ import annotations

import contextlib
import os
import random
import signal
from typing import List, Optional

import numpy as np
import yaml


def read_strings_from_txt(path: str) -> List[str]:
    """Non-empty stripped lines (reference utils.py:84-88)."""
    with open(path) as f:
        return [l.strip() for l in f if l.strip()]


def save_yaml_file(path: str, content) -> None:
    """YAML dump with namespace support (reference utils.py:91-97)."""
    if not isinstance(content, (dict, list)):
        content = vars(content)
    with open(path, "w") as f:
        yaml.safe_dump(content, f, sort_keys=True)


def set_seed(seed: int) -> None:
    """Global host-side seeding (reference inference.py:370-379).  Device
    randomness is already explicit jax.random keys; this pins the remaining
    numpy/python RNG used by host featurization."""
    random.seed(seed)
    np.random.seed(seed)


@contextlib.contextmanager
def time_limit(seconds: float):
    """SIGALRM-based timeout guard (reference utils.py:237-246)."""

    def handler(signum, frame):
        raise TimeoutError(f"Timed out after {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.setitimer(signal.ITIMER_REAL, seconds)
    try:
        yield
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


def get_obrmsd(ref_file: str, pose_file: str, obrms_binary: str = "obrms") -> Optional[List[float]]:
    """OpenBabel obrms bridge (reference utils.py:22-49).  obrms is an
    external binary; when absent, fall back to the native symmetry RMSD."""
    import shutil
    import subprocess

    if shutil.which(obrms_binary):
        try:
            out = subprocess.run([obrms_binary, ref_file, pose_file],
                                 capture_output=True, text=True, timeout=300)
            return [float(l.split()[-1]) for l in out.stdout.splitlines() if l.strip()]
        except (subprocess.SubprocessError, ValueError, OSError):
            return None
    from ..chem.rmsd import symmetry_rmsd
    from ..chem.sdf import parse_sdf

    ref = parse_sdf(ref_file)
    poses = parse_sdf(pose_file)
    if not ref or not poses:
        return None
    r = ref[0].remove_hs()
    out = []
    for p in poses:
        p = p.remove_hs()
        if p.num_atoms == r.num_atoms:
            out.append(symmetry_rmsd(r, r.coords, p.coords))
    return out
