"""Bucketed batch loader: fixed-shape batches for a jit-compiled train step.

The reference uses PyG DataListLoader with ragged graphs (pdbbind_phore.py:
1279-1285).  Static XLA shapes need bucketing: complexes are grouped by their
(A, P, T) pad signature, shuffled within buckets, and emitted as fixed-size
ComplexBatches - short final batches are padded by repeating samples with a
validity mask carried in meta.
"""

from __future__ import annotations

import collections
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .dataset import PhoreDataset, load_complex
from .graphs import ComplexBatch, concat_batches


class BucketLoader:
    def __init__(
        self,
        dataset: PhoreDataset,
        batch_size: int = 8,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        # bucket by pad signature (cheap: read shapes from the npz header)
        self.buckets: Dict[Tuple[int, int, int], List[int]] = collections.defaultdict(list)
        for i in range(len(dataset)):
            with np.load(dataset.files[i]) as z:
                sig = (z["lig_pos"].shape[1], z["phore_pos"].shape[1], z["tor_edges"].shape[1])
            self.buckets[sig].append(i)

    def __len__(self) -> int:
        n = 0
        for idxs in self.buckets.values():
            full, rem = divmod(len(idxs), self.batch_size)
            n += full + (0 if (self.drop_last or rem == 0) else 1)
        return n

    def __iter__(self) -> Iterator[ComplexBatch]:
        plans: List[List[int]] = []
        for idxs in self.buckets.values():
            order = list(idxs)
            if self.shuffle:
                self.rng.shuffle(order)
            for k in range(0, len(order), self.batch_size):
                chunk = order[k:k + self.batch_size]
                n_real = len(chunk)
                if n_real < self.batch_size:
                    if self.drop_last:
                        continue
                    # repeat-pad so the compiled step sees one batch shape;
                    # repeated rows are flagged invalid for loss/metric weighting
                    pad = [chunk[i % n_real] for i in range(self.batch_size - n_real)]
                    chunk = chunk + pad
                plans.append((chunk, n_real))
        if self.shuffle:
            self.rng.shuffle(plans)
        for chunk, n_real in plans:
            batches = [self.dataset[i] for i in chunk]
            batch = concat_batches(batches)
            if n_real < len(chunk):
                valid = np.zeros(len(chunk), bool)
                valid[:n_real] = True
                batch = batch.replace(valid=valid)
            yield batch
