"""DLRM synthetic data generation.

Counterpart of the reference's ``train/comms/pt/dlrm_data.py`` (RandomDataset
/ SyntheticDataset) and the Zipf/uniform index generators in
``train/compute/pt/pytorch_emb.py:138-160``: produces (dense, indices,
labels) batches with uniform or Zipf-skewed sparse indices.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Tuple

import numpy as np


_zipf_cache = {}


def gen_indices(
    rng: np.random.Generator,
    batch: int,
    num_tables: int,
    nnz: int,
    num_rows: int,
    distribution: str = "uniform",
    zipf_alpha: float = 1.15,
) -> np.ndarray:
    """(batch, num_tables, nnz) int32 indices.

    ``zipf``: ranks drawn from a Zipf law and mapped onto the row space —
    the hot-row skew real recommender traffic shows
    (reference: pytorch_emb.py:138-160).

    Uses the native C++ generators (utils.native, ~10x numpy) when
    libparamdata.so is built; numpy otherwise.
    """
    from param_tpu.utils import native

    seed = int(rng.integers(0, 2**62))
    shape = (batch, num_tables, nnz)
    if distribution == "uniform":
        return native.uniform_indices(seed, num_rows, shape)
    if distribution == "zipf":
        if native.native_available():
            key = (zipf_alpha, num_rows)
            if key not in _zipf_cache:
                _zipf_cache[key] = native.ZipfSampler(zipf_alpha, num_rows)
            return _zipf_cache[key].sample(seed, shape)
        z = rng.zipf(zipf_alpha, size=shape)
        return ((z - 1) % num_rows).astype(np.int32)
    raise ValueError(f"unknown distribution {distribution!r}")


@dataclass
class RandomDataset:
    """Streaming random batches (reference: dlrm_data.py:20-195)."""

    batch: int
    dense_dim: int
    num_tables: int
    nnz: int
    num_rows: int
    num_batches: int = 10
    distribution: str = "uniform"
    seed: int = 0

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        for _ in range(self.num_batches):
            dense = rng.normal(size=(self.batch, self.dense_dim)).astype(np.float32)
            idx = gen_indices(
                rng, self.batch, self.num_tables, self.nnz, self.num_rows,
                self.distribution,
            )
            labels = rng.integers(0, 2, size=(self.batch,)).astype(np.float32)
            yield dense, idx, labels


@dataclass
class SyntheticDataset(RandomDataset):
    """Learnable synthetic data: the label correlates with a random linear
    probe of the features so a DLRM can achieve AUC > 0.5 (used by the AUC
    parity check; reference SyntheticDataset reads trace files —
    dlrm_data.py:197-258 — here we synthesize a planted signal instead)."""

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        w = rng.normal(size=(self.dense_dim,)).astype(np.float32)
        hot = rng.integers(0, self.num_rows, size=(self.num_tables,))
        for _ in range(self.num_batches):
            dense = rng.normal(size=(self.batch, self.dense_dim)).astype(np.float32)
            idx = gen_indices(
                rng, self.batch, self.num_tables, self.nnz, self.num_rows,
                self.distribution,
            )
            # plant signal: correlate label with dense probe + hot-row hits
            score = dense @ w / np.sqrt(self.dense_dim)
            hits = (idx == hot[None, :, None]).sum(axis=(1, 2)).astype(np.float32)
            p = 1.0 / (1.0 + np.exp(-(score + hits - 0.5)))
            labels = (rng.random(self.batch) < p).astype(np.float32)
            yield dense, idx, labels


def data_loader(kind: str, **kwargs):
    """(reference: dlrm_data.py:259-266)"""
    if kind == "random":
        return RandomDataset(**kwargs)
    if kind == "synthetic":
        return SyntheticDataset(**kwargs)
    raise ValueError(f"unknown dataset kind {kind!r}")
