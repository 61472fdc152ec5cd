"""Batched-table embedding operator.

Counterpart of the reference's fbgemm workload
(``workloads/pytorch/split_table_batched_embeddings_ops.py:33-329``): one op
that looks up T tables in a single batched call.  Build args: (num_tables,
rows, dim, pooling); forward args: (indices[B, T, nnz],).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from param_tpu.microbench.operator import OperatorInterface, register_operator
from param_tpu.ops.embedding import embedding_bag


class BatchedEmbeddingOp(OperatorInterface):
    def __init__(self):
        self.tables = None
        self.pooling = "sum"

    def build(self, num_tables=1, rows=1000, dim=64, pooling="sum"):
        key = jax.random.PRNGKey(0)
        self.tables = jax.random.normal(
            key, (num_tables, rows, dim), jnp.float32
        )
        self.pooling = pooling

    def forward(self, indices):
        assert self.tables is not None, "build() first"

        def one(table, idx):
            out = embedding_bag(table, idx)
            if self.pooling == "mean":
                out = out / idx.shape[-1]
            return out

        # indices: (B, T, nnz) → (B, T, D); unrolled over tables (batched
        # scatter in the backward is ~7.5x slower than per-table scatters)
        outs = [one(self.tables[t], indices[:, t])
                for t in range(self.tables.shape[0])]
        return jnp.stack(outs, axis=1)

    def cleanup(self):
        self.tables = None


register_operator("BatchedEmbedding", BatchedEmbeddingOp())
# reference workload name alias
register_operator("SplitTableBatchedEmbeddingBagsCodegen", BatchedEmbeddingOp())
