"""DLRM AUC parity: our JAX model vs an independent torch implementation.

BASELINE.md target: "AUC of a small DLRM-style model matching reference
within run-to-run variance."  Both models are trained on the SAME synthetic
planted-signal batches; their held-out AUCs must agree within the
run-to-run band.  (The torch model below is written from scratch against
the DLRM architecture description — embedding bags, bottom/top MLP, dot
interaction — not taken from any external implementation.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from param_tpu.models.dlrm import DlrmConfig, DlrmModel, init_dlrm_params
from param_tpu.models.dlrm_data import SyntheticDataset


def auc_score(logits: np.ndarray, labels: np.ndarray) -> float:
    order = np.argsort(logits)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(len(logits))
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float((ranks[pos].sum() - n_pos * (n_pos - 1) / 2) / (n_pos * n_neg))


CFG = dict(
    num_tables=8, rows_per_table=300, emb_dim=16, nnz=4,
    dense_dim=16, bot_mlp=[32, 16], top_mlp=[32, 1], batch=256,
)
N_BATCHES = 30
LR = 0.1


def make_batches(seed):
    ds = SyntheticDataset(
        batch=CFG["batch"], dense_dim=CFG["dense_dim"],
        num_tables=CFG["num_tables"], nnz=CFG["nnz"],
        num_rows=CFG["rows_per_table"], num_batches=N_BATCHES, seed=seed,
    )
    return list(ds)


def train_jax(batches, seed=0):
    cfg = DlrmConfig(**CFG)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
    model = DlrmModel(cfg, mesh)
    params = init_dlrm_params(jax.random.PRNGKey(seed), cfg)
    opt = optax.adagrad(LR)
    step = model.make_train_step(opt)
    params, _ = model.place(params, batches[0])
    st = opt.init(params)
    for dense, idx, labels in batches[:-1]:
        _, b = model.place(jax.tree.map(np.asarray, params), (dense, idx, labels))
        params, st, _ = step(params, st, *b)
    dense, idx, labels = batches[-1]
    logits = np.asarray(
        DlrmModel(cfg).forward(
            jax.tree.map(np.asarray, params), jnp.asarray(dense), jnp.asarray(idx)
        )
    )
    return auc_score(logits, labels)


def train_torch(batches, seed=0):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    T, E, D = CFG["num_tables"], CFG["rows_per_table"], CFG["emb_dim"]

    class TorchDlrm(nn.Module):
        def __init__(self):
            super().__init__()
            self.tables = nn.ModuleList(
                [nn.EmbeddingBag(E, D, mode="sum") for _ in range(T)]
            )
            # match the jax init scale (N(0, 1/sqrt(E))) — torch's default
            # N(0,1) embedding init drowns the dense signal at this size
            for tb in self.tables:
                nn.init.normal_(tb.weight, std=E ** -0.5)
            bot_dims = [CFG["dense_dim"]] + CFG["bot_mlp"]
            top_in = D + (T + 1) * T // 2
            top_dims = [top_in] + CFG["top_mlp"]

            def mlp(dims):
                layers = []
                for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
                    layers.append(nn.Linear(a, b))
                    if i < len(dims) - 2:
                        layers.append(nn.ReLU())
                return nn.Sequential(*layers)

            self.bot = mlp(bot_dims)
            self.top = mlp(top_dims)

        def forward(self, dense, idx):
            bot_out = self.bot(dense)  # (B, D)
            pooled = torch.stack(
                [tb(idx[:, t, :]) for t, tb in enumerate(self.tables)], dim=1
            )  # (B, T, D)
            z = torch.cat([bot_out.unsqueeze(1), pooled], dim=1)  # (B, T+1, D)
            zz = torch.bmm(z, z.transpose(1, 2))
            li, lj = torch.tril_indices(T + 1, T + 1, offset=-1)
            feat = torch.cat([bot_out, zz[:, li, lj]], dim=1)
            return self.top(feat)[:, 0]

    model = TorchDlrm()
    opt = torch.optim.Adagrad(model.parameters(), lr=LR)
    loss_fn = nn.BCEWithLogitsLoss()
    for dense, idx, labels in batches[:-1]:
        opt.zero_grad()
        logits = model(
            torch.from_numpy(dense), torch.from_numpy(idx.astype(np.int64))
        )
        loss = loss_fn(logits, torch.from_numpy(labels))
        loss.backward()
        opt.step()
    dense, idx, labels = batches[-1]
    with torch.no_grad():
        logits = model(
            torch.from_numpy(dense), torch.from_numpy(idx.astype(np.int64))
        ).numpy()
    return auc_score(logits, labels)


class TestAucParity:
    def test_jax_matches_torch_reference(self):
        batches = make_batches(seed=7)
        auc_jax = train_jax(batches)
        auc_torch = train_torch(batches)
        # run-to-run variance band: both models learn the planted signal
        # and land within 0.08 AUC of each other
        assert auc_jax > 0.6, f"jax AUC {auc_jax:.3f}"
        assert auc_torch > 0.6, f"torch AUC {auc_torch:.3f}"
        assert abs(auc_jax - auc_torch) < 0.08, (
            f"AUC divergence: jax {auc_jax:.3f} vs torch {auc_torch:.3f}"
        )
