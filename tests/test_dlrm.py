"""DLRM hybrid-parallel model tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from param_tpu.models.dlrm import (
    DlrmConfig,
    DlrmModel,
    dot_interaction,
    init_dlrm_params,
)
from param_tpu.models.dlrm_data import RandomDataset, SyntheticDataset, data_loader


def tiny_cfg(**kw):
    defaults = dict(
        num_tables=8, rows_per_table=500, emb_dim=16, nnz=4,
        dense_dim=16, bot_mlp=[32, 16], top_mlp=[32, 1], batch=64,
    )
    defaults.update(kw)
    return DlrmConfig(**defaults)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("x",))


@pytest.fixture(scope="module")
def setup(mesh):
    cfg = tiny_cfg()
    model = DlrmModel(cfg, mesh)
    params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
    ds = RandomDataset(
        batch=cfg.batch, dense_dim=cfg.dense_dim, num_tables=cfg.num_tables,
        nnz=cfg.nnz, num_rows=cfg.rows_per_table, num_batches=2,
    )
    batches = list(ds)
    return cfg, model, params, batches


class TestConfig:
    def test_interaction_dim(self):
        cfg = tiny_cfg()
        # dot: emb_dim + (T+1)T/2 pairs
        assert cfg.interaction_dim == 16 + 9 * 8 // 2

    def test_bad_bot_mlp(self):
        with pytest.raises(ValueError):
            tiny_cfg(bot_mlp=[32, 99])

    def test_mesh_divisibility(self, mesh):
        with pytest.raises(ValueError):
            DlrmModel(tiny_cfg(num_tables=3), mesh)


class TestDotInteraction:
    def test_shape(self):
        bot = jnp.ones((4, 8))
        pooled = jnp.ones((4, 3, 8))
        out = dot_interaction(bot, pooled)
        assert out.shape == (4, 8 + 4 * 3 // 2)


class TestShardedEqualsLocal:
    def test_loss_parity(self, setup):
        """The sharded butterfly must compute EXACTLY the unsharded model."""
        cfg, model, params, batches = setup
        dense, idx, labels = batches[0]
        params_p, batch_p = model.place(params, (dense, idx, labels))
        sharded = model.make_sharded_loss()(params_p, *batch_p)
        local = model.loss_fn(
            params, jnp.asarray(dense), jnp.asarray(idx), jnp.asarray(labels)
        )
        np.testing.assert_allclose(
            float(sharded), float(local), rtol=1e-5, atol=1e-6
        )


class TestTrainStep:
    def test_loss_decreases_and_sharding_stable(self, setup):
        cfg, model, params, batches = setup
        dense, idx, labels = batches[0]
        params_p, batch_p = model.place(params, (dense, idx, labels))
        opt = optax.adagrad(0.05)
        step = model.make_train_step(opt)
        st = opt.init(params_p)
        p = params_p
        losses = []
        for _ in range(5):
            p, st, l = step(p, st, *batch_p)
            losses.append(float(l))
        assert losses[-1] < losses[0]
        # table sharding must survive the optimizer update
        assert "'x'" in str(p["tables"].sharding.spec)

    def test_grads_flow_to_tables(self, setup):
        cfg, model, params, batches = setup
        dense, idx, labels = batches[0]
        params_p, batch_p = model.place(params, (dense, idx, labels))
        vg = jax.jit(model.make_value_and_grad())
        _, grads = vg(params_p, *batch_p)
        g = np.asarray(grads["tables"])
        assert np.abs(g).sum() > 0

    def test_sharded_grads_match_single_chip(self, setup):
        """EVERY grad leaf from the sharded value_and_grad must equal
        jax.grad of the identical single-chip loss_fn (catches the n×
        table-grad scaling bug from the pmean→psum transpose under
        check_vma=False)."""
        cfg, model, params, batches = setup
        dense, idx, labels = batches[0]
        params_p, batch_p = model.place(params, (dense, idx, labels))
        vg = jax.jit(model.make_value_and_grad())
        loss_sh, grads_sh = vg(params_p, *batch_p)

        ref_grads = jax.grad(
            lambda p: model.loss_fn(
                p, jnp.asarray(dense), jnp.asarray(idx), jnp.asarray(labels)
            )
        )(params)
        flat_sh, _ = jax.tree.flatten(jax.tree.map(np.asarray, grads_sh))
        flat_ref, _ = jax.tree.flatten(jax.tree.map(np.asarray, ref_grads))
        assert len(flat_sh) == len(flat_ref)
        for a, b in zip(flat_sh, flat_ref):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


class TestAuc:
    def test_synthetic_learnable(self, mesh):
        """A small DLRM must learn the planted synthetic signal (AUC > 0.6)
        — the BASELINE.md AUC-parity smoke check."""
        cfg = tiny_cfg(batch=256)
        model = DlrmModel(cfg, mesh)
        params = init_dlrm_params(jax.random.PRNGKey(1), cfg)
        ds = SyntheticDataset(
            batch=cfg.batch, dense_dim=cfg.dense_dim, num_tables=cfg.num_tables,
            nnz=cfg.nnz, num_rows=cfg.rows_per_table, num_batches=30, seed=3,
        )
        opt = optax.adagrad(0.1)
        step = model.make_train_step(opt)
        batches = list(ds)
        params_p, _ = model.place(params, batches[0])
        st = opt.init(params_p)
        p = params_p
        for dense, idx, labels in batches[:-1]:
            _, b = model.place(params, (dense, idx, labels))
            p, st, _ = step(p, st, *b)
        # eval AUC on held-out batch
        dense, idx, labels = batches[-1]
        logits = np.asarray(
            model.forward(
                jax.tree.map(np.asarray, p), jnp.asarray(dense), jnp.asarray(idx)
            )
        )
        order = np.argsort(logits)
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(len(logits))
        pos = labels > 0.5
        n_pos, n_neg = pos.sum(), (~pos).sum()
        auc = (ranks[pos].sum() - n_pos * (n_pos - 1) / 2) / (n_pos * n_neg)
        assert auc > 0.6, f"AUC {auc:.3f} — model failed to learn planted signal"


class TestData:
    def test_loader_kinds(self):
        for kind in ("random", "synthetic"):
            ds = data_loader(
                kind, batch=8, dense_dim=4, num_tables=2, nnz=2,
                num_rows=100, num_batches=1,
            )
            dense, idx, labels = next(iter(ds))
            assert dense.shape == (8, 4)
            assert idx.shape == (8, 2, 2)
            assert idx.max() < 100

    def test_zipf(self):
        from param_tpu.models.dlrm_data import gen_indices

        rng = np.random.default_rng(0)
        idx = gen_indices(rng, 1000, 1, 8, 10_000, "zipf")
        # Zipf skew: a small set of rows dominates
        _, counts = np.unique(idx, return_counts=True)
        assert counts.max() > 100


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (256,)

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestRaggedPath:
    def test_ragged_loss_matches_dense_when_full(self, mesh):
        """With every bag full (lengths == nnz) the ragged path must equal
        the fixed-nnz path exactly."""
        import optax

        cfg = tiny_cfg()
        model = DlrmModel(cfg, mesh)
        params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
        # pad tables with the zero row the ragged path points padding at
        padded = dict(params)
        padded["tables"] = jnp.concatenate(
            [params["tables"],
             jnp.zeros((cfg.num_tables, 1, cfg.emb_dim), params["tables"].dtype)],
            axis=1,
        )
        ds = RandomDataset(batch=cfg.batch, dense_dim=cfg.dense_dim,
                           num_tables=cfg.num_tables, nnz=cfg.nnz,
                           num_rows=cfg.rows_per_table, num_batches=1)
        dense, idx, labels = next(iter(ds))
        lengths = np.full((cfg.batch, cfg.num_tables), cfg.nnz, np.int32)

        params_p, batch_p = model.place(params, (dense, idx, labels))
        dense_loss = model.make_sharded_loss()(params_p, *batch_p)

        from jax.sharding import NamedSharding, PartitionSpec as P

        padded_p = jax.device_put(padded, model.shardings()[0])
        lt = jax.device_put(lengths, NamedSharding(mesh, P("x", None)))
        rl = model.make_sharded_loss_ragged()(
            padded_p, batch_p[0], lt, batch_p[1], batch_p[2]
        )
        np.testing.assert_allclose(float(rl), float(dense_loss), rtol=1e-6)

    def test_ragged_loss_with_variable_lengths(self, mesh):
        """Variable-length bags run and differ from the all-full case."""
        cfg = tiny_cfg()
        model = DlrmModel(cfg, mesh)
        params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
        padded = dict(params)
        padded["tables"] = jnp.concatenate(
            [params["tables"],
             jnp.zeros((cfg.num_tables, 1, cfg.emb_dim), params["tables"].dtype)],
            axis=1,
        )
        rng = np.random.default_rng(0)
        dense = rng.normal(size=(cfg.batch, cfg.dense_dim)).astype(np.float32)
        idx = rng.integers(0, cfg.rows_per_table,
                           size=(cfg.batch, cfg.num_tables, cfg.nnz)).astype(np.int32)
        labels = rng.integers(0, 2, size=(cfg.batch,)).astype(np.float32)
        lengths = rng.integers(0, cfg.nnz + 1,
                               size=(cfg.batch, cfg.num_tables)).astype(np.int32)

        from jax.sharding import NamedSharding, PartitionSpec as P

        padded_p = jax.device_put(padded, model.shardings()[0])
        d = jax.device_put(dense, NamedSharding(mesh, P("x", None)))
        i = jax.device_put(idx, NamedSharding(mesh, P("x", None, None)))
        l = jax.device_put(labels, NamedSharding(mesh, P("x")))
        lt = jax.device_put(lengths, NamedSharding(mesh, P("x", None)))
        loss_fn = model.make_sharded_loss_ragged()
        rl = float(loss_fn(padded_p, d, lt, i, l))
        full = np.full_like(lengths, cfg.nnz)
        lt_full = jax.device_put(full, NamedSharding(mesh, P("x", None)))
        rl_full = float(loss_fn(padded_p, d, lt_full, i, l))
        assert np.isfinite(rl) and np.isfinite(rl_full)
        assert rl != rl_full  # masking changed the pooled sums


class TestRaggedDistOracle:
    def test_matches_numpy_oracle(self, mesh):
        """ragged_sparse_dist output matches the per-rank numpy oracle."""
        from jax.sharding import PartitionSpec as P

        from param_tpu.models.ragged import ragged_reference, ragged_sparse_dist

        n, b, T, K, E = 8, 3, 8, 5, 100
        B = n * b
        rng = np.random.default_rng(0)
        lengths = rng.integers(0, K + 1, size=(B, T)).astype(np.int32)
        idx = rng.integers(0, E, size=(B, T, K)).astype(np.int32)

        f = jax.jit(
            jax.shard_map(
                lambda l, i: ragged_sparse_dist(l, i, "x", pad_row=E),
                mesh=mesh,
                in_specs=(P("x", None), P("x", None, None)),
                out_specs=(P("x", None), P("x", None, None)),
                check_vma=False,
            )
        )
        lt, it = f(jnp.asarray(lengths), jnp.asarray(idx))
        Tl = T // n
        lt_g = np.asarray(lt).reshape(n, B, Tl)
        it_g = np.asarray(it).reshape(n, B, Tl, K)
        for j, (exp_lt, exp_it) in enumerate(
            ragged_reference(lengths, idx, n, pad_row=E)
        ):
            np.testing.assert_array_equal(lt_g[j], exp_lt)
            np.testing.assert_array_equal(it_g[j], exp_it)


class TestSparseSgdStep:
    def test_matches_dense_sgd(self, mesh):
        """One sparse-SGD step must produce the SAME params as a dense SGD
        step (sparse scatter updates are exact for sum-pooling)."""
        cfg = tiny_cfg()
        model = DlrmModel(cfg, mesh)
        params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
        ds = RandomDataset(batch=cfg.batch, dense_dim=cfg.dense_dim,
                           num_tables=cfg.num_tables, nnz=cfg.nnz,
                           num_rows=cfg.rows_per_table, num_batches=1)
        batch = next(iter(ds))
        lr = 0.05

        p_dense, b = model.place(params, batch)
        opt = optax.sgd(lr)
        st = opt.init(p_dense)
        dense_step = model.make_train_step(opt)
        p_after_dense, _, loss_dense = dense_step(p_dense, st, *b)

        p_sparse, b2 = model.place(params, batch)
        sparse_step = model.make_sparse_sgd_step(lr)
        p_after_sparse, loss_sparse = sparse_step(p_sparse, *b2)

        np.testing.assert_allclose(float(loss_dense), float(loss_sparse),
                                   rtol=1e-6)
        for key in ("tables",):
            np.testing.assert_allclose(
                np.asarray(p_after_sparse[key]), np.asarray(p_after_dense[key]),
                rtol=1e-5, atol=1e-6,
            )
        for key in ("bot", "top"):
            for (w1, b1), (w2, b2_) in zip(p_after_dense[key],
                                           p_after_sparse[key]):
                np.testing.assert_allclose(np.asarray(w2), np.asarray(w1),
                                           rtol=1e-5, atol=1e-6)


class TestSparseAdagradStep:
    def _run_parity(self, mesh, cfg, acc0=0.1):
        """Sparse-row adagrad must match a dense optax.adagrad step exactly
        (duplicates are segment-summed per row BEFORE squaring, so the
        accumulator sees the total per-row gradient like the dense path)."""
        model = DlrmModel(cfg, mesh)
        params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
        ds = RandomDataset(batch=cfg.batch, dense_dim=cfg.dense_dim,
                           num_tables=cfg.num_tables, nnz=cfg.nnz,
                           num_rows=cfg.rows_per_table, num_batches=1)
        batch = next(iter(ds))
        lr, eps = 0.05, 1e-7

        p_dense, b = model.place(params, batch)
        opt = optax.adagrad(lr, initial_accumulator_value=acc0, eps=eps)
        st = opt.init(p_dense)
        dense_step = model.make_train_step(opt)
        p_after_dense, _, loss_dense = dense_step(p_dense, st, *b)

        p_sparse, b2 = model.place(params, batch)
        acc = model.init_adagrad_state(p_sparse, initial_accumulator=acc0)
        sparse_step = model.make_sparse_adagrad_step(
            lr, eps=eps, initial_accumulator=acc0
        )
        p_after_sparse, acc_after, loss_sparse = sparse_step(
            p_sparse, acc, *b2
        )

        np.testing.assert_allclose(float(loss_dense), float(loss_sparse),
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(p_after_sparse["tables"]),
            np.asarray(p_after_dense["tables"]),
            rtol=1e-5, atol=1e-6,
        )
        for key in ("bot", "top"):
            for (w1, b1), (w2, b2_) in zip(p_after_dense[key],
                                           p_after_sparse[key]):
                np.testing.assert_allclose(np.asarray(w2), np.asarray(w1),
                                           rtol=1e-5, atol=1e-6)
        return acc_after

    def test_matches_dense_adagrad(self, mesh):
        self._run_parity(mesh, tiny_cfg())

    def test_matches_dense_adagrad_heavy_duplicates(self, mesh):
        """40-row tables with 256 lookups per table — most rows repeat many
        times, exercising the sum-before-square segment path."""
        self._run_parity(mesh, tiny_cfg(rows_per_table=40))

    def test_matches_dense_adagrad_zero_accumulator(self, mesh):
        """initial_accumulator=0 pins the optax eps placement: the update
        factor is where(acc>0, rsqrt(acc+eps), 0), NOT 1/(sqrt(acc)+eps) —
        at acc0=0 and small first gradients the two diverge 3x+ (code
        review r2 finding)."""
        self._run_parity(mesh, tiny_cfg(), acc0=0.0)

    def test_pallas_update_wide_rows(self, mesh):
        """emb_dim=256 (a multiple of 128 > 128): pack_rows_to_lanes must
        pass through instead of raising 'lane 128 must be a multiple of
        D 256' (code review r2 finding); pallas and xla updates agree."""
        cfg = tiny_cfg(emb_dim=256, bot_mlp=[32, 256], rows_per_table=64,
                       batch=32)
        model = DlrmModel(cfg, mesh)
        params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
        ds = RandomDataset(batch=cfg.batch, dense_dim=cfg.dense_dim,
                           num_tables=cfg.num_tables, nnz=cfg.nnz,
                           num_rows=cfg.rows_per_table, num_batches=1)
        batch = next(iter(ds))
        outs = {}
        for mode in ("xla", "pallas"):
            p, b = model.place(params, batch)
            acc = model.init_adagrad_state(p)
            step = model.make_sparse_adagrad_step(0.05, table_update=mode)
            p2, acc2, loss = step(p, acc, *b)
            outs[mode] = (np.asarray(p2["tables"]),
                          np.asarray(acc2["tables"]), float(loss))
        np.testing.assert_allclose(outs["pallas"][0], outs["xla"][0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(outs["pallas"][1], outs["xla"][1],
                                   rtol=1e-5, atol=1e-6)

    def test_pallas_table_update_matches_xla(self, mesh):
        """The Pallas in-place row-update kernel (interpret mode on CPU)
        must produce the same step as the XLA scatter path.  Needs a
        lane-packable config: emb_dim 16 -> pack 8, rows % 8 == 0."""
        cfg = tiny_cfg(rows_per_table=512)
        model = DlrmModel(cfg, mesh)
        params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
        ds = RandomDataset(batch=cfg.batch, dense_dim=cfg.dense_dim,
                           num_tables=cfg.num_tables, nnz=cfg.nnz,
                           num_rows=cfg.rows_per_table, num_batches=1)
        batch = next(iter(ds))
        lr = 0.05

        outs = {}
        for mode in ("xla", "pallas"):
            p, b = model.place(params, batch)
            acc = model.init_adagrad_state(p)
            step = model.make_sparse_adagrad_step(lr, table_update=mode)
            p2, acc2, loss = step(p, acc, *b)
            sgd = model.make_sparse_sgd_step(lr, table_update=mode)
            p3, _ = sgd(*model.place(params, batch)[:1], *b)
            outs[mode] = (np.asarray(p2["tables"]),
                          np.asarray(acc2["tables"]),
                          np.asarray(p3["tables"]), float(loss))
        for a, b_ in zip(outs["xla"][:3], outs["pallas"][:3]):
            np.testing.assert_allclose(b_, a, rtol=1e-5, atol=1e-6)
        assert abs(outs["xla"][3] - outs["pallas"][3]) < 1e-6

    def test_untouched_rows_unchanged(self, mesh):
        """Rows never gathered keep both param and accumulator values."""
        cfg = tiny_cfg()
        model = DlrmModel(cfg, mesh)
        params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
        dense = np.random.default_rng(0).standard_normal(
            (cfg.batch, cfg.dense_dim)).astype(np.float32)
        # every lookup hits row 7 only
        idx = np.full((cfg.batch, cfg.num_tables, cfg.nnz), 7, np.int32)
        labels = np.ones((cfg.batch,), np.float32)
        p, b = model.place(params, (dense, idx, labels))
        acc = model.init_adagrad_state(p, initial_accumulator=0.1)
        step = model.make_sparse_adagrad_step(0.05)
        p2, acc2, _ = step(p, acc, *b)
        t_before = np.asarray(params["tables"])
        t_after = np.asarray(p2["tables"])
        a_after = np.asarray(acc2["tables"])
        mask = np.ones(cfg.rows_per_table, bool)
        mask[7] = False
        np.testing.assert_array_equal(t_after[:, mask], t_before[:, mask])
        np.testing.assert_array_equal(a_after[:, mask], np.float32(0.1))
        assert not np.allclose(t_after[:, 7], t_before[:, 7])
        assert (a_after[:, 7] > 0.1).all()


class TestPackedTables:
    """Lane-packed table storage (E/pack, 128): forward and train-step
    parity with the default layout."""

    def _setup(self, mesh, **kw):
        cfg = tiny_cfg(rows_per_table=512, **kw)
        plain = DlrmModel(cfg, mesh)
        packed = DlrmModel(cfg, mesh, packed_tables=True)
        assert packed.pack == 128 // cfg.emb_dim
        params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
        ds = RandomDataset(batch=cfg.batch, dense_dim=cfg.dense_dim,
                           num_tables=cfg.num_tables, nnz=cfg.nnz,
                           num_rows=cfg.rows_per_table, num_batches=1)
        return cfg, plain, packed, params, next(iter(ds))

    def test_pack_unpack_roundtrip(self, mesh):
        cfg, _, packed, params, _ = self._setup(mesh)
        pp = packed.pack_params(params)
        assert pp["tables"].shape == packed.table_storage_shape
        back = packed.unpack_params(pp)
        np.testing.assert_array_equal(np.asarray(back["tables"]),
                                      np.asarray(params["tables"]))

    def test_forward_parity(self, mesh):
        cfg, plain, packed, params, (dense, idx, labels) = self._setup(mesh)
        f_plain = plain.make_sharded_loss()
        f_packed = packed.make_sharded_loss()
        p1, b1 = plain.place(params, (dense, idx, labels))
        p2, b2 = packed.place(packed.pack_params(params), (dense, idx, labels))
        l1 = float(f_plain(p1, *b1))
        l2 = float(f_packed(p2, *b2))
        assert abs(l1 - l2) < 1e-6

    def test_dense_train_step_parity(self, mesh):
        cfg, plain, packed, params, batch = self._setup(mesh)
        opt = optax.sgd(0.05)
        outs = {}
        for name, model in (("plain", plain), ("packed", packed)):
            p = model.pack_params(params) if name == "packed" else params
            p, b = model.place(p, batch)
            st = opt.init(p)
            step = model.make_train_step(opt)
            p2, _, loss = step(p, st, *b)
            tabs = np.asarray(model.unpack_params(p2)["tables"])
            outs[name] = (tabs, float(loss))
        np.testing.assert_allclose(outs["packed"][0], outs["plain"][0],
                                   rtol=1e-5, atol=1e-6)
        assert abs(outs["packed"][1] - outs["plain"][1]) < 1e-6

    @pytest.mark.parametrize("table_update", ["xla", "pallas"])
    def test_sparse_adagrad_parity(self, mesh, table_update):
        cfg, plain, packed, params, batch = self._setup(mesh)
        lr = 0.05
        outs = {}
        for name, model in (("plain", plain), ("packed", packed)):
            mode = "xla" if name == "plain" else table_update
            p = model.pack_params(params) if name == "packed" else params
            p, b = model.place(p, batch)
            acc = model.init_adagrad_state(p)
            step = model.make_sparse_adagrad_step(lr, table_update=mode)
            p2, acc2, loss = step(p, acc, *b)
            outs[name] = (
                np.asarray(model.unpack_params(p2)["tables"]),
                np.asarray(model.unpack_params(acc2)["tables"]),
                float(loss),
            )
        for a, b_ in zip(outs["plain"][:2], outs["packed"][:2]):
            np.testing.assert_allclose(b_, a, rtol=1e-5, atol=1e-6)
        assert abs(outs["plain"][2] - outs["packed"][2]) < 1e-6

    @pytest.mark.parametrize("table_update", ["xla", "pallas"])
    def test_sparse_sgd_parity(self, mesh, table_update):
        cfg, plain, packed, params, batch = self._setup(mesh)
        outs = {}
        for name, model in (("plain", plain), ("packed", packed)):
            mode = "xla" if name == "plain" else table_update
            p = model.pack_params(params) if name == "packed" else params
            p, b = model.place(p, batch)
            step = model.make_sparse_sgd_step(0.05, table_update=mode)
            p2, loss = step(p, *b)
            outs[name] = (np.asarray(model.unpack_params(p2)["tables"]),
                          float(loss))
        np.testing.assert_allclose(outs["packed"][0], outs["plain"][0],
                                   rtol=1e-5, atol=1e-6)
        assert abs(outs["packed"][1] - outs["plain"][1]) < 1e-6


class TestRaggedEdgeCases:
    def test_all_zero_lengths(self, mesh):
        """Zero-length bags everywhere: every output row is the pad row."""
        from jax.sharding import PartitionSpec as P

        from param_tpu.models.ragged import ragged_sparse_dist

        n, b, T, K, E = 8, 2, 8, 3, 50
        lengths = np.zeros((n * b, T), np.int32)
        idx = np.zeros((n * b, T, K), np.int32)
        f = jax.jit(
            jax.shard_map(
                lambda l, i: ragged_sparse_dist(l, i, "x", pad_row=E),
                mesh=mesh,
                in_specs=(P("x", None), P("x", None, None)),
                out_specs=(P("x", None), P("x", None, None)),
                check_vma=False,
            )
        )
        lt, it = f(jnp.asarray(lengths), jnp.asarray(idx))
        assert int(np.asarray(lt).sum()) == 0
        np.testing.assert_array_equal(np.asarray(it), E)

    def test_full_lengths(self, mesh):
        from jax.sharding import PartitionSpec as P

        from param_tpu.models.ragged import ragged_reference, ragged_sparse_dist

        n, b, T, K, E = 8, 2, 8, 3, 50
        rng = np.random.default_rng(1)
        lengths = np.full((n * b, T), K, np.int32)
        idx = rng.integers(0, E, size=(n * b, T, K)).astype(np.int32)
        f = jax.jit(
            jax.shard_map(
                lambda l, i: ragged_sparse_dist(l, i, "x", pad_row=E),
                mesh=mesh,
                in_specs=(P("x", None), P("x", None, None)),
                out_specs=(P("x", None), P("x", None, None)),
                check_vma=False,
            )
        )
        lt, it = f(jnp.asarray(lengths), jnp.asarray(idx))
        it_g = np.asarray(it).reshape(n, n * b, T // n, K)
        for j, (exp_lt, exp_it) in enumerate(
            ragged_reference(lengths, idx, n, pad_row=E)
        ):
            np.testing.assert_array_equal(it_g[j], exp_it)
