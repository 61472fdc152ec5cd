"""Backend collective correctness on a real 8-device CPU mesh.

Every collective in SUPPORTED_COLLECTIVES is validated numerically — the
TPU-native upgrade over the reference's mocked backend tests (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from param_tpu.backend import CollectiveArgs, MockBackend, SUPPORTED_COLLECTIVES


def ranked(backend, elems=8, group=None):
    """Global array whose rank-r shard is filled with (r+1)."""
    g = group or backend.get_default_group()
    return backend.alloc_per_rank(
        lambda r: np.full((elems,), r + 1, dtype=np.float32), g
    )


class TestAllReduce:
    def test_sum(self, backend):
        x = ranked(backend)
        out = backend.all_reduce(CollectiveArgs(in_tensor=x))
        backend.complete_ops()
        expect = sum(range(1, 9))  # 36
        np.testing.assert_allclose(np.asarray(out), expect)

    def test_max(self, backend):
        x = ranked(backend)
        out = backend.all_reduce(CollectiveArgs(in_tensor=x, red_op="max"))
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(out), 8.0)

    def test_min(self, backend):
        x = ranked(backend)
        out = backend.all_reduce(CollectiveArgs(in_tensor=x, red_op="min"))
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(out), 1.0)

    def test_avg(self, backend):
        x = ranked(backend)
        out = backend.all_reduce(CollectiveArgs(in_tensor=x, red_op="avg"))
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(out), 4.5)


class TestReduce:
    def test_root_has_sum_others_zero(self, backend):
        x = ranked(backend)
        out = backend.reduce(CollectiveArgs(in_tensor=x, dst_rank=3))
        backend.complete_ops()
        shards = backend.local_shards(out)
        for r, s in enumerate(shards):
            np.testing.assert_allclose(s, 36.0 if r == 3 else 0.0)

    def test_ring_chain_red_ops(self, backend):
        """The ring-reduce ppermute chain must honor every red_op."""
        x = ranked(backend)
        for op, want in (("max", 8.0), ("min", 1.0), ("avg", 4.5)):
            out = backend.reduce(
                CollectiveArgs(in_tensor=x, dst_rank=0, red_op=op)
            )
            backend.complete_ops()
            shards = backend.local_shards(out)
            np.testing.assert_allclose(shards[0], want)
            for s in shards[1:]:
                np.testing.assert_allclose(s, 0.0)

    def test_nonzero_root(self, backend):
        """Chain wrap-around: root in the middle of the ring."""
        x = ranked(backend)
        out = backend.reduce(
            CollectiveArgs(in_tensor=x, dst_rank=5, red_op="sum")
        )
        backend.complete_ops()
        shards = backend.local_shards(out)
        for r, s in enumerate(shards):
            np.testing.assert_allclose(s, 36.0 if r == 5 else 0.0)


class TestAllGather:
    def test_tiled(self, backend):
        x = ranked(backend, elems=4)
        out = backend.all_gather(CollectiveArgs(in_tensor=x))
        backend.complete_ops()
        shards = backend.local_shards(out)
        expect = np.repeat(np.arange(1, 9, dtype=np.float32), 4)
        for s in shards:
            np.testing.assert_allclose(s, expect)

    def test_v_ragged(self, backend):
        splits = [1, 2, 3, 4, 5, 6, 7, 8]
        mx = max(splits)
        x = backend.alloc_per_rank(
            lambda r: np.full((mx,), r + 1, dtype=np.float32)
        )
        out = backend.all_gather_v(CollectiveArgs(in_tensor=x, in_split=splits))
        backend.complete_ops()
        expect = np.concatenate(
            [np.full(s, r + 1, dtype=np.float32) for r, s in enumerate(splits)]
        )
        # out is replicated: every rank holds the full ragged concat
        np.testing.assert_allclose(np.asarray(out), expect)


class TestReduceScatter:
    def test_sum(self, backend):
        # per-rank input: 8 chunks of 2 elems, chunk j filled with (rank+1)*j
        def mk(r):
            return np.repeat(np.arange(8, dtype=np.float32) * (r + 1), 2)

        x = backend.alloc_per_rank(mk)
        out = backend.reduce_scatter(CollectiveArgs(in_tensor=x))
        backend.complete_ops()
        shards = backend.local_shards(out)
        for j, s in enumerate(shards):
            np.testing.assert_allclose(s, j * 36.0)

    def test_v(self, backend):
        splits = [2, 2, 4, 4, 2, 2, 4, 4]
        total = sum(splits)

        def mk(r):
            return np.arange(total, dtype=np.float32)

        x = backend.alloc_per_rank(mk)
        out = backend.reduce_scatter_v(CollectiveArgs(in_tensor=x, out_split=splits))
        backend.complete_ops()
        shards = backend.local_shards(out)
        offs = np.cumsum([0] + splits[:-1])
        for r, s in enumerate(shards):
            np.testing.assert_allclose(
                s[: splits[r]], 8.0 * np.arange(offs[r], offs[r] + splits[r])
            )


class TestAllToAll:
    def test_equal_split(self, backend):
        # rank r sends chunk j = 100*r + j
        def mk(r):
            return np.repeat(100.0 * r + np.arange(8, dtype=np.float32), 2)

        x = backend.alloc_per_rank(mk)
        out = backend.all_to_all(CollectiveArgs(in_tensor=x))
        backend.complete_ops()
        shards = backend.local_shards(out)
        for r, s in enumerate(shards):
            expect = np.repeat(100.0 * np.arange(8) + r, 2)
            np.testing.assert_allclose(s, expect)

    def test_v_shared_splits(self, backend):
        splits = [1, 1, 2, 2, 1, 1, 2, 2]  # same for every sender
        total = sum(splits)
        offs = np.cumsum([0] + splits[:-1])

        def mk(r):
            out = np.zeros(total, dtype=np.float32)
            for j in range(8):
                out[offs[j] : offs[j] + splits[j]] = 100.0 * r + j
            return out

        x = backend.alloc_per_rank(mk)
        out = backend.all_to_allv(CollectiveArgs(in_tensor=x, in_split=splits))
        backend.complete_ops()
        shards = backend.local_shards(out)
        # receiver r gets splits[r] elements (value 100*i + r) from each
        # sender i, padded to the max ragged receive
        for r, s in enumerate(shards):
            expect = np.concatenate(
                [np.full(splits[r], 100.0 * i + r) for i in range(8)]
            )
            np.testing.assert_allclose(s[: len(expect)], expect)
            np.testing.assert_allclose(s[len(expect) :], 0.0)

    def test_v_matrix_splits(self, backend):
        n = 8
        S = np.ones((n, n), dtype=np.int64)
        S[0, :] = 2  # rank 0 sends 2 elems to everyone

        def mk(r):
            tot = int(S[r].sum())
            out = np.zeros(tot, dtype=np.float32)
            o = 0
            for j in range(n):
                out[o : o + S[r, j]] = 100.0 * r + j
                o += int(S[r, j])
            return out

        # equal local shapes required: pad rank rows to max
        mx = int(S.sum(axis=1).max())

        def mk_pad(r):
            v = mk(r)
            return np.pad(v, (0, mx - len(v)))

        x = backend.alloc_per_rank(mk_pad)
        out = backend.all_to_allv(CollectiveArgs(in_tensor=x, in_split=S))
        backend.complete_ops()
        shards = backend.local_shards(out)
        for r, s in enumerate(shards):
            # receiver r: 2 elems of value r from sender 0, then one elem
            # 100*k + r from each sender k >= 1
            expect = np.concatenate(
                [[float(r), float(r)]] + [[100.0 * k + r] for k in range(1, n)]
            )
            np.testing.assert_allclose(s[: len(expect)], expect)


class TestRooted:
    def test_broadcast(self, backend):
        x = ranked(backend)
        out = backend.broadcast(CollectiveArgs(in_tensor=x, src_rank=5))
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(out), 6.0)

    def test_gather(self, backend):
        x = ranked(backend, elems=2)
        out = backend.gather(CollectiveArgs(in_tensor=x, dst_rank=2))
        backend.complete_ops()
        shards = backend.local_shards(out)
        expect = np.repeat(np.arange(1, 9, dtype=np.float32), 2)
        np.testing.assert_allclose(shards[2], expect)
        np.testing.assert_allclose(shards[0], 0.0)

    def test_scatter(self, backend):
        # root 1 holds chunks: chunk j = j*10
        def mk(r):
            if r == 1:
                return np.repeat(np.arange(8, dtype=np.float32) * 10, 2)
            return np.zeros(16, dtype=np.float32)

        x = backend.alloc_per_rank(mk)
        out = backend.scatter(CollectiveArgs(in_tensor=x, src_rank=1))
        backend.complete_ops()
        shards = backend.local_shards(out)
        for r, s in enumerate(shards):
            np.testing.assert_allclose(s, r * 10.0)

    def test_incast(self, backend):
        x = ranked(backend, elems=2)
        out = backend.incast(
            CollectiveArgs(in_tensor=x, dst_rank=0, src_ranks=[1, 2, 3])
        )
        backend.complete_ops()
        shards = backend.local_shards(out)
        got = shards[0]
        np.testing.assert_allclose(got[2:4], 2.0)  # from rank 1
        np.testing.assert_allclose(got[4:6], 3.0)
        np.testing.assert_allclose(got[6:8], 4.0)
        np.testing.assert_allclose(got[8:], 0.0)  # ranks 4.. not senders
        np.testing.assert_allclose(shards[5], 0.0)  # non-dst empty

    def test_multicast(self, backend):
        x = ranked(backend)
        out = backend.multicast(
            CollectiveArgs(in_tensor=x, src_rank=2, dst_ranks=[4, 5])
        )
        backend.complete_ops()
        shards = backend.local_shards(out)
        np.testing.assert_allclose(shards[4], 3.0)
        np.testing.assert_allclose(shards[5], 3.0)
        np.testing.assert_allclose(shards[1], 0.0)


class TestPt2Pt:
    def test_send_recv(self, backend):
        x = ranked(backend)
        out = backend.send_recv(
            CollectiveArgs(in_tensor=x, src_ranks=[0], dst_ranks=[7])
        )
        backend.complete_ops()
        shards = backend.local_shards(out)
        np.testing.assert_allclose(shards[7], 1.0)

    def test_ping_pong(self, backend):
        x = ranked(backend)
        out = backend.ping(
            CollectiveArgs(in_tensor=x, src_ranks=[0], dst_ranks=[1]), pong=True
        )
        backend.complete_ops()
        shards = backend.local_shards(out)
        np.testing.assert_allclose(shards[0], 1.0)  # came back

    def test_window(self, backend):
        x = ranked(backend)
        out = backend.window_send(
            CollectiveArgs(in_tensor=x, src_ranks=[0], dst_ranks=[1]),
            window=4,
            bidirectional=True,
        )
        backend.complete_ops()
        assert np.asarray(out).shape == (64,)


class TestGroups:
    def test_subgroup_all_reduce(self, backend):
        g = backend.new_group([0, 1, 2, 3], pg_id=11)
        x = backend.alloc_per_rank(
            lambda r: np.full((4,), r + 1, dtype=np.float32), g
        )
        out = backend.all_reduce(CollectiveArgs(group=g, in_tensor=x))
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(out), 10.0)

    def test_round_robin_groups(self, backend):
        gs = backend.make_round_robin_groups(2)
        assert [d.id for d in gs[0].devices] == [0, 2, 4, 6]
        assert [d.id for d in gs[1].devices] == [1, 3, 5, 7]

    def test_concurrent_group_collectives(self, backend):
        g0 = backend.new_group([0, 1, 2, 3], pg_id=21)
        g1 = backend.new_group([4, 5, 6, 7], pg_id=22)
        x0 = backend.alloc_ones((16,), jnp.float32, g0)
        x1 = backend.alloc_ones((16,), jnp.float32, g1, scale=2.0)
        o0 = backend.all_reduce(CollectiveArgs(group=g0, in_tensor=x0))
        o1 = backend.all_reduce(CollectiveArgs(group=g1, in_tensor=x1))
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(o0), 4.0)
        np.testing.assert_allclose(np.asarray(o1), 8.0)


class TestGraphMode:
    def test_chained_all_reduce(self, backend):
        x = backend.alloc_ones((8,), jnp.float32)
        out = backend.run_coll_graph(
            "all_reduce", CollectiveArgs(in_tensor=x, red_op="max"), n_iters=5
        )
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(out), 1.0)


class TestCompletion:
    def test_wait_by_req_id(self, backend):
        x = backend.alloc_ones((8,), jnp.float32)
        out = backend.all_reduce(CollectiveArgs(in_tensor=x))
        backend._pending_by_id["req0"] = out
        backend.wait("req0")
        assert "req0" not in backend._pending_by_id

    def test_barrier(self, backend):
        backend.barrier()  # must not hang

    def test_sync_barrier(self, backend):
        backend.sync_barrier()


class TestMockBackend:
    def test_dispatch_table_complete(self):
        mock = MockBackend(world_size=4)
        for name in SUPPORTED_COLLECTIVES:
            assert name in mock.collective_fn

    def test_call_log(self):
        mock = MockBackend(world_size=4)
        x = mock.alloc_ones((4,), np.float32)
        mock.collective_fn["all_reduce"](CollectiveArgs(in_tensor=x))
        assert mock.calls[0][0] == "all_reduce"


class TestReduceScatterVRedOp:
    def test_max(self, backend):
        """reduce_scatter_v must honor red_op (previously always psum)."""
        splits = [2] * 8
        total = sum(splits)
        x = ranked(backend, elems=total)
        out = backend.reduce_scatter_v(
            CollectiveArgs(in_tensor=x, out_split=splits, red_op="max")
        )
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(out), 8.0)

    def test_min(self, backend):
        splits = [2] * 8
        x = ranked(backend, elems=sum(splits))
        out = backend.reduce_scatter_v(
            CollectiveArgs(in_tensor=x, out_split=splits, red_op="min")
        )
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(out), 1.0)


class TestObjectCollectives:
    """Object collectives (reference: dist.all_gather_object /
    dist.broadcast_object_list, pytorch_dist_backend.py:396-425,593-608):
    host pickling + byte-honest device exchange."""

    def test_all_gather_object_arrays(self, backend):
        n = backend.get_world_size()
        objs = [np.full((4,), r + 1, dtype=np.float32) for r in range(n)]
        args = CollectiveArgs(misc={"objects": objs})
        out = backend.all_gather_object(args)
        backend.complete_ops()
        assert len(out) == n
        for r, o in enumerate(out):
            np.testing.assert_allclose(o, r + 1)

    def test_all_gather_object_heterogeneous(self, backend):
        """Arbitrary picklables with DIFFERENT blob lengths per rank —
        exercises the pad-to-max staging."""
        n = backend.get_world_size()
        objs = [{"rank": r, "tag": "x" * (r * 7 + 1)} for r in range(n)]
        out = backend.all_gather_object(CollectiveArgs(misc={"objects": objs}))
        backend.complete_ops()
        assert out == objs

    def test_broadcast_object_list(self, backend):
        n = backend.get_world_size()
        src = 3
        payload = [np.full((5,), src + 1, dtype=np.float32), {"meta": 42}]
        args = CollectiveArgs(misc={"object_list": payload}, src_rank=src)
        out = backend.broadcast_object_list(args)
        backend.complete_ops()
        assert len(out) == n
        for lst in out:
            np.testing.assert_allclose(lst[0], src + 1)
            assert lst[1] == {"meta": 42}

    def test_in_dispatch_table(self, backend):
        assert "all_gather_object" in backend.collective_fn
        assert "broadcast_object_list" in backend.collective_fn

    def test_chain_mode_rejected(self, backend):
        x = ranked(backend)
        with pytest.raises(ValueError):
            backend.coll_chain(
                "all_gather_object", CollectiveArgs(in_tensor=x), 2
            )

    def test_harness_prep_and_dcheck(self, backend):
        from param_tpu.comms.harness import CommsBench, CommsParams

        params = CommsParams(dcheck=True)
        bench = CommsBench(backend, params)
        g = backend.get_default_group()
        for coll in ("all_gather_object", "broadcast_object_list"):
            args = bench.prep_comm(coll, 256, g)
            out = backend.collective_fn[coll](args)
            backend.complete_ops()
            assert bench.dcheck(coll, args, out), coll

    def test_coll_bench_forces_blocking(self, backend):
        """GRAPH mode must transparently fall back to per-call timing for
        object collectives and still produce a sane COMMS-RES row."""
        from param_tpu.comms.coll_bench import CollBench
        from param_tpu.comms.harness import CommsParams

        params = CommsParams(
            collectives=["all_gather_object"], num_iters=3,
            num_warmup_iters=1, dcheck=True,
        )
        bench = CollBench(backend, params)
        res = bench.run_one(
            "all_gather_object", 256, backend.get_default_group()
        )
        assert res.dcheck_ok is True
        assert len(res.lat_us) == 3 and all(t > 0 for t in res.lat_us)
