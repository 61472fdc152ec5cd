"""PyTorch-ET export round trip: TPU comm traces consumable by the
PyTorch world's trace tooling (trace/export_pytorch_et.py).

The round-trip oracle is our own pytorch_et parser, which is validated
against the reference repo's REAL production traces
(tests/test_reference_traces.py) — surviving it means surviving the
reference's ``et_replay/comm/commsTraceParser.py`` reader too.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from param_tpu.backend.base import CollectiveArgs
from param_tpu.trace.comms_trace import CommsOp
from param_tpu.trace.export_pytorch_et import (
    dump_pytorch_et_file,
    export_pytorch_et,
)
from param_tpu.trace.pytorch_et import comms_from_pytorch_et


class TestRoundTrip:
    def test_basic_ops(self):
        ops = [
            CommsOp(id=0, comms="all_reduce", in_msg_size=1024,
                    out_msg_size=1024, dtype="float32"),
            CommsOp(id=1, comms="all_gather", in_msg_size=128,
                    out_msg_size=1024, dtype="bfloat16"),
            CommsOp(id=2, comms="all_to_allv", in_msg_size=24,
                    out_msg_size=24, dtype="int32",
                    in_split=[3, 3, 3, 15], out_split=[6, 6, 6, 6]),
            CommsOp(id=3, comms="reduce", in_msg_size=64, out_msg_size=64,
                    dtype="float32", dst_rank=2),
            CommsOp(id=4, comms="broadcast", in_msg_size=32, out_msg_size=32,
                    dtype="float16", src_rank=1),
        ]
        data = export_pytorch_et(ops, world_size=4)
        assert data["schema"].startswith("1.0.4")
        back = comms_from_pytorch_et(data, target_rank=0, total_ranks=4)
        # one leading init op for the default pg
        assert back[0].comms == "init"
        assert back[0].group_ranks == [0, 1, 2, 3]
        got = back[1:]
        assert [o.comms for o in got] == [o.comms for o in ops]
        for a, b in zip(ops, got):
            assert b.in_msg_size == a.in_msg_size, a.comms
            assert b.out_msg_size == a.out_msg_size, a.comms
            assert b.dtype == a.dtype, a.comms
            assert (b.in_split or None) == (a.in_split or None), a.comms
        # roots survive (pg-local == global for the full default group)
        assert got[3].root == 2
        assert got[4].root == 1

    def test_recorded_backend_trace_round_trips(self, backend):
        """Record a live sweep through the backend, export, re-parse: same
        collectives and sizes."""
        backend.start_trace_recording()
        x = backend.alloc_ones((256,), jnp.float32)
        backend.collective_fn["all_reduce"](CollectiveArgs(in_tensor=x))
        xg = backend.alloc_ones((64,), jnp.float32)
        backend.collective_fn["all_gather"](CollectiveArgs(in_tensor=xg))
        backend.complete_ops()
        trace = backend.stop_trace_recording()

        data = export_pytorch_et(trace, backend.get_world_size())
        back = comms_from_pytorch_et(data, 0, backend.get_world_size())
        comm = [o for o in back if o.comms != "init"]
        assert [o.comms for o in comm] == ["all_reduce", "all_gather"]
        # alloc_ones takes the PER-RANK shape; sizes survive the round trip
        assert comm[0].in_msg_size == 256
        assert comm[1].in_msg_size == 64
        assert comm[1].out_msg_size == 64 * 8

    def test_exported_trace_replays(self, backend, tmp_path):
        """The exported file feeds straight back into the replayer as
        trace_type=pytorch_et."""
        from param_tpu.trace.replay import CommsReplay, ReplayParams

        ops = [
            CommsOp(id=0, comms="all_reduce", in_msg_size=64,
                    out_msg_size=64),
            CommsOp(id=1, comms="all_to_all", in_msg_size=64,
                    out_msg_size=64),
        ]
        path = str(tmp_path / "export.json.gz")
        dump_pytorch_et_file(ops, backend.get_world_size(), path)
        params = ReplayParams(trace_path=path, trace_type="pytorch_et",
                              num_replays=1, num_warmup_replays=0)
        replay = CommsReplay(backend, params)
        replay.load()
        assert replay.dry_run_stats()["all_reduce"]["count"] == 1
        t = replay.replay_once()
        assert t > 0

    def test_generic_pt2pt_mapping(self):
        """The backend recorder emits generic 'pt2pt' ops — export writes
        them as directional send/recv so peers survive (code review r2)."""
        ops = [CommsOp(id=0, comms="pt2pt", in_msg_size=16, out_msg_size=16,
                       src_rank=2, dst_rank=5)]
        # as the sender
        data = export_pytorch_et(ops, world_size=8, target_rank=2)
        back = [o for o in comms_from_pytorch_et(data, 2, 8)
                if o.comms != "init"]
        assert back[0].src_rank == 2 and back[0].dst_rank == 5
        # as the receiver
        data = export_pytorch_et(ops, world_size=8, target_rank=5)
        back = [o for o in comms_from_pytorch_et(data, 5, 8)
                if o.comms != "init"]
        assert back[0].src_rank == 2 and back[0].dst_rank == 5

    def test_p2p_peer_mapping(self):
        ops = [CommsOp(id=0, comms="send", in_msg_size=16, out_msg_size=16,
                       dst_rank=3)]
        data = export_pytorch_et(ops, world_size=4, target_rank=1)
        back = [o for o in comms_from_pytorch_et(data, 1, 4)
                if o.comms != "init"]
        assert back[0].src_rank == 1 and back[0].dst_rank == 3

    def test_subgroup_pg(self):
        ops = [CommsOp(id=0, comms="all_reduce", in_msg_size=8,
                       out_msg_size=8, pg_id=1, group_ranks=[0, 2, 4, 6],
                       world_size=4)]
        data = export_pytorch_et(ops, world_size=8)
        back = comms_from_pytorch_et(data, 0, 8)
        inits = [o for o in back if o.comms == "init"]
        assert any(o.group_ranks == [0, 2, 4, 6] for o in inits)
        ar = [o for o in back if o.comms == "all_reduce"][0]
        assert ar.group_ranks == [0, 2, 4, 6]
        assert ar.world_size == 4
