"""PyTorch-ET / Kineto comm-trace ingestion tests.

Covers both ET schema generations (legacy flat 1.0.1 and modern
1.x-chakra with comm attrs), Kineto unitrace events, and end-to-end replay
on the 8-device CPU mesh — including ``--auto-shrink`` for traces recorded
on a different world size.  Reference parity targets:
``train/comms/pt/commsTraceParser.py`` and
``et_replay/comm/commsTraceParser.py:85-123``.
"""

import gzip
import json
import os
import subprocess
import sys

import pytest

from param_tpu.trace.comms_trace import parse_trace
from param_tpu.trace.pytorch_et import (
    comms_from_kineto,
    comms_from_pytorch_et,
)
from param_tpu.trace.replay import CommsReplay, ReplayParams

REF_INPUTS = "/root/reference/et_replay/tests/inputs"


# --------------------------------------------------------------- fixtures
def _tensor(tid, nelem, ebytes=4):
    # [tensor_id, storage_id, offset, nelem, elem_bytes, device]
    return [tid, tid + 1000, 0, nelem, ebytes, "device:0"]


def _attrs(**kw):
    return [{"name": k, "type": "string", "value": v} for k, v in kw.items()]


def modern_et_fixture(world=8):
    """A DLRM-style comm stream in the modern (1.1.0-chakra) ET schema:
    pg-init + lengths/indices all_to_allv + pooled fwd a2a + dense
    all_reduce + rooted broadcast + wait."""
    pg_info = json.dumps(
        [{"pg_name": "0", "pg_desc": "default_pg", "backend_config": "x:y",
          "ranks": [], "group_size": world, "group_count": 2},
         {"pg_name": "1", "pg_desc": "sub_pg", "backend_config": "x:y",
          "ranks": list(range(0, world, 2)), "group_size": world // 2,
          "group_count": 2}]
    )
    nodes = [
        {"id": 2, "name": "## process_group:init ##", "ctrl_deps": 1,
         "inputs": {"values": [pg_info], "shapes": [[]], "types": ["String"]},
         "outputs": {"values": [], "shapes": [], "types": []}, "attrs": []},
    ]
    nid = 10

    def comm(name, nelem_in, nelem_out, dtype="Float", pg="0",
             in_split="[]", out_split="[]", recorded_rank=0, extra_attrs=()):
        nonlocal nid
        node = {
            "id": nid, "name": "record_param_comms", "ctrl_deps": 1,
            "inputs": {
                "values": [[_tensor(nid, nelem_in)], nid, [pg, "pg_desc"],
                           recorded_rank, name, [], [], 0, 1, world],
                "shapes": [[[nelem_in]], [], [[], []], [], [], [], [], [], [], []],
                "types": ["GenericList[Tensor(float)]", "Int",
                          "Tuple[String,String]", "Int", "String",
                          "GenericList[]", "GenericList[]", "Int", "Int", "Int"],
            },
            "outputs": {
                "values": [[_tensor(nid + 1, nelem_out)]],
                "shapes": [[[nelem_out]]],
                "types": ["GenericList[Tensor(float)]"],
            },
            "attrs": _attrs(
                collective_name=name, dtype=dtype,
                in_split_size=in_split, out_split_size=out_split,
                pg_name=pg, pg_desc="pg",
            ) + [
                {"name": "in_msg_nelems", "type": "uint64", "value": nelem_in},
                {"name": "out_msg_nelems", "type": "uint64", "value": nelem_out},
                {"name": "pg_size", "type": "uint64", "value": world},
            ],
        }
        nid += 2
        return node

    splits = json.dumps([16] * world)
    nodes += [
        comm("all_to_allv", 16 * world, 16 * world, dtype="Int",
             in_split=splits, out_split=splits),
        comm("all_to_allv", 128 * world, 128 * world,
             in_split=json.dumps([128] * world), out_split=json.dumps([128] * world)),
        comm("all_to_all", 64 * world, 64 * world),
        comm("allreduce", 4096, 4096),
        comm("allreduce", 2048, 2048, pg="1"),
        comm("broadcast", 512, 512, recorded_rank=2),
        comm("wait", 0, 0),
    ]
    return {"schema": "1.1.0-chakra.0.0.4", "nodes": nodes}


def legacy_et_fixture(world=8):
    """The same stream in the flat 1.0.1 schema (no attrs, sizes from
    tensor metadata, name located among the inputs)."""
    def comm(nid, name, nelem, in_split=None, out_split=None):
        return {
            "id": nid, "name": "record_param_comms", "parent": 1,
            "inputs": [_tensor(nid, nelem), nid, 999888777, 0, name,
                       in_split or [], out_split or []],
            "input_shapes": [[nelem], [], [], [], [], [], []],
            "input_types": ["Tensor(float)", "Int", "Int", "Int", "String",
                            "GenericList[]", "GenericList[]"],
            "outputs": [_tensor(nid + 1, nelem)],
            "output_shapes": [[nelem]],
            "output_types": ["Tensor(float)"],
        }

    def wait(nid):
        return {
            "id": nid, "name": "record_param_comms", "parent": 1,
            "inputs": [nid, 0, 0, "wait", [], []],
            "input_shapes": [[], [], [], [], [], []],
            "input_types": ["Int", "Int", "Int", "String", "GenericList[]",
                            "GenericList[]"],
            "outputs": [], "output_shapes": [], "output_types": [],
        }

    return {"schema": "1.0.1", "nodes": [
        comm(10, "all_to_allv", 16 * world, [16] * world, [16] * world),
        comm(12, "all_reduce", 4096),
        wait(14),
        comm(16, "all_to_all", 64 * world),
    ]}


def kineto_fixture(world=8):
    return {"schemaVersion": 1, "traceEvents": [
        {"ph": "X", "cat": "cpu_op", "name": "aten::mm", "ts": 100, "dur": 5,
         "args": {}},
        {"ph": "X", "cat": "cpu_op", "name": "record_param_comms", "ts": 110,
         "dur": 50, "args": {"rank": 0, "comms": "allreduce",
                             "in_msg_size": 4096, "out_msg_size": 4096,
                             "dtype": "Float", "in_split": [],
                             "out_split": []}},
        {"ph": "X", "cat": "cpu_op", "name": "record_param_comms", "ts": 200,
         "dur": 50, "args": {"rank": 1, "comms": "allreduce",
                             "in_msg_size": 4096, "out_msg_size": 4096,
                             "dtype": "Float", "in_split": [],
                             "out_split": []}},
        {"ph": "X", "cat": "cpu_op", "name": "record_param_comms", "ts": 300,
         "dur": 80, "args": {"rank": 0, "comms": "alltoallv",
                             "in_msg_size": 16 * world,
                             "out_msg_size": 16 * world, "dtype": "Float",
                             "in_split": [16] * world,
                             "out_split": [16] * world}},
    ]}


# ----------------------------------------------------------------- parsing
class TestModernSchema:
    def test_parse(self):
        ops = comms_from_pytorch_et(modern_et_fixture(), 0, 8)
        names = [o.comms for o in ops]
        assert names == ["init", "init", "all_to_allv", "all_to_allv",
                         "all_to_all", "all_reduce", "all_reduce",
                         "broadcast", "wait"]
        a2av = ops[2]
        assert a2av.in_msg_size == 128 and a2av.dtype == "int32"
        assert a2av.in_split == [16] * 8
        assert a2av.pg_id == 0 and a2av.group_ranks == list(range(8))
        sub_ar = ops[6]
        assert sub_ar.pg_id == 1 and sub_ar.group_ranks == [0, 2, 4, 6]
        assert sub_ar.world_size == 4
        bc = ops[7]
        assert bc.root == 2  # recorded local rank 2 -> global rank 2

    def test_parse_trace_dispatch(self):
        ops = parse_trace(modern_et_fixture(), "pytorch_et", 0, 8)
        assert len(ops) == 9

    def test_p2p_rank_resolution(self):
        fx = modern_et_fixture()
        # make a send node: recorded rank is the LOCAL peer in pg 1
        send = fx["nodes"][4]
        for a in send["attrs"]:
            if a["name"] == "collective_name":
                a["value"] = "send"
            if a["name"] == "pg_name":
                a["value"] = "1"
        send["inputs"]["values"][2] = ["1", "pg"]
        send["inputs"]["values"][3] = 3  # local rank 3 of [0,2,4,6] -> 6
        ops = comms_from_pytorch_et(fx, target_rank=0, total_ranks=8)
        s = [o for o in ops if o.comms == "send"][0]
        assert s.src_rank == 0 and s.dst_rank == 6


class TestLegacySchema:
    def test_parse(self):
        ops = comms_from_pytorch_et(legacy_et_fixture(), 0, 8)
        names = [o.comms for o in ops]
        assert names == ["all_to_allv", "all_reduce", "wait", "all_to_all"]
        a2av = ops[0]
        # sizes from tensor metadata (nelem field of the tensor tuple)
        assert a2av.in_msg_size == 128 and a2av.out_msg_size == 128
        assert a2av.in_split == [16] * 8
        assert ops[1].in_msg_size == 4096 and ops[1].dtype == "float32"


class TestKineto:
    def test_parse_rank_filter(self):
        ops = comms_from_kineto(kineto_fixture(), target_rank=0)
        assert [o.comms for o in ops] == ["all_reduce", "all_to_allv"]
        assert ops[0].in_msg_size == 4096
        assert ops[1].in_split == [16] * 8
        ops1 = comms_from_kineto(kineto_fixture(), target_rank=1)
        assert [o.comms for o in ops1] == ["all_reduce"]

    def test_bare_event_list(self):
        ops = parse_trace(kineto_fixture()["traceEvents"], "kineto")
        assert len(ops) == 2


# ------------------------------------------------------------------ replay
class TestReplayOnMesh:
    def test_modern_et_end_to_end(self, backend):
        rp = CommsReplay(
            backend,
            ReplayParams(trace_type="pytorch_et", num_replays=1, blocking=True),
        )
        res = rp.run(modern_et_fixture())
        colls = res["collectives"]
        assert colls["all_to_allv"]["count"] == 2
        assert colls["all_reduce"]["count"] == 2
        assert colls["broadcast"]["count"] == 1
        # sub-pg 1 (ranks 0,2,4,6) was created from the trace init op
        assert 1 in rp._pg_cache and rp._pg_cache[1].size == 4

    def test_legacy_et_dry_run(self, backend):
        rp = CommsReplay(
            backend, ReplayParams(trace_type="pytorch_et", dry_run=True)
        )
        stats = rp.run(legacy_et_fixture())["dry_run"]
        assert stats["all_to_allv"]["count"] == 1
        assert stats["all_reduce"]["total_bytes"] == 4096 * 4

    def test_kineto_replay(self, backend):
        rp = CommsReplay(
            backend, ReplayParams(trace_type="kineto", num_replays=1,
                                  blocking=True)
        )
        res = rp.run(kineto_fixture())
        assert res["collectives"]["all_reduce"]["count"] == 1

    def test_auto_shrink_two_rank_trace(self, backend):
        """A 2-rank trace replays on the 8-device mesh under auto-shrink."""
        fx = modern_et_fixture(world=2)
        rp = CommsReplay(
            backend,
            ReplayParams(trace_type="pytorch_et", auto_shrink=True,
                         num_replays=1, blocking=True),
        )
        res = rp.run(fx)
        assert res["collectives"]["all_reduce"]["count"] == 2
        # a2av splits were truncated/rescaled to the 8-rank world
        a2av = [o for o in rp.ops if o.comms == "all_to_allv"][0]
        assert a2av.world_size == 8

    def test_auto_shrink_grows_splits(self, backend):
        """Growing a smaller-world trace must EXPAND the a2av splits to the
        live world even when the parser defaulted world_size to the live
        world (found by the n=16 dryrun gate: an 8-long split behind a
        16-rank world_size built a (16,8) split matrix)."""
        fx = modern_et_fixture(world=2)
        rp = CommsReplay(
            backend,
            ReplayParams(trace_type="pytorch_et", auto_shrink=True,
                         num_replays=1, blocking=True),
        )
        rp.load(fx)
        world = backend.get_world_size()
        for op in rp.ops:
            if op.comms == "all_to_allv":
                assert len(op.in_split) == world, op.in_split
                assert len(op.out_split) == world, op.out_split
                assert op.in_msg_size == sum(op.in_split)
        assert rp.replay_once() > 0


# ------------------------------------------------- reference cross-checks
@pytest.mark.skipif(not os.path.isdir(REF_INPUTS),
                    reason="reference fixtures not available")
class TestReferenceFixtures:
    """Cross-check op counts against the real production traces bundled
    with the reference (read-only; parsed with OUR parser)."""

    def test_resnet_2gpu_modern(self, backend):
        with gzip.open(
            f"{REF_INPUTS}/1.1.0-chakra.0.0.4/resnet_2gpu_et.json.gz", "rt"
        ) as f:
            data = json.load(f)
        ops = comms_from_pytorch_et(data, target_rank=1, total_ranks=2)
        from collections import Counter

        c = Counter(o.comms for o in ops)
        # 27 record_param_comms nodes: 15 all_reduce + 6 broadcast + 6 wait
        assert c["all_reduce"] == 15 and c["broadcast"] == 6 and c["wait"] == 6
        rp = CommsReplay(
            backend,
            ReplayParams(trace_type="pytorch_et", target_rank=1,
                         auto_shrink=True, num_replays=1, blocking=True),
        )
        res = rp.run(data)
        assert res["collectives"]["all_reduce"]["count"] == 15

    def test_dlrm_8rank_legacy(self, backend):
        import tarfile

        t = tarfile.open(f"{REF_INPUTS}/dlrm_pytorch_et.tar.gz")
        name = [n for n in t.getnames() if n.endswith(".json")][0]
        data = json.load(t.extractfile(name))
        ops = comms_from_pytorch_et(data, target_rank=2, total_ranks=8)
        from collections import Counter

        c = Counter(o.comms for o in ops)
        assert c["all_to_allv"] == 4 and c["all_reduce"] == 3
        # an 8-rank production DLRM trace replays natively on the 8-mesh
        rp = CommsReplay(
            backend, ReplayParams(trace_type="pytorch_et", num_replays=1,
                                  blocking=True)
        )
        res = rp.run(data)
        assert res["collectives"]["all_to_allv"]["count"] == 4


# --------------------------------------------------------------------- cli
class TestCli:
    def test_replay_cli_pytorch_et(self, tmp_path):
        p = tmp_path / "et.json.gz"
        with gzip.open(p, "wt") as f:
            json.dump(modern_et_fixture(), f)
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8",
                   PYTHONPATH="/root/repo")
        out = subprocess.run(
            [sys.executable, "-m", "param_tpu.cli.replay",
             "--trace-path", str(p), "--trace-type", "pytorch_et",
             "--dry-run"],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-800:]
        assert "all_to_allv" in out.stdout
