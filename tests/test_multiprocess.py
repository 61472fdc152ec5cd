"""Multi-process (multi-host-model) validation.

Spawns N real processes connected via jax.distributed (2 simulated CPU
devices each) and runs cross-process collectives + a sharded DLRM loss
through the backend — the code path a real TPU pod uses.  The reference
only exercises this manually under mpirun (SURVEY.md §4).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nprocs: int, timeout: int = 240):
    port = _free_port()
    env = dict(os.environ)
    # repo only — the axon sitecustomize on the inherited PYTHONPATH would
    # lock the platform before the worker's env vars apply
    env["PYTHONPATH"] = os.getcwd()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/multiprocess_worker.py",
             str(i), str(nprocs), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    return outs


class TestMultiProcess:
    def test_two_process_world(self):
        outs = _run_workers(2)
        losses = set()
        p50s = set()
        for rc, out in outs:
            assert rc == 0, out[-1500:]
            line = [l for l in out.splitlines() if l.startswith("RESULT")]
            assert line, out[-800:]
            assert "world=4" in line[0]
            losses.add(line[0].split("dlrm_loss=")[1])
            if os.path.isdir("/root/reference"):
                # the real production trace replayed under this world too
                assert any("trace_replay_ok" in l for l in line), out[-800:]
            assert any("et_replay_parity_ok" in l for l in line), out[-800:]
            # cross-rank pooled percentiles: same p50 on every process
            bench = [l for l in line if "bench_p50=" in l]
            assert bench, out[-800:]
            p50s.add(bench[0].split("bench_p50=")[1])
            assert any("sweep_dcheck_ok" in l for l in line), out[-800:]
            # round-5 tiers across REAL processes: dp x tp transformer
            # step parity and ep MoE a2a oracle parity
            assert any("tp_transformer_ok" in l for l in line), out[-800:]
            assert any("ep_moe_ok" in l for l in line), out[-800:]
        # every process computes the same global loss and, via the
        # cross-rank sample gather, the same pooled bench percentiles
        assert len(losses) == 1
        assert len(p50s) == 1


class TestFourProcessWorld:
    def test_exact_scale_trace_replay(self):
        """4 processes x 2 devices = the production trace's EXACT 8-rank
        world: every process computes the same global DLRM loss and
        replays the real reference trace without shrinking."""
        outs = _run_workers(4, timeout=400)
        losses = set()
        for rc, out in outs:
            assert rc == 0, out[-1500:]
            lines = [l for l in out.splitlines() if l.startswith("RESULT")]
            assert any("world=8" in l for l in lines), out[-800:]
            losses.add([l for l in lines if "dlrm_loss" in l][0]
                       .split("dlrm_loss=")[1])
            if os.path.isdir("/root/reference"):
                assert any("trace_replay_ok" in l for l in lines)
        assert len(losses) == 1


class TestDryrunScaling:
    """The driver gate generalizes beyond n=8: all four flagship paths
    (dense/ragged/sparse/capture->replay) compile and run at n=16."""

    def test_dryrun_16_devices(self):
        import subprocess
        import sys

        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=16",
            PYTHONPATH="/root/repo",
        )
        out = subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(16)"],
            env=env, capture_output=True, text=True, timeout=560,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "capture->replay" in out.stdout and "output parity OK" in out.stdout
