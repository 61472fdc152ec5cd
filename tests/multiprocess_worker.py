"""Worker for the multi-process (multi-host-model) validation test.

Spawned by tests/test_multiprocess.py: N processes × 2 simulated CPU devices
each, connected via jax.distributed — the same code path a real multi-host
TPU pod uses (the reference validates this only manually under mpirun;
SURVEY.md §4).
"""

import os
import sys


def main() -> int:
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from param_tpu.backend import CollectiveArgs, TpuBackend

    b = TpuBackend()
    b.initialize()
    world = b.get_world_size()
    assert world == 2 * nprocs, world
    g = b.get_default_group()
    sh = NamedSharding(g.mesh, P("rank"))

    # ---- cross-process all_reduce (rank pattern: process p contributes p+1)
    x = jax.make_array_from_process_local_data(
        sh, np.full((2,), float(proc_id + 1), dtype=np.float32), (world,)
    )
    out = b.all_reduce(CollectiveArgs(in_tensor=x))
    b.complete_ops()
    # two devices per process each contribute (p+1)
    expect = sum((p + 1) for p in range(nprocs) for _ in range(2))
    for s in out.addressable_shards:
        assert np.allclose(np.asarray(s.data), expect), (
            proc_id, np.asarray(s.data), expect)

    # ---- cross-process all_to_all
    # every device sends chunk j (value j) to device j; after the tiled
    # a2a device d holds [d, d, ...] — one element from every sender
    x2 = jax.make_array_from_process_local_data(
        sh, np.tile(np.arange(world, dtype=np.float32), 2), (world * world,)
    )
    out2 = b.all_to_all(CollectiveArgs(in_tensor=x2))
    b.complete_ops()
    # each local device d holds, after a2a, the d-th chunk from every sender:
    for s in out2.addressable_shards:
        dev_rank = g.devices.index(s.device)
        assert np.allclose(np.asarray(s.data), float(dev_rank)), (
            proc_id, dev_rank, np.asarray(s.data))

    # ---- sharded DLRM loss across processes
    import optax

    from param_tpu.models.dlrm import DlrmConfig, DlrmModel, init_dlrm_params

    cfg = DlrmConfig(
        num_tables=world, rows_per_table=64, emb_dim=8, nnz=2,
        dense_dim=8, bot_mlp=[16, 8], top_mlp=[16, 1], batch=world * 4,
    )
    # the model adopts the backend mesh's axis name directly
    model = DlrmModel(cfg, g.mesh)
    # deterministic params on every process (same key)
    params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
    param_sh, data_sh = model.shardings()
    params = jax.tree.map(
        lambda a, s: jax.make_array_from_callback(
            a.shape, s, lambda idx, _a=a: np.asarray(_a)[idx]
        ),
        params,
        param_sh,
    )
    rng = np.random.default_rng(0)
    dense = rng.normal(size=(cfg.batch, cfg.dense_dim)).astype(np.float32)
    idx = rng.integers(0, 64, size=(cfg.batch, world, 2)).astype(np.int32)
    labels = rng.integers(0, 2, size=(cfg.batch,)).astype(np.float32)
    d_sh, i_sh, l_sh = data_sh
    mk = lambda arr, s: jax.make_array_from_callback(  # noqa: E731
        arr.shape, s, lambda ix, _a=arr: _a[ix]
    )
    loss = model.make_sharded_loss()(
        params, mk(dense, d_sh), mk(idx, i_sh), mk(labels, l_sh)
    )
    lval = float(loss)
    assert np.isfinite(lval)
    print(f"RESULT proc={proc_id} world={world} dlrm_loss={lval:.6f}", flush=True)

    # ---- REAL production-trace replay across processes (reference's
    # 8-rank DLRM PyTorch-ET, auto-shrunk onto this multi-process world)
    ref = "/root/reference/et_replay/tests/inputs/dlrm_pytorch_et.tar.gz"
    if os.path.exists(ref):
        import json
        import tarfile
        import tempfile

        from param_tpu.trace.replay import CommsReplay, ReplayParams

        with tempfile.TemporaryDirectory() as td:
            with tarfile.open(ref) as t:
                t.extractall(td, filter="data")
            with open(os.path.join(td, "dlrm_pytorch_et",
                                   "dlrm_eg_0.json")) as f:
                trace = json.load(f)
        rp = CommsReplay(b, ReplayParams(
            trace_type="pytorch_et", target_rank=0, auto_shrink=True,
            num_replays=1, num_warmup_replays=0))
        rp.load(trace)
        stats = rp.dry_run_stats()
        assert stats["all_to_allv"]["count"] >= 4
        t_replay = rp.replay_once()
        assert t_replay > 0
        print(f"RESULT proc={proc_id} trace_replay_ok "
              f"ops={len(rp.records)}", flush=True)

    # ---- ET capture -> op-level replay across processes (exact parity)
    from param_tpu.trace.capture import capture_execution_trace
    from param_tpu.trace.et_replay import EtReplayManager

    loss_fn = model.make_sharded_loss()
    args = (params, mk(dense, d_sh), mk(idx, i_sh), mk(labels, l_sh))
    et = capture_execution_trace(loss_fn, *args)
    flat_in, _ = jax.tree.flatten(args)
    mgr = EtReplayManager(
        et, mesh=g.mesh,
        inputs={t: v for t, v in zip(et.in_tensors, flat_in)})
    rout = mgr.replay(iters=1)
    assert not rout["errors"], rout["errors"]
    got = float(np.asarray(mgr.registry[et.out_tensors[0]]))
    assert abs(got - lval) < 1e-6, (got, lval)
    print(f"RESULT proc={proc_id} et_replay_parity_ok", flush=True)

    # ---- DLRM bench regions with cross-rank sample pooling (the
    # multi-host percentile path, reference dlrm.py:1044-1063)
    import optax

    from param_tpu.models.dlrm_bench import DlrmCommBench

    bench = DlrmCommBench(model, optax.sgd(0.01))
    res = bench.run(reps=1, n_hi=2, max_n=4, regions=["fwd_a2a"])
    p50 = res["fwd_a2a"]["p50_us"]
    assert p50 > 0
    print(f"RESULT proc={proc_id} bench_p50={p50:.4f}", flush=True)

    # ---- collective sweep + dcheck across processes (graph-mode chains,
    # local-shard validation — dcheck skips non-addressable ranks)
    from param_tpu.comms.coll_bench import CollBench
    from param_tpu.comms.harness import CommsParams

    cp = CommsParams(begin_size=256, end_size=256, num_iters=3,
                     num_warmup_iters=1, dcheck=True,
                     collectives=["all_reduce", "all_to_all", "reduce"])
    cb = CollBench(b, cp, reps=1)
    for coll in cp.collectives:
        r = cb.run_one(coll, 256, g)
        assert r.pct(50) > 0, coll
        assert r.dcheck_ok is True, (coll, r.dcheck_ok)
    print(f"RESULT proc={proc_id} sweep_dcheck_ok", flush=True)

    # transformer tiers across REAL processes: a dp x tp block train
    # step (XLA-inserted collectives spanning the process boundary) and
    # an ep MoE a2a dispatch with oracle parity
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from param_tpu.models.transformer import (
        TransformerConfig, init_params, make_sharded_train_step,
        make_train_step, place)

    tcfg = TransformerConfig(batch=2 * world, seq=32, emb=32, heads=2,
                             ffn=64, attention="xla", dtype="float32")
    mesh_t = Mesh(np.array(jax.devices()).reshape(world // 2, 2),
                  ("dp", "tp"))
    tparams = init_params(jax.random.PRNGKey(3), tcfg)
    tx = jax.random.normal(jax.random.PRNGKey(4),
                           (tcfg.batch, tcfg.seq, tcfg.emb),
                           jnp.float32) * 0.1
    _, want_t = jax.jit(make_train_step(tcfg))(tparams, tx)
    # cross-process device_put needs host (numpy) values, identical on
    # every process — each contributes its addressable shards
    tparams_np = jax.tree.map(np.asarray, tparams)
    p_sh, x_sh = place(tparams_np, np.asarray(tx), mesh_t, tcfg)
    _, got_t = make_sharded_train_step(mesh_t, tcfg)(p_sh, x_sh)
    from param_tpu.comms.timing import fetch_scalar
    gv, wv = fetch_scalar(got_t), fetch_scalar(want_t)
    assert abs(gv - wv) < 1e-5 + 1e-5 * abs(wv), (gv, wv)
    print(f"RESULT proc={proc_id} tp_transformer_ok loss={gv:.6f}",
          flush=True)

    from param_tpu.models.moe import (
        MoeConfig, init_moe_params, moe_apply_ep, moe_apply_reference,
        moe_param_specs)

    mcfg = MoeConfig(emb=16, ffn=32, n_experts=world)
    mparams = init_moe_params(jax.random.PRNGKey(11), mcfg)
    mx = jax.random.normal(jax.random.PRNGKey(12),
                           (world * 8, mcfg.emb), jnp.float32) * 0.5
    mesh_e = Mesh(np.array(jax.devices()), ("ep",))
    from jax.sharding import NamedSharding

    mparams_g = {
        k2: jax.device_put(np.asarray(mparams[k2]),
                           NamedSharding(mesh_e, s2))
        for k2, s2 in moe_param_specs().items()
    }
    mx_g = jax.device_put(np.asarray(mx), NamedSharding(mesh_e, P("ep")))
    mgot = jax.jit(jax.shard_map(
        lambda p, x: moe_apply_ep(p, x, "ep", mcfg),
        mesh=mesh_e, in_specs=(moe_param_specs(), P("ep")),
        out_specs=P("ep"), check_vma=False))(mparams_g, mx_g)
    mwant = np.asarray(moe_apply_reference(mparams, mx, mcfg,
                                           n_senders=world))
    # the global output spans non-addressable devices: compare THIS
    # process's shards against the matching oracle slices
    merr = 0.0
    for sh in mgot.addressable_shards:
        merr = max(merr, float(np.max(np.abs(
            np.asarray(sh.data) - mwant[sh.index]))))
    assert merr < 2e-5, merr
    print(f"RESULT proc={proc_id} ep_moe_ok err={merr:.1e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
