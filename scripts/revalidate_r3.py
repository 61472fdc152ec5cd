"""Round-3 TPU re-validation queue (VERDICT r2 #1, STATUS.md:31-34).

Re-earns on-chip every number that round 2 shipped CPU-mesh-only after the
relay outage:

  1. Sparse-update train steps AFTER the adagrad-factor fix (optax
     scale_by_rss semantics, git 9a6385f): full sparse-adagrad /
     sparse-SGD step timings at 8x1Mx64 (2 GB) and 8x100kx64, pallas
     (packed) vs xla (unpacked) — plus an ON-CHIP parity check of the
     Pallas kernel path vs the XLA path (interpret-mode tests don't prove
     the chip's DMA semantics).
  2. emb_A big-table rows: 14M-row batch 16384, 26M-row (13 GB table,
     device-side generation) batches 8192/16384.
  3. emb_B padded sweep (lane-padded 56-dim tables, the default since
     f4e70d5).
  4. Quantized graph-mode sweep: all_reduce bitwidth 32/16/8 with the
     quant/dequant overhead split (single-chip: the collective is local,
     so the quantize+dequantize compute cost is the meaningful part).

Writes RESULTS_R3.md progressively (section by section) so a relay death
mid-run loses nothing.  One TPU process; chains are scalar-fetch delta-N
(param_tpu.comms.timing.measure_chain) per the axon timing rules.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/revalidate_r3.py
"""

from __future__ import annotations

import datetime
import functools
import io
import subprocess
import sys
import time
from contextlib import redirect_stdout

OUT_PATH = "RESULTS_R3.md"
_SECTIONS = []


def capture(title, fn):
    print(f"== {title}", flush=True)
    buf = io.StringIO()
    t0 = time.time()
    try:
        with redirect_stdout(buf):
            fn()
    except Exception as e:  # noqa: BLE001
        import traceback

        buf.write(f"\nFAILED: {str(e)[:400]}\n")
        traceback.print_exc()
    buf.write(f"\n[{time.time()-t0:.0f}s]\n")
    _SECTIONS.append((title, buf.getvalue()))
    print(buf.getvalue(), flush=True)
    with open(OUT_PATH, "w") as f:
        f.write("# Round-3 TPU re-validation (VERDICT r2 #1)\n")
        f.write(
            f"Date: {datetime.datetime.now().isoformat(timespec='minutes')}\n\n"
        )
        for t, body in _SECTIONS:
            f.write(f"## {t}\n\n```\n{body.strip()}\n```\n\n")


# ===================================================================
# 1. sparse-update train steps (post adagrad-factor fix)
# ===================================================================


def _make_model(rows, packed):
    import jax
    from jax.sharding import Mesh
    import numpy as np

    from param_tpu.models.dlrm import DlrmConfig, DlrmModel

    cfg = DlrmConfig(
        num_tables=8, rows_per_table=rows, emb_dim=64, nnz=10,
        dense_dim=64, batch=2048,
    )
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    return DlrmModel(cfg, mesh, packed_tables=packed), cfg


def _make_inputs(model, cfg, seed=0):
    """Params with DEVICE-generated tables (a 2 GB host push through the
    tunnel takes minutes — same workaround as bench_emb's big tables)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from param_tpu.models.dlrm import DlrmConfig, init_dlrm_params

    small = DlrmConfig(
        num_tables=cfg.num_tables, rows_per_table=128, emb_dim=cfg.emb_dim,
        nnz=cfg.nnz, dense_dim=cfg.dense_dim, batch=cfg.batch,
    )
    params = init_dlrm_params(jax.random.PRNGKey(seed), small)
    shape = (
        model.table_storage_shape
        if model.packed
        else (cfg.num_tables, cfg.rows_per_table, cfg.emb_dim)
    )

    @jax.jit
    def dev_tables(key):
        return jax.random.uniform(key, shape, jnp.float32) * 0.01

    params = dict(params)
    params["tables"] = dev_tables(jax.random.PRNGKey(seed + 1))
    rng = np.random.default_rng(seed)
    dense = jnp.asarray(
        rng.standard_normal((cfg.batch, cfg.dense_dim), dtype=np.float32))
    idx = jnp.asarray(rng.integers(
        0, cfg.rows_per_table,
        size=(cfg.batch, cfg.num_tables, cfg.nnz)).astype(np.int32))
    labels = jnp.asarray(
        rng.integers(0, 2, size=(cfg.batch,)).astype(np.float32))
    return params, dense, idx, labels


def _chain_step(model, step, has_acc, params, dense, idx, labels, E):
    import jax
    import jax.numpy as jnp
    from jax import lax

    acc = model.init_adagrad_state(params) if has_acc else jnp.float32(0)

    @functools.partial(jax.jit, static_argnames="n")
    def chain(params, acc, dense, idx, labels, n):
        def body(carry, i):
            p, a = carry
            sh = (idx + i) % E
            if has_acc:
                p2, a2, loss = step(p, a, dense, sh, labels)
            else:
                p2, loss = step(p, dense, sh, labels)
                a2 = a
            return (p2, a2), loss

        (_, _), losses = lax.scan(body, (params, acc), jnp.arange(n))
        return jnp.sum(losses)

    return lambda n: chain(params, acc, dense, idx, labels, n=n)


def sparse_steps(rows, variants):
    from param_tpu.comms.timing import measure_chain

    for name, packed, opt, mode in variants:
        model, cfg = _make_model(rows, packed)
        params, dense, idx, labels = _make_inputs(model, cfg)
        if opt == "adagrad":
            step = model.make_sparse_adagrad_step(
                jit=False, table_update=mode)
            has_acc = True
        else:
            step = model.make_sparse_sgd_step(jit=False, table_update=mode)
            has_acc = False
        fn = _chain_step(model, step, has_acc, params, dense, idx, labels,
                         cfg.rows_per_table)
        per = measure_chain(fn, n_lo=1, n_hi=4, reps=3, adaptive=False)
        qps = cfg.batch / per
        print(f"  {name:34s} {per*1e3:9.2f} ms/step  ({qps/1e3:7.1f}k QPS)",
              flush=True)


def sparse_parity_on_chip():
    """Pallas kernel path vs XLA path, SAME inputs, on the real chip."""
    import jax.numpy as jnp
    import numpy as np

    outs = {}
    for name, packed, mode in (
        ("xla-unpacked", False, "xla"),
        ("pallas-packed", True, "pallas"),
    ):
        model, cfg = _make_model(2048, packed)
        params, dense, idx, labels = _make_inputs(model, cfg, seed=7)
        step = model.make_sparse_adagrad_step(jit=True, table_update=mode)
        acc = model.init_adagrad_state(params)
        p2, a2, loss = step(params, acc, dense, idx, labels)
        p2 = model.unpack_params(p2)
        outs[name] = (np.asarray(p2["tables"]), float(loss))
    ta, tb = outs["xla-unpacked"][0], outs["pallas-packed"][0]
    err = float(np.max(np.abs(ta - tb)))
    print(f"  adagrad tables max|xla - pallas| = {err:.3e} "
          f"(loss {outs['xla-unpacked'][1]:.6f} / "
          f"{outs['pallas-packed'][1]:.6f})")
    assert err < 1e-5, err
    print("  ON-CHIP PARITY OK")


# ===================================================================
# 2/3. embedding sweeps
# ===================================================================


def emb_a_rows():
    from param_tpu.ops.compute_bench import bench_emb, print_results

    cfgs = [
        (14_000_000, 128, 30, 16384),
        (26_000_000, 128, 30, 8192),
        (26_000_000, 128, 30, 16384),
    ]
    print_results(bench_emb(cfgs, n_hi=8, reps=2), "float32")


def emb_b_padded():
    from param_tpu.ops import datasets
    from param_tpu.ops.compute_bench import bench_emb, print_results

    print_results(bench_emb(datasets.EMB_B[:4], n_hi=8, reps=2), "float32")


# ===================================================================
# 4. quantized graph-mode sweep (subprocess per bitwidth)
# ===================================================================


def quantized_sweep():
    import os

    for bw in (32, 16, 8):
        cmd = [
            sys.executable, "-m", "param_tpu.cli.comms",
            "--collective", "all_reduce", "--b", "1M", "--e", "64M",
            "--bitwidth", str(bw), "--n", "16", "--reps", "3",
        ]
        if bw != 32:
            cmd += ["--profile", f"/tmp/prof_quant_{bw}"]
        print(f"$ bitwidth={bw}", flush=True)
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1800,
            env=dict(os.environ),
        )
        body = "\n".join(
            ln for ln in (r.stdout + r.stderr).splitlines()
            if "COMMS-RES" in ln or "quant" in ln or "GB/s" in ln
            or ln.startswith("  ")
        )
        print(body if body.strip() else (r.stdout + r.stderr)[-2000:],
              flush=True)


def main():
    capture("Sparse-update ON-CHIP parity (pallas kernel vs xla path)",
            sparse_parity_on_chip)
    capture(
        "Sparse train steps 8x100kx64 b2048 nnz10 (post adagrad-factor fix)",
        lambda: sparse_steps(100_000, [
            ("adagrad xla, unpacked", False, "adagrad", "xla"),
            ("adagrad pallas, packed", True, "adagrad", "pallas"),
        ]),
    )
    capture(
        "Sparse train steps 8x1Mx64 (2 GB) b2048 nnz10",
        lambda: sparse_steps(1_000_000, [
            ("adagrad xla, unpacked", False, "adagrad", "xla"),
            ("adagrad pallas, packed", True, "adagrad", "pallas"),
            ("sgd pallas, packed", True, "sgd", "pallas"),
        ]),
    )
    capture("EmbeddingBag emb_A big tables (14M b16384; 26M b8192/16384)",
            emb_a_rows)
    capture("EmbeddingBag emb_B padded sweep (4.8Mx56)", emb_b_padded)
    capture("Quantized graph-mode all_reduce sweep (bitwidth 32/16/8)",
            quantized_sweep)
    print("DONE", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time()-t0:.0f}s")
