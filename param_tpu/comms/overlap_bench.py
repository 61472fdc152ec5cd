"""Overlap benchmarks: collective×collective and collective×compute.

TPU-native counterparts of the reference's ``commsOverlapBench``
(N concurrent collectives on separate streams/process groups,
``commsOverlapBench.py:36-994``) and ``commsComputeBench`` (a collective
interleaved with N compute kernels per iteration,
``commsComputeBench.py:35-871``).

On GPU the reference overlaps via CUDA streams; on TPU overlap is XLA's
scheduler issuing independent ops concurrently (async collectives riding ICI
while the MXU computes).  Measurement: three chain programs — A alone,
B alone, A+B in the same program — and

    overlap_efficiency = (tA + tB - tAB) / min(tA, tB)

1.0 means the cheaper op was fully hidden; 0.0 means serialization
(reference reports overlapped busBW sum; we report both).

Modes for collective×collective (reference ``--overlap-pair-pgs``):
- ``same-group``: both collectives span all ranks (stream-overlap analogue)
- ``split-pgs``:  mesh reshaped (2, n/2); each half runs its own collective
  over its sub-axis — true disjoint-resource concurrency in one program
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from param_tpu.comms.timing import measure_chain
from param_tpu.utils.bw import alg_bw, bus_bw_factor
from param_tpu.utils.dtypes import dtype_from_name, dtype_size

log = logging.getLogger(__name__)


def _coll_step(name: str, axis: str, damp: float):
    """Shape-preserving chainable collective step (carry in == carry out)."""
    if name == "all_reduce":
        return lambda x: lax.pcast(lax.psum(x, axis) * damp, axis, to="varying")
    if name == "all_to_all":
        return lambda x: lax.all_to_all(x, axis, 0, 0, tiled=True)
    if name == "all_gather":

        def f(x):
            y = lax.all_gather(x, axis, tiled=True)
            n = y.shape[0] // x.shape[0]
            return y.reshape(n, x.shape[0]).mean(axis=0).astype(x.dtype)

        return f
    if name == "reduce_scatter":

        def g(x):
            y = lax.psum_scatter(x, axis, tiled=True)
            reps = x.shape[0] // y.shape[0]
            return jnp.tile(y * damp, reps)

        return g
    raise ValueError(f"unsupported overlap collective {name!r}")


@dataclass
class OverlapResult:
    """N-way overlap measurement: per-collective solo chain times + the
    combined chain where every collective runs at FULL size on its own
    tensor (reference posts main + each pair collective on separate
    ``opTensor_pair`` tensors, commsOverlapBench.py:161-240)."""

    solo_us: tuple
    t_both_us: float

    # 2-way convenience views
    @property
    def t_a_us(self) -> float:
        return self.solo_us[0]

    @property
    def t_b_us(self) -> float:
        return self.solo_us[1]

    @property
    def overlap_efficiency(self) -> float:
        """(sum(solo) - t_both) / (sum(solo) - max(solo)): 1.0 = everything
        hidden behind the longest collective, 0.0 = fully serialized.
        Reduces to the usual saved/min definition for two collectives."""
        total = sum(self.solo_us)
        hideable = total - max(self.solo_us)
        if hideable <= 0:
            return 0.0
        saved = total - self.t_both_us
        return max(0.0, min(1.0, saved / hideable))


class OverlapBench:
    """Collective×collective overlap (reference: commsOverlapBench)."""

    def __init__(self, devices=None, dtype: str = "float32"):
        self.devices = list(devices) if devices is not None else jax.devices()
        self.dtype = dtype_from_name(dtype)
        self.dtype_name = dtype
        self.elem = dtype_size(self.dtype)

    def _mesh1(self) -> Mesh:
        return Mesh(np.array(self.devices), ("rank",))

    def _mesh2(self) -> Mesh:
        n = len(self.devices)
        return Mesh(np.array(self.devices).reshape(2, n // 2), ("pair", "rank"))

    def _make_chain(self, mesh, in_spec, body):
        @functools.lru_cache(maxsize=None)
        def make(n):
            def outer(x):
                def step(s_x, i):
                    s, x = s_x
                    x2 = body(x, i)
                    return (s + jnp.sum(x2.astype(jnp.float32)), x2), None

                (s, _), _ = lax.scan(step, (jnp.float32(0), x), jnp.arange(n))
                return lax.psum(s, mesh.axis_names)

            return jax.jit(
                jax.shard_map(outer, mesh=mesh, in_specs=in_spec, out_specs=P(),
                              check_vma=False)
            )

        return make

    def _make_multi_chain(self, mesh, bodies):
        """Chain builder for ``len(bodies)`` independent full-size buffers:
        each chain step applies body_i to buffer_i (no data dependence
        between them, so XLA may overlap)."""
        nbuf = len(bodies)

        @functools.lru_cache(maxsize=None)
        def make(nn):
            def outer(*xs):
                def step(carry, i):
                    s, vs = carry
                    vs2 = tuple(f(v) for f, v in zip(bodies, vs))
                    s2 = s
                    for v in vs2:
                        s2 = s2 + jnp.sum(v.astype(jnp.float32))
                    return (s2, vs2), None

                (s, _), _ = lax.scan(
                    step, (jnp.float32(0), tuple(xs)), jnp.arange(nn)
                )
                return lax.psum(s, mesh.axis_names)

            return jax.jit(
                jax.shard_map(
                    outer, mesh=mesh, in_specs=(P("rank"),) * nbuf,
                    out_specs=P(), check_vma=False,
                )
            )

        return make

    def run_same_group(
        self, coll_a: str, coll_pair, size_bytes: int, n_hi: int = 16
    ) -> OverlapResult:
        """Main collective + a pair LIST, all over all ranks in one program
        per step; every collective gets its OWN full-``size_bytes`` tensor
        (reference runColl posts main then each pair collective at full
        size under paramStreamGuard, commsOverlapBench.py:161-240).

        ``coll_pair``: one name or a list of names (N-way overlap)."""
        pair = [coll_pair] if isinstance(coll_pair, str) else list(coll_pair)
        names = [coll_a] + pair
        mesh = self._mesh1()
        n = len(self.devices)
        elems = max(n, size_bytes // self.elem) // n * n
        damp = 1.0 / n
        steps = [_coll_step(c, "rank", damp) for c in names]
        xs = tuple(
            jax.device_put(
                np.random.default_rng(seed).random(elems).astype(np.float32),
                NamedSharding(mesh, P("rank")),
            ).astype(self.dtype)
            for seed in range(len(names))
        )

        solos = []
        for f, x in zip(steps, xs):
            mk = self._make_multi_chain(mesh, (f,))
            solos.append(
                measure_chain(lambda nn, mk=mk, x=x: mk(nn)(x), n_hi=n_hi)
            )
        mk_all = self._make_multi_chain(mesh, tuple(steps))
        t_all = measure_chain(lambda nn: mk_all(nn)(*xs), n_hi=n_hi)
        return OverlapResult(tuple(t * 1e6 for t in solos), t_all * 1e6)

    def run_split_pgs(
        self, coll: str, size_bytes: int, n_hi: int = 16
    ) -> OverlapResult:
        """Concurrent process-group overlap (reference: --overlap-pair-pgs,
        commsOverlapBench.py:842-860): mesh (2, n/2), the collective over
        the "rank" sub-axis runs in BOTH halves concurrently; compared
        against one half running alone.  overlap_efficiency 1.0 means the
        two groups don't interfere."""
        if len(self.devices) < 4 or len(self.devices) % 2:
            raise ValueError("split-pgs mode needs an even device count >= 4")
        mesh2 = self._mesh2()
        half = len(self.devices) // 2
        elems = max(half, size_bytes // self.elem) // half * half
        damp = 1.0 / half
        a = _coll_step(coll, "rank", damp)

        x2 = jax.device_put(
            np.random.default_rng(0).random(2 * elems).astype(np.float32),
            NamedSharding(mesh2, P(("pair", "rank"))),
        ).astype(self.dtype)
        mk_both = self._make_chain(mesh2, P(("pair", "rank")), lambda v, i: a(v))

        mesh_half = Mesh(np.array(self.devices[:half]), ("rank",))
        x1 = jax.device_put(
            np.random.default_rng(0).random(elems).astype(np.float32),
            NamedSharding(mesh_half, P("rank")),
        ).astype(self.dtype)
        mk_single = self._make_chain(mesh_half, P("rank"), lambda v, i: a(v))

        t_single = measure_chain(lambda nn: mk_single(nn)(x1), n_hi=n_hi)
        t_both = measure_chain(lambda nn: mk_both(nn)(x2), n_hi=n_hi)
        # both-groups-concurrent vs one-group-alone: tA = tB = t_single
        return OverlapResult((t_single * 1e6, t_single * 1e6), t_both * 1e6)

    def report(self, colls, size_bytes, res: OverlapResult, mode: str):
        """Per-collective solo + overlapped busBW (every collective ran at
        full ``size_bytes`` in the combined chain)."""
        if isinstance(colls, str):
            colls = [colls]
        n = len(self.devices)
        solo_bw = [
            alg_bw(size_bytes, t) * bus_bw_factor(c, n)
            for c, t in zip(colls, res.solo_us)
        ]
        # in the overlapped run every collective finished within t_both
        olap_bw = [
            alg_bw(size_bytes, res.t_both_us) * bus_bw_factor(c, n)
            for c in colls
        ]
        solos = " ".join(
            f"t({c})={t:.1f}us" for c, t in zip(colls, res.solo_us)
        )
        bws = " ".join(
            f"busBW({c})={s:.2f}/{o:.2f}"
            for c, s, o in zip(colls, solo_bw, olap_bw)
        )
        print(
            f"OVERLAP-RES mode={mode} {'+'.join(colls)} size={size_bytes}B "
            f"{solos} tAll={res.t_both_us:.1f}us "
            f"eff={res.overlap_efficiency:.1%} {bws} "
            f"overlapped busBW sum={sum(olap_bw):.2f} GB/s"
        )


class CommsComputeBench:
    """Collective × compute-kernel overlap (reference: commsComputeBench).

    Per chain step: one collective + ``num_compute`` GEMMs (or embedding
    lookups), mutually independent, in one program — XLA overlaps the
    ICI transfer with MXU work."""

    def __init__(self, devices=None, dtype: str = "float32"):
        self.devices = list(devices) if devices is not None else jax.devices()
        self.dtype = dtype_from_name(dtype)
        self.dtype_name = dtype
        self.elem = dtype_size(self.dtype)

    def run(
        self,
        collective: str = "all_reduce",
        size_bytes: int = 1 << 20,
        kernel: str = "gemm",
        mm_dim: int = 1024,
        num_compute: int = 1,
        emb_rows: int = 100_000,
        emb_dim: int = 128,
        emb_batch: int = 2048,
        emb_nnz: int = 30,
        n_hi: int = 16,
    ) -> Dict:
        mesh = Mesh(np.array(self.devices), ("rank",))
        n = len(self.devices)
        elems = max(n, size_bytes // self.elem) // n * n
        damp = 1.0 / n
        coll = _coll_step(collective, "rank", damp)

        rng = np.random.default_rng(0)
        x = jax.device_put(
            rng.random(elems).astype(np.float32), NamedSharding(mesh, P("rank"))
        ).astype(self.dtype)
        if kernel == "gemm":
            a_host = (rng.random((mm_dim, mm_dim)) * 0.01).astype(np.float32)
            ca = jax.device_put(a_host, NamedSharding(mesh, P()))
            ca = ca.astype(self.dtype)

            def compute(i):
                v = ca + i.astype(ca.dtype) * jnp.asarray(1e-6, ca.dtype)
                out = v
                for _ in range(num_compute):
                    out = jnp.dot(out, ca, preferred_element_type=jnp.float32
                                  ).astype(ca.dtype)
                return jnp.sum(out.astype(jnp.float32))

        elif kernel == "emb_lookup":
            table = jax.device_put(
                rng.random((emb_rows, emb_dim), dtype=np.float32),
                NamedSharding(mesh, P()),
            ).astype(self.dtype)
            idx = jax.device_put(
                rng.integers(0, emb_rows, size=(emb_batch, emb_nnz)).astype(
                    np.int32
                ),
                NamedSharding(mesh, P()),
            )

            def compute(i):
                shifted = (idx + i) % emb_rows
                out = jnp.sum(
                    jnp.take(table, shifted, axis=0).astype(jnp.float32), axis=1
                )
                s = jnp.sum(out)
                for _ in range(num_compute - 1):
                    out2 = jnp.sum(
                        jnp.take(table, (shifted + 1) % emb_rows, axis=0
                                 ).astype(jnp.float32), axis=1
                    )
                    s = s + jnp.sum(out2)
                return s

        elif kernel in ("d2h", "h2d"):
            return self._run_host_transfer(
                mesh, collective, kernel, size_bytes, elems, coll, x,
                num_compute, n_hi)
        else:
            raise ValueError(f"unsupported kernel {kernel!r}")

        def make(body):
            @functools.lru_cache(maxsize=None)
            def mk(nn):
                def outer(x):
                    def step(s_x, i):
                        s, v = s_x
                        s2, v2 = body(s, v, i)
                        return (s2, v2), None

                    (s, _), _ = lax.scan(step, (jnp.float32(0), x), jnp.arange(nn))
                    return lax.psum(s, "rank")

                return jax.jit(
                    jax.shard_map(outer, mesh=mesh, in_specs=P("rank"),
                                  out_specs=P(), check_vma=False)
                )

            return mk

        mk_comm = make(lambda s, v, i: (s + jnp.sum(coll(v).astype(jnp.float32)),
                                        coll(v)))
        mk_comp = make(lambda s, v, i: (s + compute(i), v))
        mk_both = make(
            lambda s, v, i: (s + compute(i) + jnp.sum(coll(v).astype(jnp.float32)),
                             coll(v))
        )

        t_comm = measure_chain(lambda nn: mk_comm(nn)(x), n_hi=n_hi)
        t_comp = measure_chain(lambda nn: mk_comp(nn)(x), n_hi=n_hi)
        t_both = measure_chain(lambda nn: mk_both(nn)(x), n_hi=n_hi)
        saved = t_comm + t_comp - t_both
        eff = max(0.0, min(1.0, saved / min(t_comm, t_comp))) if min(t_comm, t_comp) > 0 else 0.0
        out = {
            "collective": collective,
            "kernel": kernel,
            "size_bytes": size_bytes,
            "t_comm_us": t_comm * 1e6,
            "t_compute_us": t_comp * 1e6,
            "t_both_us": t_both * 1e6,
            "overlap_efficiency": eff,
            "bus_bw_gbs": alg_bw(size_bytes, t_both * 1e6)
            * bus_bw_factor(collective, n),
        }
        if kernel == "gemm":
            out["tflops"] = (
                2 * mm_dim**3 * num_compute / (t_both) / 1e12
            )
        return out

    def _run_host_transfer(
        self, mesh, collective, kernel, size_bytes, elems, coll, x,
        num_compute, n_hi,
    ) -> Dict:
        """Collective × host-transfer overlap (reference d2h/h2d memcpy
        compute kernels, pytorch_dist_backend.py:793-857).

        The 'compute' is host-link traffic: ``h2d`` pushes ``num_compute``
        DISTINCT host buffers of ``size_bytes`` per step (device_put —
        nothing cacheable), ``d2h`` fetches the device buffer back to a
        numpy array.  The combined run dispatches the device-side comm
        chain first (async), performs the host transfers while the device
        is busy, then forces both — measuring how much host-link traffic
        hides behind the collective.  On a remote-attached chip the
        transfer includes the tunnel (documented; on a local host this is
        the PCIe/DMA path the reference times)."""

        def mk_comm(nn):
            def outer(v):
                def step(s_v, i):
                    s, v = s_v
                    v2 = coll(v)
                    return (s + jnp.sum(v2.astype(jnp.float32)), v2), None

                (s, _), _ = lax.scan(step, (jnp.float32(0), v), jnp.arange(nn))
                return lax.psum(s, "rank")

            return jax.jit(
                jax.shard_map(outer, mesh=mesh, in_specs=P("rank"),
                              out_specs=P(), check_vma=False)
            )

        mk_comm = functools.lru_cache(maxsize=None)(mk_comm)
        rng = np.random.default_rng(1)
        sharding = NamedSharding(mesh, P("rank"))
        host_bufs = [
            rng.random(elems).astype(np.float32) for _ in range(4)
        ]
        dev_buf = jax.device_put(host_bufs[0], sharding)

        if kernel == "h2d":
            def host_xfer(i):
                buf = jax.device_put(host_bufs[i % len(host_bufs)], sharding)
                return float(jnp.sum(buf))  # forces the push
        else:
            def host_xfer(i):
                return float(np.asarray(dev_buf)[i % elems])  # full fetch

        def xfer_chain(nn):
            s = 0.0
            for i in range(nn * num_compute):
                s += host_xfer(i)
            return s

        def both_chain(nn):
            r = mk_comm(nn)(x)      # async device dispatch
            s = xfer_chain(nn)      # host-link traffic while device is busy
            return float(r) + s     # force both

        t_comm = measure_chain(lambda nn: mk_comm(nn)(x), n_hi=n_hi)
        t_xfer = measure_chain(xfer_chain, n_hi=n_hi)
        t_both = measure_chain(both_chain, n_hi=n_hi)
        saved = t_comm + t_xfer - t_both
        lo = min(t_comm, t_xfer)
        eff = max(0.0, min(1.0, saved / lo)) if lo > 0 else 0.0
        xfer_bytes = size_bytes * num_compute
        return {
            "collective": collective,
            "kernel": kernel,
            "size_bytes": size_bytes,
            "t_comm_us": t_comm * 1e6,
            "t_compute_us": t_xfer * 1e6,
            "t_both_us": t_both * 1e6,
            "overlap_efficiency": eff,
            "bus_bw_gbs": alg_bw(size_bytes, t_both * 1e6)
            * bus_bw_factor(collective, len(self.devices)),
            "host_link_gbs": xfer_bytes / max(t_xfer, 1e-9) / 1e9,
        }

    def report(self, r: Dict) -> None:
        extra = f" TF/s={r['tflops']:.2f}" if "tflops" in r else ""
        if "host_link_gbs" in r:
            extra += f" hostBW={r['host_link_gbs']:.2f} GB/s"
        print(
            f"COMMS-COMPUTE-RES {r['collective']}+{r['kernel']} "
            f"size={r['size_bytes']}B comm={r['t_comm_us']:.1f}us "
            f"compute={r['t_compute_us']:.1f}us both={r['t_both_us']:.1f}us "
            f"eff={r['overlap_efficiency']:.1%} "
            f"busBW={r['bus_bw_gbs']:.2f} GB/s{extra}"
        )
