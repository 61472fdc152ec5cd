"""Kernel-tier ring collectives in Pallas (inter-chip RDMA).

The reference's collective *implementations* live inside NCCL; the TPU
equivalent of "owning the collective kernel" is a Pallas kernel driving the
ICI with ``make_async_remote_copy`` — these implement the classic ring
algorithms by hand:

- :func:`ring_all_gather` — each device forwards chunks around the ring,
  double-buffered (n-1 hops).
- :func:`ring_all_reduce` — reduce-scatter ring phase (accumulate while
  rotating) followed by an all-gather ring phase: the bandwidth-optimal
  2(n-1)/n algorithm.

These are drop-in alternatives to ``lax.all_gather`` / ``lax.psum`` inside
``shard_map`` bodies, benchmarked against the XLA collectives by the
comms tier.  Validated on the simulated CPU mesh via Pallas interpret mode
(which emulates remote DMA); on real multi-chip TPU they compile to ICI
RDMA.  (Pattern reference: the public Pallas TPU distributed-kernels
guide's ring examples.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _neighbor_barrier(my_id, n):
    """Sync with both ring neighbors before touching comm buffers
    (prevents a fast device overwriting a slot the slow neighbor still
    reads)."""
    barrier_sem = pltpu.get_barrier_semaphore()
    left = lax.rem(my_id + n - 1, n)
    right = lax.rem(my_id + 1, n)
    pltpu.semaphore_signal(
        barrier_sem, inc=1, device_id=left,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    pltpu.semaphore_signal(
        barrier_sem, inc=1, device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    pltpu.semaphore_wait(barrier_sem, 2)


def _ring_all_gather_kernel(
    x_ref, o_ref, comm_buf, send_sems, recv_sems, *, axis: str, n: int,
    barrier: bool = True,
):
    my_id = lax.axis_index(axis)
    right = lax.rem(my_id + 1, n)
    if barrier:  # interpret mode can't lower semaphore_wait's poll loop
        _neighbor_barrier(my_id, n)

    # my own chunk
    o_ref[my_id] = x_ref[...]
    comm_buf[0] = x_ref[...]

    # Python loop (n is static): refs inside lax.fori_loop bodies don't
    # lower in interpret mode, and unrolling keeps the slot indices static
    for i in range(n - 1):
        send_slot = i % 2
        recv_slot = (i + 1) % 2
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[send_slot],
            dst_ref=comm_buf.at[recv_slot],
            send_sem=send_sems.at[send_slot],
            recv_sem=recv_sems.at[recv_slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        # after hop i we hold the chunk of the device i+1 to our left
        src = lax.rem(my_id - i - 1 + 2 * n, n)
        o_ref[src] = comm_buf[recv_slot]


def ring_all_gather(x, axis: str, collective_id: int = 7):
    """Inside shard_map: (local,) → (n, local) gathered via the ring.

    Returns the gathered array with a leading axis-size dimension
    (``lax.all_gather(..., tiled=False)`` layout)."""
    n = lax.axis_size(axis)
    return pl.pallas_call(
        functools.partial(_ring_all_gather_kernel, axis=axis, n=n,
                          barrier=not _interpret()),
        out_shape=jax.ShapeDtypeStruct((n, *x.shape), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, *x.shape), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=_interpret(),
    )(x)


def _ring_reduce_scatter_kernel(
    x_ref, o_ref, comm_buf, send_sems, recv_sems, *, axis: str, n: int,
    barrier: bool = True,
):
    """Ring reduce-scatter: x_ref is (n, chunk...); after n-1 hops each
    device holds the full sum of chunk ``my_id + 1`` (mod n)."""
    my_id = lax.axis_index(axis)
    right = lax.rem(my_id + 1, n)
    if barrier:
        _neighbor_barrier(my_id, n)

    # start by sending my chunk[my_id]... classic schedule: at hop i, send
    # the partial sum of chunk (my_id - i) and accumulate what arrives
    comm_buf[0] = x_ref[my_id]

    for i in range(n - 1):
        send_slot = i % 2
        recv_slot = (i + 1) % 2
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[send_slot],
            dst_ref=comm_buf.at[recv_slot],
            send_sem=send_sems.at[send_slot],
            recv_sem=recv_sems.at[recv_slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        # arrived: partial sum of chunk (my_id - i - 1); add my share
        chunk_idx = lax.rem(my_id - i - 1 + 2 * n, n)
        acc = comm_buf[recv_slot] + x_ref[chunk_idx]
        comm_buf[recv_slot] = acc

    final_slot = (n - 1) % 2
    o_ref[...] = comm_buf[final_slot]


def ring_all_reduce(x, axis: str, collective_id: int = 8):
    """Inside shard_map: bandwidth-optimal ring allreduce of the local
    value.  ``x.shape[0]`` must divide by the axis size (chunking dim)."""
    n = lax.axis_size(axis)
    chunk = x.shape[0] // n
    x_chunks = x.reshape(n, chunk, *x.shape[1:])
    # phase 1: ring reduce-scatter — I end up owning the sum of chunk
    # (my_id + 1) mod n
    my_sum = pl.pallas_call(
        functools.partial(_ring_reduce_scatter_kernel, axis=axis, n=n,
                          barrier=not _interpret()),
        out_shape=jax.ShapeDtypeStruct((chunk, *x.shape[1:]), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, *x.shape[1:]), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=_interpret(),
    )(x_chunks)
    # phase 2: ring all-gather of the reduced chunks.  Device d owns the
    # sum of chunk (d+1) mod n, so gathered[k] holds chunk (k+1) mod n;
    # rolling forward by one puts chunk j at index j
    gathered = ring_all_gather(my_sum, axis, collective_id=collective_id + 1)
    rolled = jnp.roll(gathered, shift=1, axis=0)
    return rolled.reshape(x.shape)


def _bidir_all_gather_kernel(
    x_ref, o_ref, cw_buf, ccw_buf, cw_send, cw_recv, ccw_send, ccw_recv,
    *, axis: str, n: int, barrier: bool = True,
):
    """Bidirectional ring all-gather: chunks from left neighbors travel
    clockwise, chunks from right neighbors counter-clockwise — both ICI
    directions carry traffic and the hop count halves (guide pattern:
    bi-directional ring)."""
    my_id = lax.axis_index(axis)
    right = lax.rem(my_id + 1, n)
    left = lax.rem(my_id + n - 1, n)
    if barrier:
        _neighbor_barrier(my_id, n)

    o_ref[my_id] = x_ref[...]
    cw_buf[0] = x_ref[...]
    ccw_buf[0] = x_ref[...]

    cw_hops = (n - 1 + 1) // 2  # chunks my-1 .. my-cw_hops
    ccw_hops = (n - 1) // 2  # chunks my+1 .. my+ccw_hops
    for i in range(max(cw_hops, ccw_hops)):
        send_slot = i % 2
        recv_slot = (i + 1) % 2
        do_cw = i < cw_hops
        do_ccw = i < ccw_hops
        if do_cw:
            rdma_cw = pltpu.make_async_remote_copy(
                src_ref=cw_buf.at[send_slot],
                dst_ref=cw_buf.at[recv_slot],
                send_sem=cw_send.at[send_slot],
                recv_sem=cw_recv.at[recv_slot],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma_cw.start()
        if do_ccw:
            rdma_ccw = pltpu.make_async_remote_copy(
                src_ref=ccw_buf.at[send_slot],
                dst_ref=ccw_buf.at[recv_slot],
                send_sem=ccw_send.at[send_slot],
                recv_sem=ccw_recv.at[recv_slot],
                device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma_ccw.start()
        if do_cw:
            rdma_cw.wait()
            src = lax.rem(my_id - i - 1 + 2 * n, n)
            o_ref[src] = cw_buf[recv_slot]
        if do_ccw:
            rdma_ccw.wait()
            src = lax.rem(my_id + i + 1, n)
            o_ref[src] = ccw_buf[recv_slot]


def ring_all_gather_bidir(x, axis: str, collective_id: int = 9):
    """Bidirectional ring all-gather: (local,) → (n, local)."""
    n = lax.axis_size(axis)
    return pl.pallas_call(
        functools.partial(
            _bidir_all_gather_kernel, axis=axis, n=n, barrier=not _interpret()
        ),
        out_shape=jax.ShapeDtypeStruct((n, *x.shape), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, *x.shape), x.dtype),
            pltpu.VMEM((2, *x.shape), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=_interpret(),
    )(x)


def _loopback_kernel(x_ref, o_ref, send_sem, recv_sem, *, axis: str, n: int,
                     barrier: bool = True):
    my_id = lax.axis_index(axis)
    if barrier:  # interpret mode can't lower semaphore_wait's poll loop
        _neighbor_barrier(my_id, n)
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref, dst_ref=o_ref, send_sem=send_sem, recv_sem=recv_sem,
        device_id=my_id, device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()


def loopback_remote_copy(x, axis: str, collective_id: int = 13):
    """Single-chip SILICON validation slice for the RDMA ring tier.

    Issues a real ``make_async_remote_copy`` whose destination is this
    chip itself (device_id == my own logical id), behind the same
    barrier-semaphore handshake the ring kernels use.  On one real chip
    this exercises every layer the rings depend on — descriptor
    construction, barrier/send/recv semaphores, DMA start/wait — without
    multi-chip ICI links (validated 2026-08-20 on the attached v5e:
    bit-exact round trip).  What it cannot validate is the inter-chip
    wire itself; that remains hardware-blocked (see STATUS.md).
    Run under shard_map over a 1-device mesh."""
    n = lax.axis_size(axis)
    return pl.pallas_call(
        functools.partial(_loopback_kernel, axis=axis, n=n,
                          barrier=not _interpret()),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=_interpret(),
    )(x)
