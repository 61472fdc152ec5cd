"""int4 GEMV kernel tuning sweep (round 5).

Times matmul_int4 on the llama2 serving matrices against the packed-stream
roofline (K*N/2 bytes at 819 GB/s), sweeping block sizes.  Run on the real
chip:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/int4_experiment.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from param_tpu.comms.timing import measure_chain
from param_tpu.ops.matmul import matmul_int4, pack_int4

SHAPES = [(1, 4096, 12288), (1, 4096, 11008), (1, 11008, 4096)]
BLOCKS = [("float-unpack", 512, 512), ("float-unpack", 512, 1024),
          ("float-unpack", 512, 2048), ("float-unpack", 256, 1024),
          ("tile-scale", 512, 1024), ("tile-scale", 512, 2048),
          ("group-dots", 512, 2048)]


def main():
    m_arg = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    r = np.random.default_rng(0)
    for (m, k, n) in SHAPES:
        m = m_arg
        w = jnp.asarray(r.standard_normal((k, n), dtype=np.float32) * 0.05)
        packed, scale = pack_int4(w, 128)
        packed.block_until_ready()
        x = jnp.asarray(r.standard_normal((m, k), dtype=np.float32) * 0.1
                        ).astype(jnp.bfloat16)
        stream = k * n // 2 + scale.nbytes
        print(f"== ({m},{k},{n})  packed {k*n//2/1e6:.1f} MB  "
              f"roofline {stream/819e9*1e6:.0f} us")
        for (var, bn, bk) in BLOCKS:
            if n % bn:
                continue
            try:
                import functools

                @functools.partial(jax.jit, static_argnames="nn")
                def chain(x, packed, scale, nn, bn=bn, bk=bk, var=var):
                    def step(acc, i):
                        xi = x + (acc * 1e-30).astype(x.dtype)
                        y = matmul_int4(xi, packed, scale,
                                        block_n=bn, block_k=bk,
                                        variant=var)
                        return acc + jnp.sum(y.astype(jnp.float32)), None
                    acc, _ = jax.lax.scan(step, jnp.float32(0),
                                          jnp.arange(nn))
                    return acc

                per = measure_chain(
                    lambda nn: chain(x, packed, scale, nn),
                    n_lo=1, n_hi=32, reps=2)
                print(f"  {var:11s} bn={bn:5d} bk={bk:5d}  "
                      f"{per*1e6:8.1f} us  {stream/per/1e9:7.1f} GB/s  "
                      f"{stream/per/819e9*100:5.1f}% of packed roofline")
            except Exception as e:  # noqa: BLE001
                print(f"  {var:11s} bn={bn:5d} bk={bk:5d}  "
                      f"FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
