"""Wide-MLP roofline study: mlp_A (18, 4096, 4096, 4096, 128) bf16 — the
second half of VERDICT r2 weak #4 ("mlp_A 18x4096 b128 is 30.1%").

Roofline arithmetic (chip v5e: ~197 bf16 TF/s, ~819 GB/s HBM):

- train flops      = 6*B*sum(I*O)  = 6*128*18*4096^2 = 231.9 GFLOP
-> 1.18 ms MXU floor
- weight bytes     = 18*4096^2*2   = 604 MB bf16 (activations: 1 MB/layer,
  negligible at B=128)
- train-step weight passes: fwd reads W, bwd-dx reads W, SGD reads W and
  writes W  ->  >=4 full-table passes = 2.42 GB  ->  2.95 ms HBM floor
  (3 passes = 2.21 ms if XLA fuses the dW matmul into the update)
- so the shape is MEMORY-bound: best possible train step is ~40% of
  compute peak at spec bandwidth; "30.1% of compute roofline" is the
  wrong axis.  This study measures the ACHIEVABLE stream floor on the
  same 604 MB weight set and reports the train step against it.

Measured paths (chain timing, medians):
  1. pure weight-stream floor (one full read of the 604 MB stack per step)
  2. fwd-only chain   (1 weight pass/step)
  3. train chain sgd  (the 30.1% number under test, ~4 passes/step)
  4. train chain b2048 for contrast (compute-bound regime)

Reference contract: pytorch_linear.py's train loop measures the same
fwd+bwd+opt step (train/compute/pt/pytorch_linear.py:100-170,338-346).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/mlp_roofline.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from param_tpu.comms.timing import measure_chain
from param_tpu.ops.mlp import init_mlp, mlp_flops, mlp_forward
from param_tpu.utils.chip import detect_chip, matmul_roofline_tflops

L, DIN, H, DOUT, B = 18, 4096, 4096, 4096, 128
DT = jnp.bfloat16
DIMS = [DIN] + [H] * (L - 1) + [DOUT]
W_BYTES = sum(a * b for a, b in zip(DIMS[:-1], DIMS[1:])) * 2


def stream_chain(ws, n):
    """One full elementwise pass over the weight stack per scan step.

    `jnp.sum(|ws + c|)` with a step-dependent scalar defeats both
    loop-invariant hoisting and the algebraic sum(ws*c)=c*sum(ws) rewrite.
    """

    def step(s, i):
        c = i.astype(ws.dtype) * jnp.asarray(1e-6, ws.dtype)
        return s + jnp.sum(jnp.abs(ws + c).astype(jnp.float32)), None

    s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
    return s


def fwd_chain(params, x, n):
    def step(s, i):
        out = mlp_forward(params, x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
        return s + jnp.sum(out.astype(jnp.float32)), None

    s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
    return s


def train_chain(params, st, x, y, opt, n):
    def loss_fn(p, xx):
        out = mlp_forward(p, xx).astype(jnp.float32)
        return jnp.mean((out - y) ** 2)

    def step(carry, i):
        p, s = carry
        xx = x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
        l, grads = jax.value_and_grad(loss_fn)(p, xx)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), l

    (_, _), losses = lax.scan(step, (params, st), jnp.arange(n))
    return losses[-1]


def manual_fused_chain(params, x, y, n, lr=0.01):
    """Hand-fused backward+SGD: per layer, W' = W - lr*(actᵀ@dy) written
    directly off the GEMM output (XLA output fusion) — dW is never a
    named intermediate, saving its write+read (2 full weight passes)."""

    def train_step(params, xx):
        acts = [xx]
        h = xx
        for i, (w, b) in enumerate(params):
            z = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(
                w.dtype) + b
            h = jax.nn.relu(z) if i < len(params) - 1 else z
            acts.append(h)
        out = acts[-1].astype(jnp.float32)
        loss = jnp.mean((out - y) ** 2)
        dy = (2.0 / out.size) * (out - y)
        new_params = [None] * len(params)
        for i in reversed(range(len(params))):
            w, b = params[i]
            a = acts[i]
            dyc = dy.astype(w.dtype)
            dw = jnp.dot(a.T, dyc, preferred_element_type=jnp.float32)
            db = jnp.sum(dyc.astype(jnp.float32), axis=0)
            new_params[i] = (
                (w.astype(jnp.float32) - lr * dw).astype(w.dtype),
                (b.astype(jnp.float32) - lr * db).astype(b.dtype),
            )
            if i > 0:
                dx = jnp.dot(dyc, w.T, preferred_element_type=jnp.float32)
                dy = dx * (acts[i] > 0).astype(dx.dtype)  # relu'
        return new_params, loss

    def step(carry, i):
        p, = carry
        xx = x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
        p, l = train_step(p, xx)
        return (p,), l

    (_,), losses = lax.scan(step, (params,), jnp.arange(n))
    return losses[-1]


def plain_sgd_chain(params, x, y, n, lr=0.01):
    """jax.grad + tree_map update (no optax) — isolates optax's cost."""

    def loss_fn(p, xx):
        out = mlp_forward(p, xx).astype(jnp.float32)
        return jnp.mean((out - y) ** 2)

    def step(carry, i):
        p, = carry
        xx = x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
        l, grads = jax.value_and_grad(loss_fn)(p, xx)
        p = jax.tree.map(lambda w, g: (w.astype(jnp.float32)
                                       - lr * g.astype(jnp.float32)
                                       ).astype(w.dtype), p, grads)
        return (p,), l

    (_,), losses = lax.scan(step, (params,), jnp.arange(n))
    return losses[-1]


def main():
    chip = detect_chip()
    peak = matmul_roofline_tflops(chip, "bfloat16")
    hbm = chip.hbm_gbs
    flops = mlp_flops(DIMS, B)
    print(f"chip={chip.name}  bf16 peak={peak:.1f} TF/s  HBM={hbm:.1f} GB/s")
    print(f"weights: {W_BYTES/1e6:.0f} MB bf16; train flops {flops/1e9:.1f} GFLOP")
    print(f"MXU floor {flops/(peak*1e12)*1e3:.2f} ms; HBM floors: "
          f"1-pass {W_BYTES/hbm/1e6:.2f} ms, "
          f"3-pass {3*W_BYTES/hbm/1e6:.2f} ms, "
          f"4-pass {4*W_BYTES/hbm/1e6:.2f} ms")

    rng = np.random.default_rng(0)
    params = init_mlp(jax.random.PRNGKey(0), DIMS, DT)
    ws = jnp.stack([w for w, _ in params])  # (18, 4096, 4096) bf16

    # arrays must be jit ARGUMENTS (closure constants embed in the HLO
    # upload -> HTTP 413 on axon)
    jstream = jax.jit(stream_chain, static_argnums=1)
    per = measure_chain(lambda n: jstream(ws, n), n_lo=1, n_hi=8, max_n=64)
    bw = W_BYTES / per / 1e9
    print(f"\n  measured 1-pass stream floor      {per*1e3:8.3f} ms/step "
          f"({bw:6.1f} GB/s = {bw/hbm*100:.1f}% of spec)")

    x = jnp.asarray(rng.random((B, DIN), dtype=np.float32)).astype(DT)
    y = jnp.asarray(rng.random((B, DOUT), dtype=np.float32))
    jfwd = jax.jit(fwd_chain, static_argnums=2)
    per_f = measure_chain(lambda n: jfwd(params, x, n),
                          n_lo=1, n_hi=8, max_n=64)
    f_fwd = mlp_flops(DIMS, B, fwd_only=True)
    print(f"  fwd-only b{B}                       {per_f*1e3:8.3f} ms/step "
          f"({f_fwd/per_f/1e12:6.1f} TF/s; {per/per_f*100:5.1f}% "
          f"of a 1-pass bound)")

    opt = optax.sgd(0.01)
    st = opt.init(params)
    jtrain = jax.jit(train_chain, static_argnums=(4, 5))
    per_t = measure_chain(lambda n: jtrain(params, st, x, y, opt, n),
                          n_lo=1, n_hi=8, max_n=32)
    passes = per_t / per
    print(f"  train sgd b{B}                      {per_t*1e3:8.3f} ms/step "
          f"({flops/per_t/1e12:6.1f} TF/s = {flops/per_t/1e12/peak*100:.1f}% "
          f"compute peak; {passes:.2f} measured weight-passes)")

    jplain = jax.jit(plain_sgd_chain, static_argnums=3)
    per_p = measure_chain(lambda n: jplain(params, x, y, n),
                          n_lo=1, n_hi=8, max_n=32)
    print(f"  train sgd b{B} (no optax)           {per_p*1e3:8.3f} ms/step "
          f"({flops/per_p/1e12:6.1f} TF/s = {flops/per_p/1e12/peak*100:.1f}% "
          f"compute peak; {per_p/per:.2f} passes)")

    jfused = jax.jit(manual_fused_chain, static_argnums=3)
    per_m = measure_chain(lambda n: jfused(params, x, y, n),
                          n_lo=1, n_hi=8, max_n=32)
    print(f"  train sgd b{B} (fused bwd+update)   {per_m*1e3:8.3f} ms/step "
          f"({flops/per_m/1e12:6.1f} TF/s = {flops/per_m/1e12/peak*100:.1f}% "
          f"compute peak; {per_m/per:.2f} passes)")

    B2 = 2048
    x2 = jnp.asarray(rng.random((B2, DIN), dtype=np.float32)).astype(DT)
    y2 = jnp.asarray(rng.random((B2, DOUT), dtype=np.float32))
    per_t2 = measure_chain(lambda n: jtrain(params, st, x2, y2, opt, n),
                           n_lo=1, n_hi=8, max_n=16)
    f2 = mlp_flops(DIMS, B2)
    print(f"  train sgd b{B2}                     {per_t2*1e3:8.3f} ms/step "
          f"({f2/per_t2/1e12:6.1f} TF/s = {f2/per_t2/1e12/peak*100:.1f}% "
          f"compute peak)")


if __name__ == "__main__":
    main()
