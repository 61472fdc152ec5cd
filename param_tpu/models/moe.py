"""Expert-parallel Mixture-of-Experts layer (switch-style top-1).

DLRM's table-wise model parallelism and MoE's expert parallelism are the
two workloads behind PARAM's hot collective — all-to-all.  The DLRM side
is models/dlrm.py; this module is the MoE side: one FFN expert per
device over an ``ep`` mesh axis, tokens routed top-1 with a fixed
per-sender capacity (static shapes — the XLA contract), dispatched and
returned with ``lax.all_to_all``:

    router: probs = softmax(x @ wr); expert = argmax
    dispatch: each sender packs at most C = ceil(cf * T/E) tokens per
              expert into an (E, C, D) buffer (tokens beyond capacity
              DROP, switch-transformer semantics), a2a over ep
    expert:   y = gelu(x @ w1) @ w2 with this device's expert weights
    combine:  a2a back, unpack to token positions, scale by the router
              probability (dropped tokens pass through as zeros —
              add the residual outside)

Deterministic capacity accounting: a token's slot is its FIFO rank
among the SAME sender's tokens for the SAME expert (cumsum over local
token order), so the sharded layer and the single-device oracle agree
bit-for-bit — pinned in tests/test_moe.py.

Reference analogue: none runnable — the reference measures a2a patterns
(comms.py sweeps, DLRM traces); this IS the ep pattern as a runnable,
differentiable layer (dryrun path 12 takes one training step on it).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


@dataclass(frozen=True)
class MoeConfig:
    emb: int
    ffn: int
    n_experts: int
    capacity_factor: float = 1.25
    dtype: str = "float32"

    def capacity(self, tokens_per_sender: int) -> int:
        """Per-(sender, expert) slot count."""
        return max(1, math.ceil(
            self.capacity_factor * tokens_per_sender / self.n_experts))


def init_moe_params(key, cfg: MoeConfig) -> Dict:
    dt = jnp.dtype(cfg.dtype)
    ks = jax.random.split(key, 3)
    e, f, n = cfg.emb, cfg.ffn, cfg.n_experts

    def w(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(shape[-2])).astype(dt)

    return {
        "wr": w(ks[0], e, n),              # router (replicated)
        "w1": w(ks[1], n, e, f),           # per-expert, ep-sharded dim 0
        "w2": w(ks[2], n, f, e),
    }


def moe_param_specs() -> Dict:
    return {"wr": P(), "w1": P("ep"), "w2": P("ep")}


def _route(x, wr, n_experts, cap):
    """-> (expert, slot, keep, prob) per token; slot = FIFO rank among
    this sender's tokens bound for the same expert."""
    logits = x.astype(jnp.float32) @ wr.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)          # (T, E)
    expert = jnp.argmax(probs, axis=-1)              # (T,)
    prob = jnp.max(probs, axis=-1)
    onehot = jax.nn.one_hot(expert, n_experts, dtype=jnp.int32)
    slot = jnp.sum(onehot * (jnp.cumsum(onehot, axis=0) - 1), axis=-1)
    keep = slot < cap
    return expert, slot, keep, prob.astype(x.dtype)


def moe_apply_ep(params: Dict, x, axis: str, cfg: MoeConfig):
    """Sharded layer body (inside shard_map over ``axis``): x is the
    LOCAL token shard (T, D); params['w1'/'w2'] are this device's
    (1, D, ff)/(1, ff, D) expert slabs."""
    t, d = x.shape
    n = cfg.n_experts
    cap = cfg.capacity(t)
    expert, slot, keep, prob = _route(x, params["wr"], n, cap)

    disp = jnp.zeros((n, cap, d), x.dtype)
    disp = disp.at[expert, slot].add(
        x * keep[:, None].astype(x.dtype), mode="drop")
    # a2a: dim0 chunk e goes to device e; received slice s = sender s's
    # tokens for MY expert
    recv = lax.all_to_all(disp, axis, split_axis=0, concat_axis=0,
                          tiled=True)                # (n, cap, d)
    w1 = params["w1"][0]
    w2 = params["w2"][0]
    h = jax.nn.gelu(recv.reshape(n * cap, d) @ w1) @ w2
    back = lax.all_to_all(h.reshape(n, cap, d), axis, split_axis=0,
                          concat_axis=0, tiled=True)  # (n, cap, d)
    y = back[expert, slot] * keep[:, None].astype(x.dtype)
    return y * prob[:, None]


def moe_apply_reference(params: Dict, x, cfg: MoeConfig, n_senders: int):
    """Single-device oracle with IDENTICAL semantics: the token stream is
    partitioned into ``n_senders`` contiguous shards and each shard gets
    its own per-expert FIFO capacity, exactly like the ep layer."""
    t_total, d = x.shape
    t = t_total // n_senders
    n = cfg.n_experts
    cap = cfg.capacity(t)
    outs = []
    for s in range(n_senders):
        xs = x[s * t:(s + 1) * t]
        expert, slot, keep, prob = _route(xs, params["wr"], n, cap)
        w1 = params["w1"][expert]                    # (T, D, ff)
        w2 = params["w2"][expert]
        h = jax.nn.gelu(jnp.einsum("td,tdf->tf", xs, w1))
        y = jnp.einsum("tf,tfd->td", h, w2)
        outs.append(y * (keep.astype(x.dtype) * prob)[:, None])
    return jnp.concatenate(outs, axis=0)


def make_moe_train_step(mesh: Mesh, cfg: MoeConfig, lr: float = 1e-3,
                        axis: str = "ep"):
    """One SGD step of x -> x + moe(x) with mean-square loss, expert
    weights sharded over ``axis`` (each device updates its own expert;
    the router gradient psums across devices)."""

    def body(params, x):
        def loss_fn(params):
            y = x + moe_apply_ep(params, x, axis, cfg)
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        loss, g = jax.value_and_grad(loss_fn)(params)
        # token shards differ per device: replicated leaves (router) need
        # the cross-device grad sum; expert slabs are per-device already
        g = {**g, "wr": lax.psum(g["wr"], axis)}
        params = jax.tree.map(
            lambda w, gw: (w.astype(jnp.float32)
                           - lr * gw.astype(jnp.float32)).astype(w.dtype),
            params, g)
        return params, lax.psum(loss, axis) / mesh.shape[axis]

    specs = {**moe_param_specs()}
    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(specs, P(axis)),
        out_specs=(specs, P()),
        check_vma=False))
