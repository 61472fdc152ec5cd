"""Expert-parallel MoE layer (models/moe.py) on the 8-device CPU mesh:
bit-parity with the single-device oracle, capacity-drop semantics, and
a training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from param_tpu.models.moe import (
    MoeConfig,
    init_moe_params,
    make_moe_train_step,
    moe_apply_ep,
    moe_apply_reference,
    moe_param_specs,
)


def _setup(n=8, t_local=64, emb=32, ffn=64, cf=1.25, seed=0):
    cfg = MoeConfig(emb=emb, ffn=ffn, n_experts=n, capacity_factor=cf)
    key = jax.random.PRNGKey(seed)
    params = init_moe_params(key, cfg)
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (n * t_local, emb), jnp.float32) * 0.5
    mesh = Mesh(np.array(jax.devices()[:n]), ("ep",))
    return cfg, params, x, mesh


def _apply_sharded(cfg, params, x, mesh):
    fn = jax.jit(jax.shard_map(
        lambda p, x: moe_apply_ep(p, x, "ep", cfg),
        mesh=mesh, in_specs=(moe_param_specs(), P("ep")),
        out_specs=P("ep"), check_vma=False))
    return fn(params, x)


@pytest.mark.parametrize("cf", [1.25, 8.0])
def test_matches_oracle(cf):
    cfg, params, x, mesh = _setup(cf=cf)
    got = _apply_sharded(cfg, params, x, mesh)
    want = moe_apply_reference(params, x, cfg, n_senders=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_capacity_drops_tokens():
    """At a tiny capacity factor some tokens MUST drop (zero output
    rows) while ample capacity keeps every token."""
    cfg, params, x, mesh = _setup(cf=0.2)
    got = np.asarray(_apply_sharded(cfg, params, x, mesh))
    dropped = np.sum(np.all(got == 0.0, axis=-1))
    assert dropped > 0
    cfg2 = MoeConfig(emb=cfg.emb, ffn=cfg.ffn, n_experts=cfg.n_experts,
                     capacity_factor=16.0)
    got2 = np.asarray(_apply_sharded(cfg2, params, x, mesh))
    assert np.sum(np.all(got2 == 0.0, axis=-1)) == 0


def test_train_step_runs_and_descends():
    cfg, params, x, mesh = _setup()
    step = make_moe_train_step(mesh, cfg, lr=5e-2)
    losses = []
    for _ in range(4):
        params, loss = step(params, x)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
