"""Transformer block model family (models/transformer.py) on the
8-device CPU mesh: single-chip parity flash-vs-xla, and the Megatron
dp x tp sharded train step vs the unsharded oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from param_tpu.models.transformer import (
    TransformerConfig,
    block_apply,
    init_params,
    make_sharded_train_step,
    make_train_step,
    place,
)


def _cfg(**kw):
    base = dict(batch=4, seq=128, emb=128, heads=2, ffn=256,
                dtype="float32")
    base.update(kw)
    return TransformerConfig(**base)


def _inputs(cfg, seed=0):
    k = jax.random.PRNGKey(seed)
    params = init_params(k, cfg)
    x = (jax.random.normal(jax.random.fold_in(k, 1),
                           (cfg.batch, cfg.seq, cfg.emb), jnp.float32)
         * 0.1).astype(jnp.dtype(cfg.dtype))
    return params, x


def test_flash_matches_xla_block():
    cfg = _cfg(attention="flash")
    params, x = _inputs(cfg)
    out_f = block_apply(params, x, cfg)
    out_x = block_apply(params, x, _cfg(attention="xla"))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-5, rtol=2e-5)


def test_train_step_reduces_loss():
    cfg = _cfg()
    params, x = _inputs(cfg)
    step = jax.jit(make_train_step(cfg, lr=1e-2))
    losses = []
    for _ in range(4):
        params, loss = step(params, x)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
def test_sharded_step_matches_unsharded(dp, tp):
    cfg = _cfg(attention="xla")
    params, x = _inputs(cfg)
    want_p, want_loss = jax.jit(make_train_step(cfg))(params, x)

    mesh = Mesh(np.array(jax.devices()[:dp * tp]).reshape(dp, tp),
                ("dp", "tp"))
    p_sh, x_sh = place(params, x, mesh, cfg)
    step = make_sharded_train_step(mesh, cfg)
    got_p, got_loss = step(p_sh, x_sh)
    assert float(got_loss) == pytest.approx(float(want_loss), rel=1e-5)
    for ka in ("wqkv", "wo", "w1", "w2"):
        np.testing.assert_allclose(
            np.asarray(got_p[ka]), np.asarray(want_p[ka]),
            atol=1e-5, rtol=1e-5)
