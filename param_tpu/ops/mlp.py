"""MLP training/inference loop for the linear benchmark.

Reference: ``train/compute/pt/pytorch_linear.py`` (N-layer ``nn.Linear``+ReLU
train loop with SGD/Adagrad, fp16/bf16/fp32 paths, QPS + TF/s) and
``inference/compute/pt/pytorch_linear.py``.  Here the whole train step is one
jitted function — forward, loss, backward and optimizer update fuse into a
single XLA program on the MXU.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def mlp_flops(layers: Sequence[int], batch: int, fwd_only: bool = False) -> int:
    """(2 or 6) * sum(l_i * l_{i+1}) * batch
    (reference: pytorch_linear.py:338-344)."""
    f = sum(a * b for a, b in zip(layers[:-1], layers[1:]))
    return (2 if fwd_only else 6) * f * batch


def init_mlp(key, layer_dims: Sequence[int], dtype=jnp.float32):
    """He-init MLP params as a list of (W, b)."""
    params = []
    for din, dout in zip(layer_dims[:-1], layer_dims[1:]):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (din, dout), dtype) * jnp.sqrt(2.0 / din).astype(dtype)
        b = jnp.zeros((dout,), dtype)
        params.append((w, b))
    return params


def mlp_forward(params, x):
    for i, (w, b) in enumerate(params):
        x = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(w.dtype) + b
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def make_optimizer(name: str, lr: float = 0.01):
    """sgd | adagrad — the two reference optimizers
    (pytorch_linear.py:60-75)."""
    if name == "sgd":
        return optax.sgd(lr)
    if name == "adagrad":
        return optax.adagrad(lr)
    raise ValueError(f"unknown optimizer {name!r}")


def make_train_step(optimizer, loss: str = "mse"):
    """One fused train step: fwd + loss + bwd + update."""

    def loss_fn(params, x, y):
        out = mlp_forward(params, x).astype(jnp.float32)
        if loss == "mse":
            return jnp.mean((out - y) ** 2)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(out, y)
        )

    @jax.jit
    def train_step(params, opt_state, x, y):
        l, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    return train_step


@functools.partial(jax.jit, static_argnames=())
def infer_step(params, x):
    return mlp_forward(params, x)
