"""Basic operator registrations.

Counterpart of the reference's ``workloads/pytorch/native_basic_ops.py:8-37``
(torch.add/bmm/matmul/mm/relu/reshape/Linear/Conv2d → their jax analogues).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from param_tpu.microbench.operator import (
    BuildableOp,
    CallableOp,
    UnaryOp,
    register_operators,
)


def _linear_ctor(din, dout, use_bias=True):
    import flax.linen as nn

    return nn.Dense(features=dout, use_bias=use_bias)


def _conv2d_ctor(in_ch, out_ch, kernel, stride=1, padding="SAME"):
    import flax.linen as nn

    return nn.Conv(
        features=out_ch,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=padding,
    )


def _maxpool_ctor(kernel, stride=None, padding=0):
    """NHWC max pool (torch.nn.MaxPool2d analogue)."""
    from jax import lax

    stride = stride or kernel

    def pool(x):
        return lax.reduce_window(
            x, -jnp.inf, lax.max,
            (1, kernel, kernel, 1), (1, stride, stride, 1),
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
        )

    return pool


def _adaptive_avgpool_ctor(output_size):
    """NHWC adaptive average pool for the divisible case (the reference
    workloads use power-of-two sizes)."""
    oh = ow = output_size if isinstance(output_size, int) else output_size[0]

    def pool(x):
        n, h, w, c = x.shape
        kh, kw = h // oh, w // ow
        return x[:, : oh * kh, : ow * kw].reshape(
            n, oh, kh, ow, kw, c
        ).mean(axis=(2, 4))

    return pool


def _dropout_ctor(p=0.5):
    def drop(x):
        mask = jax.random.bernoulli(jax.random.PRNGKey(0), 1 - p, x.shape)
        return jnp.where(mask, x / (1 - p), 0).astype(x.dtype)

    return drop


def _mm(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


def _bmm(a, b):
    return jnp.einsum("bij,bjk->bik", a, b, preferred_element_type=jnp.float32)


register_operators(
    {
        "jnp.add": CallableOp(jnp.add),
        "jnp.add_": UnaryOp(jnp.add),  # in-place torch alias
        "jnp.mul": CallableOp(jnp.multiply),
        "jnp.clamp": CallableOp(jnp.clip),
        "jnp.clamp_": UnaryOp(jnp.clip),
        "jnp.matmul": CallableOp(_mm),
        "jnp.mm": CallableOp(_mm),
        "jnp.bmm": CallableOp(_bmm),
        "jnp.relu": CallableOp(jax.nn.relu),
        "jnp.gelu": CallableOp(jax.nn.gelu),
        "jnp.softmax": CallableOp(lambda x: jax.nn.softmax(x, axis=-1)),
        # fused scaled-dot-product attention (q, k, v: (B, S, H, D))
        "nn.sdpa": CallableOp(jax.nn.dot_product_attention),
        "jnp.reshape": CallableOp(lambda x, shape: jnp.reshape(x, shape)),
        "nn.Linear": BuildableOp(_linear_ctor),
        "nn.Conv2d": BuildableOp(_conv2d_ctor),
        "jnp.baddbmm": CallableOp(
            lambda inp, a, b: inp + _bmm(a, b).astype(inp.dtype)),
        "jnp.cat": CallableOp(lambda xs, axis=0: jnp.concatenate(xs, axis)),
        "jnp.mean": CallableOp(jnp.mean),
        "nn.MaxPool2d": BuildableOp(_maxpool_ctor),
        "nn.AdaptiveAvgPool2d": BuildableOp(_adaptive_avgpool_ctor),
        "nn.Dropout": BuildableOp(_dropout_ctor),
        "nn.ReLU": BuildableOp(lambda: jax.nn.relu),
        # reference-name aliases so torch-flavored configs load
        # (the reference's full native_basic_ops surface,
        # workloads/pytorch/native_basic_ops.py:8-37)
        "torch.add": CallableOp(jnp.add),
        "torch.add_": UnaryOp(jnp.add),
        "torch.clamp_": UnaryOp(jnp.clip),
        "torch.baddbmm": CallableOp(
            lambda inp, a, b: inp + _bmm(a, b).astype(inp.dtype)),
        "torch.cat": CallableOp(lambda xs, axis=0: jnp.concatenate(xs, axis)),
        "torch.mean": CallableOp(jnp.mean),
        "torch.mul": CallableOp(jnp.multiply),
        "torch.reshape": CallableOp(lambda x, shape: jnp.reshape(x, shape)),
        "torch.matmul": CallableOp(_mm),
        "torch.mm": CallableOp(_mm),
        "torch.bmm": CallableOp(_bmm),
        "torch.nn.functional.relu": CallableOp(jax.nn.relu),
        "torch.nn.Linear": BuildableOp(_linear_ctor),
        "torch.nn.Conv2d": BuildableOp(_conv2d_ctor),
        "torch.nn.MaxPool2d": BuildableOp(_maxpool_ctor),
        "torch.nn.AdaptiveAvgPool2d": BuildableOp(_adaptive_avgpool_ctor),
        "torch.nn.Dropout": BuildableOp(_dropout_ctor),
        "torch.nn.ReLU": BuildableOp(lambda: jax.nn.relu),
    }
)
