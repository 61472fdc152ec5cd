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
        # reference-name aliases so torch-flavored configs load
        "torch.add": CallableOp(jnp.add),
        "torch.add_": UnaryOp(jnp.add),
        "torch.clamp_": UnaryOp(jnp.clip),
        "torch.matmul": CallableOp(_mm),
        "torch.mm": CallableOp(_mm),
        "torch.bmm": CallableOp(_bmm),
        "torch.nn.functional.relu": CallableOp(jax.nn.relu),
        "torch.nn.Linear": BuildableOp(_linear_ctor),
        "torch.nn.Conv2d": BuildableOp(_conv2d_ctor),
    }
)
