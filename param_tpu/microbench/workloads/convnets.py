"""Small convnet workloads.

Counterpart of the reference's ``workloads/pytorch/alex_net.py:49`` and
``resnet.py:278`` — end-to-end model-forward operators for the
micro-benchmark framework, written in flax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from param_tpu.microbench.operator import OperatorInterface, register_operator


class _FlaxModelOp(OperatorInterface):
    def __init__(self, model_ctor):
        self.model_ctor = model_ctor
        self.model = None
        self.params = None

    def build(self, *args, **kwargs):
        self.model = self.model_ctor()
        self.params = None

    def forward(self, x):
        if self.model is None:
            self.build()
        if self.params is None:
            self.params = self.model.init(jax.random.PRNGKey(0), x)
        return self.model.apply(self.params, x)

    def cleanup(self):
        self.params = None


def _alexnet():
    import flax.linen as nn

    class AlexNet(nn.Module):
        num_classes: int = 1000

        @nn.compact
        def __call__(self, x):  # x: (B, H, W, C)
            x = nn.Conv(64, (11, 11), strides=(4, 4))(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(192, (5, 5))(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(384, (3, 3))(x)
            x = nn.relu(x)
            x = nn.Conv(256, (3, 3))(x)
            x = nn.relu(x)
            x = nn.Conv(256, (3, 3))(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = x.reshape((x.shape[0], -1))
            x = nn.Dense(4096)(x)
            x = nn.relu(x)
            x = nn.Dense(4096)(x)
            x = nn.relu(x)
            return nn.Dense(self.num_classes)(x)

    return AlexNet()


def _resnet_block():
    import flax.linen as nn

    class BasicBlock(nn.Module):
        features: int = 64

        @nn.compact
        def __call__(self, x):
            y = nn.Conv(self.features, (3, 3))(x)
            y = nn.relu(y)
            y = nn.Conv(self.features, (3, 3))(y)
            if x.shape[-1] != self.features:
                x = nn.Conv(self.features, (1, 1))(x)
            return nn.relu(x + y)

    class SmallResNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), strides=(2, 2))(x)
            x = nn.relu(x)
            for f in (64, 128, 256):
                x = BasicBlock(f)(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(1000)(x)

    return SmallResNet()


register_operator("AlexNet", _FlaxModelOp(_alexnet))
register_operator("ResNetSmall", _FlaxModelOp(_resnet_block))
