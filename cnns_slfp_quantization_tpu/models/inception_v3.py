"""InceptionV3, FP32-only (reference: nets_imgnet/inception_v3.py).

The reference ships this model unquantized and unwired (its import in the
ImageNet driver is commented out, imgnet_train_eval.py:21); we provide it for
inventory parity (SURVEY.md C14).  Structure follows the reference exactly:
padding-1 stem convs (a CIFAR-style InceptionV3 variant, no stem pooling),
BasicConv2d = conv(bias=False) + BN(eps=1e-5) + ReLU, A/B/C/D/E mixed blocks.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _avg_pool_same(x):
    """AvgPool2d(3, stride=1, padding=1) with torch's count_include_pad."""
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return y / 9.0


class BasicConv2d(nn.Module):
    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x, *, train=False):
        p = self.padding
        pad = ((p[0], p[0]), (p[1], p[1]))
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding=pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="bn")(
            x, use_running_average=not train)
        return nn.relu(x)


class InceptionV3(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        c = lambda f, k, s=(1, 1), p=(0, 0), name=None: BasicConv2d(
            f, k, s, p, name=name)

        def inception_a(x, pool_features, name):
            b1 = c(64, (1, 1), name=f"{name}_b1")(x, train=train)
            b5 = c(48, (1, 1), name=f"{name}_b5_1")(x, train=train)
            b5 = c(64, (5, 5), p=(2, 2), name=f"{name}_b5_2")(b5, train=train)
            b3 = c(64, (1, 1), name=f"{name}_b3_1")(x, train=train)
            b3 = c(96, (3, 3), p=(1, 1), name=f"{name}_b3_2")(b3, train=train)
            b3 = c(96, (3, 3), p=(1, 1), name=f"{name}_b3_3")(b3, train=train)
            bp = _avg_pool_same(x)
            bp = c(pool_features, (3, 3), p=(1, 1), name=f"{name}_bp")(bp, train=train)
            return jnp.concatenate([b1, b5, b3, bp], -1)

        def inception_b(x, name):
            b3 = c(384, (3, 3), s=(2, 2), name=f"{name}_b3")(x, train=train)
            bs = c(64, (1, 1), name=f"{name}_bs_1")(x, train=train)
            bs = c(96, (3, 3), p=(1, 1), name=f"{name}_bs_2")(bs, train=train)
            bs = c(96, (3, 3), s=(2, 2), name=f"{name}_bs_3")(bs, train=train)
            bp = nn.max_pool(x, (3, 3), strides=(2, 2))
            return jnp.concatenate([b3, bs, bp], -1)

        def inception_c(x, c7, name):
            b1 = c(192, (1, 1), name=f"{name}_b1")(x, train=train)
            b7 = c(c7, (1, 1), name=f"{name}_b7_1")(x, train=train)
            b7 = c(c7, (7, 1), p=(3, 0), name=f"{name}_b7_2")(b7, train=train)
            b7 = c(192, (1, 7), p=(0, 3), name=f"{name}_b7_3")(b7, train=train)
            bs = c(c7, (1, 1), name=f"{name}_bs_1")(x, train=train)
            bs = c(c7, (7, 1), p=(3, 0), name=f"{name}_bs_2")(bs, train=train)
            bs = c(c7, (1, 7), p=(0, 3), name=f"{name}_bs_3")(bs, train=train)
            bs = c(c7, (7, 1), p=(3, 0), name=f"{name}_bs_4")(bs, train=train)
            bs = c(192, (1, 7), p=(0, 3), name=f"{name}_bs_5")(bs, train=train)
            bp = _avg_pool_same(x)
            bp = c(192, (1, 1), name=f"{name}_bp")(bp, train=train)
            return jnp.concatenate([b1, b7, bs, bp], -1)

        def inception_d(x, name):
            b3 = c(192, (1, 1), name=f"{name}_b3_1")(x, train=train)
            b3 = c(320, (3, 3), s=(2, 2), name=f"{name}_b3_2")(b3, train=train)
            b7 = c(192, (1, 1), name=f"{name}_b7_1")(x, train=train)
            b7 = c(192, (1, 7), p=(0, 3), name=f"{name}_b7_2")(b7, train=train)
            b7 = c(192, (7, 1), p=(3, 0), name=f"{name}_b7_3")(b7, train=train)
            b7 = c(192, (3, 3), s=(2, 2), name=f"{name}_b7_4")(b7, train=train)
            bp = nn.avg_pool(x, (3, 3), strides=(2, 2))
            return jnp.concatenate([b3, b7, bp], -1)

        def inception_e(x, name):
            b1 = c(320, (1, 1), name=f"{name}_b1")(x, train=train)
            b3 = c(384, (1, 1), name=f"{name}_b3_1")(x, train=train)
            b3a = c(384, (1, 3), p=(0, 1), name=f"{name}_b3_2a")(b3, train=train)
            b3b = c(384, (3, 1), p=(1, 0), name=f"{name}_b3_2b")(b3, train=train)
            b3 = jnp.concatenate([b3a, b3b], -1)
            bs = c(448, (1, 1), name=f"{name}_bs_1")(x, train=train)
            bs = c(384, (3, 3), p=(1, 1), name=f"{name}_bs_2")(bs, train=train)
            bsa = c(384, (1, 3), p=(0, 1), name=f"{name}_bs_3a")(bs, train=train)
            bsb = c(384, (3, 1), p=(1, 0), name=f"{name}_bs_3b")(bs, train=train)
            bs = jnp.concatenate([bsa, bsb], -1)
            bp = _avg_pool_same(x)
            bp = c(192, (1, 1), name=f"{name}_bp")(bp, train=train)
            return jnp.concatenate([b1, b3, bs, bp], -1)

        x = c(32, (3, 3), p=(1, 1), name="conv_1a")(x, train=train)
        x = c(32, (3, 3), p=(1, 1), name="conv_2a")(x, train=train)
        x = c(64, (3, 3), p=(1, 1), name="conv_2b")(x, train=train)
        x = c(80, (1, 1), name="conv_3b")(x, train=train)
        x = c(192, (3, 3), name="conv_4a")(x, train=train)
        x = inception_a(x, 32, "mixed_5b")
        x = inception_a(x, 64, "mixed_5c")
        x = inception_a(x, 64, "mixed_5d")
        x = inception_b(x, "mixed_6a")
        x = inception_c(x, 128, "mixed_6b")
        x = inception_c(x, 160, "mixed_6c")
        x = inception_c(x, 160, "mixed_6d")
        x = inception_c(x, 192, "mixed_6e")
        x = inception_d(x, "mixed_7a")
        x = inception_e(x, "mixed_7b")
        x = inception_e(x, "mixed_7c")
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="linear")(x)
        return x
