"""MobileNet V1/V2 backbones (flax, NHWC, TPU-first).

Capability parity with `/root/reference/models/definitions/mobilenet/
mobilenet.py` (vendored Gluon MobileNet/V2, used as the alternative
feature-extraction base in `extract_base_features.py:187-188` with slices
`[:33]`, `[33:69]`, `[69:-2]` -> three FPN-level features at strides
8/16/32).  Here the three taps are explicit stage outputs.

TPU-first: depthwise convs use `feature_group_count`; ReLU6 matches the
reference's gluoncv ReLU6; BN eps 1e-5 / momentum 0.9 like the rest of the
framework.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MobileNet", "MobileNetV2", "get_mobilenet"]


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class _ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        return relu6(x) if self.act else x


class _DWSep(nn.Module):
    """Depthwise-separable block (MobileNet V1)."""

    features: int
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBNReLU6(
            x.shape[-1], kernel=3, stride=self.stride, groups=x.shape[-1],
            dtype=self.dtype,
        )(x, train)
        return _ConvBNReLU6(self.features, kernel=1, dtype=self.dtype)(x, train)


class MobileNet(nn.Module):
    """MobileNet V1 with width multiplier; returns the three FPN routes or
    logits."""

    multiplier: float = 1.0
    classes: int = 1000
    return_features: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = lambda c: max(8, int(c * self.multiplier))
        x = _ConvBNReLU6(m(32), kernel=3, stride=2, dtype=self.dtype)(x, train)
        plan = [  # (features, stride), taps after strides reach 8/16/32
            (64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
            (512, 2), (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
            (1024, 2), (1024, 1),
        ]
        taps = {10: None, 12: None}  # end of 512 group (stride 16), end (32)
        routes = []
        for i, (c, s) in enumerate(plan):
            x = _DWSep(m(c), stride=s, dtype=self.dtype)(x, train)
            if i == 4:  # 256 group end: stride 8
                routes.append(x)
            if i == 10:  # 512 group end: stride 16
                routes.append(x)
            if i == 12:  # 1024 group end: stride 32
                routes.append(x)
        if self.return_features:
            return tuple(routes)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.classes, dtype=self.dtype)(x)


class _InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand: int = 6
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        y = x
        if self.expand != 1:
            y = _ConvBNReLU6(cin * self.expand, kernel=1, dtype=self.dtype)(y, train)
        y = _ConvBNReLU6(
            y.shape[-1], kernel=3, stride=self.stride, groups=y.shape[-1],
            dtype=self.dtype,
        )(y, train)
        y = _ConvBNReLU6(self.features, kernel=1, act=False, dtype=self.dtype)(y, train)
        if self.stride == 1 and cin == self.features:
            return x + y
        return y


class MobileNetV2(nn.Module):
    """MobileNet V2; returns the three FPN routes or logits."""

    multiplier: float = 1.0
    classes: int = 1000
    return_features: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = lambda c: max(8, int(c * self.multiplier))
        x = _ConvBNReLU6(m(32), kernel=3, stride=2, dtype=self.dtype)(x, train)
        cfg = [  # (expand, features, repeats, first stride)
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
            (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        routes = []
        for gi, (t, c, n, s) in enumerate(cfg):
            for j in range(n):
                x = _InvertedResidual(
                    m(c), stride=s if j == 0 else 1, expand=t, dtype=self.dtype
                )(x, train)
            if gi == 2:  # stride 8
                routes.append(x)
            if gi == 4:  # stride 16
                routes.append(x)
            if gi == 6:  # stride 32 (before the 1280 conv)
                pass
        x = _ConvBNReLU6(m(1280) if self.multiplier > 1.0 else 1280, kernel=1, dtype=self.dtype)(
            x, train
        )
        routes.append(x)
        if self.return_features:
            return tuple(routes)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.classes, dtype=self.dtype)(x)


def get_mobilenet(version: int = 1, multiplier: float = 1.0, **kwargs):
    """Factory matching the reference's get_mobilenet usage
    (extract_base_features.py:187-188)."""
    if version == 1:
        return MobileNet(multiplier=multiplier, **kwargs)
    if version == 2:
        return MobileNetV2(multiplier=multiplier, **kwargs)
    raise ValueError(f"unknown mobilenet version {version}")
