"""R(2+1)D ResNet action backbone (flax, NTHWC, TPU-first).

Capability parity with `/root/reference/models/definitions/rdnet/r21d.py`
(`_conv21d` mid-channel formula :35-58, `BasicBlockV1` :61, `BottleneckV1`
:110, `R21DV1` :159, `get_r21d` :228): 34-layer (basic) and 152-layer
(bottleneck) variants, ReLU activations, BN eps 1e-3 / momentum 0.9, and the
`return_features` 3-level output with spatial 2x2 max-pool + temporal max
(r21d.py:205-219) feeding the two-stream detector.

TPU-first: NTHWC (channel-last 3D convs tile directly onto the MXU);
the factored 2+1D conv keeps both halves as large dense convs; temporal
strides match the reference (clip length shrinks 2x per stage).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["R21D", "r21d_34", "r21d_152", "R21D_CONFIGS"]

BN_EPS_R21D = 1e-3


def _bn(dtype, name=None):
    return nn.BatchNorm(
        use_running_average=True,  # pretrained action nets run frozen-stats
        momentum=0.9,
        epsilon=BN_EPS_R21D,
        dtype=dtype,
        name=name,
    )


def _mid_channels(kernel: Sequence[int], cin: int, cout: int) -> int:
    """The factored-conv mid-channel count (r21d.py:40-42)."""
    kt, kh, kw = kernel
    return int(
        math.floor((kt * kh * kw * cin * cout) / (kh * kw * cin + kt * cout))
    )


class Conv21DR(nn.Module):
    """(1,kh,kw) spatial conv + BN + ReLU + (kt,1,1) temporal conv
    (r21d.py:35-58).  No norm/act after the temporal half."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    mid: Optional[int] = None
    in_features: Optional[int] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        ts, hs, ws = self.stride
        cin = self.in_features or x.shape[-1]
        mid = self.mid if self.mid is not None else _mid_channels(self.kernel, cin, self.features)
        y = nn.Conv(
            mid,
            (1, kh, kw),
            strides=(1, hs, ws),
            padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
            use_bias=False,
            dtype=self.dtype,
            name="spatial",
        )(x)
        y = _bn(self.dtype, name="mid_bn")(y)
        y = nn.relu(y)
        return nn.Conv(
            self.features,
            (kt, 1, 1),
            strides=(ts, 1, 1),
            padding=[(kt // 2, kt // 2), (0, 0), (0, 0)],
            use_bias=False,
            dtype=self.dtype,
            name="temporal",
        )(y)


class BasicBlock21D(nn.Module):
    """Two 3x3x3 2+1D convs + residual (r21d.py:61-106)."""

    channels: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        residual = x
        s = (self.stride,) * 3
        y = Conv21DR(self.channels, stride=s, dtype=self.dtype, name="conv1")(x)
        y = _bn(self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = Conv21DR(self.channels, dtype=self.dtype, name="conv2")(y)
        y = _bn(self.dtype, name="bn2")(y)
        if self.downsample:
            residual = nn.Conv(
                self.channels, (1, 1, 1), strides=s, use_bias=False,
                dtype=self.dtype, name="down",
            )(x)
            residual = _bn(self.dtype, name="down_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck21D(nn.Module):
    """1x1x1 reduce + 3x3x3 2+1D + 1x1x1 expand + residual (r21d.py:110-158)."""

    channels: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        residual = x
        s = (self.stride,) * 3
        y = nn.Conv(
            self.channels // 4, (1, 1, 1), strides=s, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        y = _bn(self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = Conv21DR(self.channels // 4, dtype=self.dtype, name="conv2")(y)
        y = _bn(self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.channels, (1, 1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = _bn(self.dtype, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.channels, (1, 1, 1), strides=s, use_bias=False,
                dtype=self.dtype, name="down",
            )(x)
            residual = _bn(self.dtype, name="down_bn")(residual)
        return nn.relu(y + residual)


R21D_CONFIGS = {
    34: ("basic", (3, 4, 6, 3), (64, 64, 128, 256, 512)),
    152: ("bottleneck", (3, 8, 36, 3), (64, 256, 512, 1024, 2048)),
}


class R21D(nn.Module):
    """R(2+1)D ResNet (r21d.py:159-226).

    Input (B, T, H, W, 3).  `return_features`: three levels, each spatially
    2x2-max-pooled then temporal-maxed (r21d.py:205-219) -> 2D maps at
    strides 8/16/32.  Otherwise (features, pooled, softmax) like the
    reference classifier path.
    """

    block: str = "basic"
    layers: Sequence[int] = (3, 4, 6, 3)
    channels: Sequence[int] = (64, 64, 128, 256, 512)
    classes: int = 400
    return_features: bool = False
    return_taps: bool = False  # all four raw stage outputs (gated two-stream)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = BasicBlock21D if self.block == "basic" else Bottleneck21D
        y = Conv21DR(
            self.channels[0], kernel=(3, 7, 7), stride=(1, 2, 2), mid=45,
            dtype=self.dtype, name="init",
        )(x)
        y = _bn(self.dtype, name="init_bn")(y)
        y = nn.relu(y)

        taps = []
        cin = self.channels[0]
        for i, (n, ch) in enumerate(zip(self.layers, self.channels[1:])):
            stride = 1 if i == 0 else 2
            y = blk(
                ch, stride, downsample=(ch != cin), dtype=self.dtype,
                name=f"stage{i + 1}_block1",
            )(y)
            for j in range(n - 1):
                y = blk(ch, 1, dtype=self.dtype, name=f"stage{i + 1}_block{j + 2}")(y)
            cin = ch
            taps.append(y)

        if self.return_taps:
            return tuple(taps)
        if self.return_features:
            outs = []
            for r in (taps[1], taps[2], taps[3]):
                r = nn.max_pool(
                    r.reshape((-1,) + r.shape[2:]), (2, 2), strides=(2, 2)
                ).reshape(r.shape[:2] + (r.shape[2] // 2, r.shape[3] // 2, r.shape[4]))
                outs.append(jnp.max(r, axis=1))  # temporal max
            return tuple(outs)

        feats = y
        pooled = jnp.mean(y, axis=(1, 2, 3))
        logits = nn.Dense(self.classes, dtype=self.dtype, name="dense")(pooled)
        return feats, pooled, nn.softmax(logits)


def r21d_34(**kwargs) -> R21D:
    block, layers, channels = R21D_CONFIGS[34]
    return R21D(block=block, layers=layers, channels=channels, **kwargs)


def r21d_152(**kwargs) -> R21D:
    block, layers, channels = R21D_CONFIGS[152]
    return R21D(block=block, layers=layers, channels=channels, **kwargs)
