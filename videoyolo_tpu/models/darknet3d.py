"""3D / 2+1D DarkNet backbone (flax, NTHWC, TPU-first).

Capability parity with `/root/reference/models/definitions/darknet/
three_darknet.py` (`Darknet3D` :126, `Conv3DRepPad` :41,
`TemporalGlobalMaxPool3D` :73, 2D->3D weight inflation :274-318):

* per-stage conv type ∈ {2, 3, 21} (`conv_types`, 6 entries: stem + 5
  stages); once a stage goes 2D after a 3D/2+1D prefix, the time axis is
  max-pooled away (the reference's "conv_swap" point);
* `funnel_time` uses temporal stride 2 in downsample convs;
* the 2+1D cell matches the reference darknet variant exactly: spatial
  (1,k,k) conv-BN-leaky followed by a *depthwise* temporal (k,1,1) conv with
  edge-repeat padding and no activation (three_darknet.py:19-38) — repeat
  padding keeps the imagenet-pretrained middle-frame flow intact;
* 2D weight inflation helpers re-create the reference's pretrained
  transfer: '3' repeats the 2D kernel tau times / tau, '21' copies the 2D
  kernel spatially and sets the temporal kernel uniform.

TPU-first: NTHWC layout; 2D stages over video fold time into batch (a free
reshape) so convs stay large for the MXU; temporal pools are jnp.max.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNLeaky, ConvBNLeaky3D, temporal_pad

DARKNET_LAYERS = (1, 2, 8, 8, 4)
DARKNET_CHANNELS = (32, 64, 128, 256, 512, 1024)


class Conv21DRepPad(nn.Module):
    """The darknet R(2+1)D cell (three_darknet.py:19-38): (1,k,k) spatial
    conv-BN-leaky, then depthwise (k,1,1) temporal conv; k=3 pads the time
    axis by edge repetition instead of zeros; no post-activation."""

    features: int
    kernel: int = 3
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        ts, hs, ws = self.stride
        pad = k // 2
        x = ConvBNLeaky3D(
            self.features,
            kernel=(1, k, k),
            stride=(1, hs, ws),
            padding=(0, pad, pad),
            dtype=self.dtype,
            name="spatial",
        )(x, train)
        if k == 3:
            x = temporal_pad(x, padding=pad, zeros=False)  # edge repeat
            tpad = [(0, 0), (0, 0), (0, 0)]
        else:
            tpad = [(pad, pad), (0, 0), (0, 0)]
        x = nn.Conv(
            self.features,
            (k, 1, 1),
            strides=(ts, 1, 1),
            padding=tpad,
            feature_group_count=self.features,
            use_bias=False,
            dtype=self.dtype,
            name="temporal",
        )(x)
        return x


class _Unit(nn.Module):
    """One conv cell of the requested type over (B,[T,]H,W,C)."""

    features: int
    kernel: int
    conv_type: int  # 2 | 3 | 21
    stride: int = 1
    temp_stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.conv_type == 2:
            if x.ndim == 5:  # fold time into batch; free reshape on TPU
                b, t = x.shape[0], x.shape[1]
                y = x.reshape((b * t,) + x.shape[2:])
                y = ConvBNLeaky(
                    self.features, kernel=self.kernel, stride=self.stride, dtype=self.dtype
                )(y, train)
                return y.reshape((b, t) + y.shape[1:])
            return ConvBNLeaky(
                self.features, kernel=self.kernel, stride=self.stride, dtype=self.dtype
            )(x, train)
        if self.conv_type == 3:
            k = self.kernel
            return ConvBNLeaky3D(
                self.features,
                kernel=(k, k, k),
                stride=(self.temp_stride, self.stride, self.stride),
                dtype=self.dtype,
            )(x, train)
        # 2+1D: 1x1 stays a plain 3D conv (three_darknet.py:115-118 uses
        # _conv3d for the 1x1x1 reduce even in conv_type 21 blocks)
        if self.kernel == 1:
            return ConvBNLeaky3D(
                self.features,
                kernel=(1, 1, 1),
                stride=(self.temp_stride, self.stride, self.stride),
                dtype=self.dtype,
            )(x, train)
        return Conv21DRepPad(
            self.features,
            kernel=self.kernel,
            stride=(self.temp_stride, self.stride, self.stride),
            dtype=self.dtype,
        )(x, train)


class Darknet3DBasicBlock(nn.Module):
    """1x1 reduce + 3x3 expand + residual for the given conv type
    (three_darknet.py:87-126)."""

    channel: int
    conv_type: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        # conv_type 21 uses a 3D 1x1x1 reduce (three_darknet.py:115-116)
        reduce_type = 3 if self.conv_type == 21 else self.conv_type
        y = _Unit(self.channel, 1, reduce_type, dtype=self.dtype)(x, train)
        y = _Unit(self.channel * 2, 3, self.conv_type, dtype=self.dtype)(y, train)
        return y + residual


class Darknet3D(nn.Module):
    """DarkNet-53 with per-stage 2D/3D/2+1D conv types (three_darknet.py:126).

    Input (B, T, H, W, 3) when any conv_type > 2 (else (B, H, W, 3) works
    too).  Returns the three FPN routes; routes that still carry a time axis
    at their tap point are temporal-max-pooled (three_darknet.py:205-226), so
    callers always get 2D maps (B, H/8, W/8, 256), (B, H/16, W/16, 512),
    (B, H/32, W/32, 1024).
    """

    conv_types: Sequence[int] = (2, 2, 2, 2, 2, 2)
    layers: Sequence[int] = DARKNET_LAYERS
    channels: Sequence[int] = DARKNET_CHANNELS
    funnel_time: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.conv_types) == 6
        for ct in self.conv_types:
            assert ct in (2, 3, 21), self.conv_types
        # once 2D, later stages must stay 2D (matches the reference's single
        # conv_swap point, three_darknet.py:176-181)
        swap = -1
        past = self.conv_types[0]
        for i, ct in enumerate(self.conv_types[1:], 1):
            if past in (3, 21) and ct == 2 and swap == -1:
                swap = i
            if swap != -1:
                assert ct == 2, "cannot return to 3D after the temporal pool"
            past = ct

        has_time = x.ndim == 5

        y = _Unit(self.channels[0], 3, self.conv_types[0], dtype=self.dtype, name="stem")(
            x, train
        )
        routes = []
        time_alive = has_time and True
        past = self.conv_types[0]
        for i, (n, ch, ct) in enumerate(
            zip(self.layers, self.channels[1:], self.conv_types[1:])
        ):
            if past in (3, 21) and ct == 2 and time_alive:
                y = jnp.max(y, axis=1)  # TemporalGlobalMaxPool3D
                time_alive = False
            ts = 2 if (self.funnel_time and ct in (3, 21)) else 1
            y = _Unit(
                ch, 3, ct, stride=2, temp_stride=ts, dtype=self.dtype, name=f"down{i}"
            )(y, train)
            for j in range(n):
                y = Darknet3DBasicBlock(
                    ch // 2, ct, dtype=self.dtype, name=f"stage{i}_block{j}"
                )(y, train)
            past = ct
            if i >= 2:
                routes.append(y)

        out = []
        for r in routes:
            if time_alive and r.ndim == 5:
                r = jnp.max(r, axis=1)
            out.append(r)
        return tuple(out)


def inflate_conv2d_to_3d(kernel2d, tau: int):
    """(kh, kw, cin, cout) -> (tau, kh, kw, cin, cout) / tau — the reference's
    pretrained inflation for conv_type '3' (three_darknet.py:274-288)."""
    k = jnp.asarray(kernel2d)
    return jnp.repeat(k[None], tau, axis=0) / float(tau)


def inflate_conv2d_to_21d(kernel2d, tau: int):
    """2+1D inflation (three_darknet.py:289-318): spatial part is the 2D
    kernel with a singleton time axis; the depthwise temporal kernel is
    uniform 1/tau.  Returns (spatial, temporal) kernels."""
    k = jnp.asarray(kernel2d)
    spatial = k[None]  # (1, kh, kw, cin, cout)
    cout = k.shape[-1]
    temporal = jnp.full((tau, 1, 1, 1, cout), 1.0 / float(tau), k.dtype)
    return spatial, temporal
