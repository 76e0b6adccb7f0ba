"""FlowNetS / FlowNetC optical-flow networks (flax, NHWC, TPU-first).

Capability parity with `/root/reference/models/definitions/flownet/flownet.py`
(`FlowNetS` :14, `FlowNetC` :123, `get_flownet` :251): encoder-decoder flow
estimation without batch norm, LeakyReLU(0.1) activations, and a
`return_features` mode that returns the concat3/4/5 skip tensors
(flownet.py:114-115) for the two-stream detector (`ts_darknet.py:13`).

TPU-first: NHWC; FlowNetC's native-CUDA cost volume (`F.Correlation`,
flownet.py:204-205) is the XLA correlation op in ops/correlation.py
(d=20, stride2=2 -> 441 displacement channels); deconvs are
`nn.ConvTranspose(kernel=4, stride=2, SAME)` which XLA lowers onto the MXU.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.correlation import correlation

__all__ = ["FlowNetS", "FlowNetC"]


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _conv(features, kernel, stride=1, name=None, dtype=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        name=name,
        dtype=dtype,
    )


def _deconv(features, name=None, dtype=None, use_bias=True):
    return nn.ConvTranspose(
        features, (4, 4), strides=(2, 2), padding="SAME", name=name, dtype=dtype,
        use_bias=use_bias,
    )


class _FlowDecoder(nn.Module):
    """The shared refinement decoder (flownet.py:55-120): predict flow at
    each scale, upsample flow + features, concat with the encoder skip."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, out_conv2, out_conv3, out_conv4, out_conv5, out_conv6):
        flow6 = _conv(2, 3, name="predict_flow6", dtype=self.dtype)(out_conv6)
        flow6_up = _deconv(2, name="upsampled_flow6_to_5", dtype=self.dtype, use_bias=False)(flow6)
        out_deconv5 = _lrelu(_deconv(512, name="deconv5", dtype=self.dtype)(out_conv6))

        concat5 = jnp.concatenate([out_conv5, out_deconv5, flow6_up], axis=-1)
        flow5 = _conv(2, 3, name="predict_flow5", dtype=self.dtype)(concat5)
        flow5_up = _deconv(2, name="upsampled_flow5_to_4", dtype=self.dtype, use_bias=False)(flow5)
        out_deconv4 = _lrelu(_deconv(256, name="deconv4", dtype=self.dtype)(concat5))

        concat4 = jnp.concatenate([out_conv4, out_deconv4, flow5_up], axis=-1)
        flow4 = _conv(2, 3, name="predict_flow4", dtype=self.dtype)(concat4)
        flow4_up = _deconv(2, name="upsampled_flow4_to_3", dtype=self.dtype, use_bias=False)(flow4)
        out_deconv3 = _lrelu(_deconv(128, name="deconv3", dtype=self.dtype)(concat4))

        concat3 = jnp.concatenate([out_conv3, out_deconv3, flow4_up], axis=-1)
        flow3 = _conv(2, 3, name="predict_flow3", dtype=self.dtype)(concat3)
        flow3_up = _deconv(2, name="upsampled_flow3_to_2", dtype=self.dtype, use_bias=False)(flow3)
        out_deconv2 = _lrelu(_deconv(64, name="deconv2", dtype=self.dtype)(concat3))

        concat2 = jnp.concatenate([out_conv2, out_deconv2, flow3_up], axis=-1)
        flow2 = _conv(2, 3, name="predict_flow2", dtype=self.dtype)(concat2)
        return flow2, flow3, flow4, flow5, flow6, concat3, concat4, concat5


class FlowNetSEncoder(nn.Module):
    """FlowNetS encoder (flownet.py:22-53) returning every scale — the
    two-stream detector gates darknet with c1..c4 (ts_darknet.py:46-95)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        # The decoder's skip concats only line up when every stride-2 step
        # halves exactly; the reference has the identical constraint (its
        # flownet.py:95 concat fails the same way at e.g. 416 -> conv5 13
        # vs deconv5 14).
        assert x.shape[1] % 64 == 0 and x.shape[2] % 64 == 0, (
            f"FlowNetS needs input H/W divisible by 64, got {x.shape[1:3]} "
            "(use e.g. data_shape 384 or 448 with the flownet stream)"
        )
        c1 = _lrelu(_conv(64, 7, 2, name="conv1", dtype=self.dtype)(x))
        c2 = _lrelu(_conv(128, 5, 2, name="conv2", dtype=self.dtype)(c1))
        c3 = _lrelu(_conv(256, 5, 2, name="conv3", dtype=self.dtype)(c2))
        c3 = _lrelu(_conv(256, 3, 1, name="conv3_1", dtype=self.dtype)(c3))
        c4 = _lrelu(_conv(512, 3, 2, name="conv4", dtype=self.dtype)(c3))
        c4 = _lrelu(_conv(512, 3, 1, name="conv4_1", dtype=self.dtype)(c4))
        c5 = _lrelu(_conv(512, 3, 2, name="conv5", dtype=self.dtype)(c4))
        c5 = _lrelu(_conv(512, 3, 1, name="conv5_1", dtype=self.dtype)(c5))
        c6 = _lrelu(_conv(1024, 3, 2, name="conv6", dtype=self.dtype)(c5))
        c6 = _lrelu(_conv(1024, 3, 1, name="conv6_1", dtype=self.dtype)(c6))
        return c1, c2, c3, c4, c5, c6


def stack_frames_on_channels(x: jnp.ndarray) -> jnp.ndarray:
    """(B, K, H, W, C) -> (B, H, W, K*C) (flownet.py:85 reshape (0,-3,-2))."""
    b, k = x.shape[0], x.shape[1]
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(
        (b,) + x.shape[2:4] + (k * x.shape[4],)
    )


class FlowNetS(nn.Module):
    """FlowNet-Simple: the image pair is stacked on channels (flownet.py:85).

    Input (B, 2, H, W, 3) or (B, H, W, 6).  `return_features` returns
    (concat3, concat4, concat5) at strides 8/16/32 for the two-stream
    detector; train returns the 5-scale flow pyramid; eval returns flow2.
    """

    return_features: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 5:  # (B, K, H, W, C) -> channel stack
            x = stack_frames_on_channels(x)
        c1, c2, c3, c4, c5, c6 = FlowNetSEncoder(name="encoder", dtype=self.dtype)(x)

        flow2, flow3, flow4, flow5, flow6, cat3, cat4, cat5 = _FlowDecoder(
            name="decoder", dtype=self.dtype
        )(c2, c3, c4, c5, c6)

        if self.return_features:
            return cat3, cat4, cat5
        if train:
            return flow2, flow3, flow4, flow5, flow6
        return flow2


class FlowNetC(nn.Module):
    """FlowNet-Correlation: siamese encoder + cost volume (flownet.py:123).

    Input (B, 2, H, W, 3).  The correlation uses d=20, stride2=2
    (flownet.py:204-205) -> 441 displacement channels at stride 8.
    """

    return_features: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.ndim == 5 and x.shape[1] == 2
        xa, xb = x[:, 0], x[:, 1]

        conv1 = _conv(64, 7, 2, name="conv1", dtype=self.dtype)
        conv2 = _conv(128, 5, 2, name="conv2", dtype=self.dtype)
        conv3 = _conv(256, 5, 2, name="conv3", dtype=self.dtype)

        c1a = _lrelu(conv1(xa))
        c2a = _lrelu(conv2(c1a))
        c3a = _lrelu(conv3(c2a))
        c1b = _lrelu(conv1(xb))
        c2b = _lrelu(conv2(c1b))
        c3b = _lrelu(conv3(c2b))

        corr = _lrelu(
            correlation(
                c3a.astype(jnp.float32),
                c3b.astype(jnp.float32),
                max_displacement=20,
                kernel_size=1,
                stride1=1,
                stride2=2,
            )
        )
        redir = _lrelu(_conv(32, 1, 1, name="conv_redir", dtype=self.dtype)(c3a))
        c3 = jnp.concatenate([redir, corr], axis=-1)
        c3 = _lrelu(_conv(256, 3, 1, name="conv3_1", dtype=self.dtype)(c3))
        c4 = _lrelu(_conv(512, 3, 2, name="conv4", dtype=self.dtype)(c3))
        c4 = _lrelu(_conv(512, 3, 1, name="conv4_1", dtype=self.dtype)(c4))
        c5 = _lrelu(_conv(512, 3, 2, name="conv5", dtype=self.dtype)(c4))
        c5 = _lrelu(_conv(512, 3, 1, name="conv5_1", dtype=self.dtype)(c5))
        c6 = _lrelu(_conv(1024, 3, 2, name="conv6", dtype=self.dtype)(c5))
        c6 = _lrelu(_conv(1024, 3, 1, name="conv6_1", dtype=self.dtype)(c6))

        flow2, flow3, flow4, flow5, flow6, cat3, cat4, cat5 = _FlowDecoder(
            name="decoder", dtype=self.dtype
        )(c2a, c3, c4, c5, c6)

        if self.return_features:
            return cat3, cat4, cat5
        if train:
            return flow2, flow3, flow4, flow5, flow6
        return flow2
