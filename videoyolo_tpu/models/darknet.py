"""DarkNet-53 backbone (flax/linen, NHWC).

Capability parity with `/root/reference/models/definitions/darknet/darknet.py`
(`DarknetBasicBlockV3` :15, `DarknetV3` :45, layers=[1,2,8,8,4],
channels=[32,64,128,256,512,1024]).

TPU-first re-design: instead of a flat `features` HybridSequential that the
detector slices by index (`features[:15]`, `[15:24]`, `[24:]` —
wrappers.py:58), the backbone is organised into three explicit FPN *stages*
that return the stride-8/16/32 routes directly.  Stage boundaries are chosen
to match the reference slices exactly:
  stage1 = conv0 .. end of the 8-block 256-channel group   (features[:15])
  stage2 = 512-channel downsample + 8 blocks               (features[15:24])
  stage3 = 1024-channel downsample + 4 blocks              (features[24:])
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_EPS, BN_MOMENTUM, ConvBNLeaky, QTensor, QuantResidual, leaky

DARKNET53_LAYERS = (1, 2, 8, 8, 4)
DARKNET53_CHANNELS = (32, 64, 128, 256, 512, 1024)


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channel layout
    (channel index = (p*2 + q) * C + c for spatial phase (p, q))."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


class ConvBNLeakyS2D(nn.Module):
    """conv0 evaluated on the space-to-depth grid — bit-equivalent to the
    standard stem, MXU-shaped.

    The stride-1 3x3 conv over (H, W, 3) at 24% MFU (contraction dim 27,
    32 output channels) becomes a 3x3 conv over (H/2, W/2, 12) producing all
    4 output phases at once (contraction 108, 128 outputs) — same FLOPs,
    MXU-friendly tiles.  BatchNorm pools statistics across the 4 phases
    (reshape to (..., 4, C)), so train-mode stats equal the standard conv0's
    exactly; scale/bias/mean/var stay (C,)-shaped and refold verbatim
    (models/s2d.py)."""

    features: int  # ORIGINAL stem channels (32); conv emits 4x that
    quant: Any = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quant:
            # BN (pooled over the 4 phases) folds into the 4C conv with
            # tiled per-channel scales (ops/quantize.fold_bn_cell), so the
            # int8 path needs no phase reshape at all
            assert not train
            from .layers import quant_conv_cell

            return quant_conv_cell(
                self, x, 3, 1, [(1, 1), (1, 1)], 4 * self.features,
                mode=self.quant, dtype=self.dtype,
            )
        x = nn.Conv(
            4 * self.features, (3, 3), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype,
        )(x)
        b, h, w, _ = x.shape
        x = x.reshape(b, h, w, 4, self.features)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype,
        )(x)
        return leaky(x).reshape(b, h, w, 4 * self.features)


class DarknetBasicBlock(nn.Module):
    """Residual 1x1-reduce + 3x3-expand block (darknet.py:15-42).

    In the fused-int8 modes both branches arrive as QTensors and the join is
    a QuantResidual (int8 in, int8 out) instead of a bf16 add — the residual
    path stops forcing the conv fusions to emit a second, wide output."""

    channels: int  # channels of the 1x1 reduce; 3x3 expands to 2x
    quant: Any = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        x = ConvBNLeaky(self.channels, kernel=1, stride=1, quant=self.quant, dtype=self.dtype)(x, train)
        x = ConvBNLeaky(self.channels * 2, kernel=3, stride=1, quant=self.quant, dtype=self.dtype)(x, train)
        if isinstance(x, QTensor):
            return QuantResidual(calib=self.quant == "fused_calib")(x, residual)
        return x + residual


class DarknetStage(nn.Module):
    """Stride-2 downsample conv followed by `num_blocks` residual blocks.

    `s2d_in=True` marks the input as a space-to-depth-layout stem activation
    (B, H/2, W/2, 4C): the 3x3/s2 downsample becomes the refolded 2x2/s1
    conv over the phase channels — identical output, MXU-shaped (the child
    module names stay the same so checkpoints refold in place, models/s2d.py).
    """

    channels: int
    num_blocks: int
    s2d_in: bool = False
    quant: Any = False
    ds_conv: str = "direct"  # fused-int8 downsample emitter (layers.ConvBNLeaky)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d_in:
            x = ConvBNLeaky(
                self.channels, kernel=2, stride=1,
                padding=[(1, 0), (1, 0)], quant=self.quant, dtype=self.dtype,
            )(x, train)
        else:
            x = ConvBNLeaky(
                self.channels, kernel=3, stride=2, quant=self.quant,
                ds_conv=self.ds_conv, dtype=self.dtype,
            )(x, train)
        for _ in range(self.num_blocks):
            x = DarknetBasicBlock(self.channels // 2, quant=self.quant, dtype=self.dtype)(x, train)
        return x


class Darknet53(nn.Module):
    """DarkNet-53 feature extractor returning the three FPN routes.

    Input (B, H, W, 3) -> routes:
      r1 (B, H/8,  W/8,  256), r2 (B, H/16, W/16, 512), r3 (B, H/32, W/32, 1024)
    """

    layers: Sequence[int] = DARKNET53_LAYERS
    channels: Sequence[int] = DARKNET53_CHANNELS
    remat_stages: int = 0  # rematerialise the first N stages (high-res ones)
    # evaluate the stem on the space-to-depth grid (bit-equivalent, see
    # ConvBNLeakyS2D); weights refold from standard checkpoints via
    # models/s2d.refold_stem_s2d
    s2d_stem: bool = False
    # zero-pad the RGB input to 4 channels inside the graph so the stem
    # conv's contraction dim is 36 not 27 (lane-aligned on the MXU).  Bit-
    # equivalent: the 4th input channel is all zeros, so its kernel row
    # contributes nothing.  Measured +7.7% on the full B=128/416 bf16
    # detect step (ROADMAP round-5 attribution).  conv0's kernel becomes
    # (3, 3, 4, 32); standard checkpoints refold via
    # models/s2d.pad_stem_cin.  Mutually exclusive with s2d_stem (which
    # already reshapes the input to 12 channels).
    pad_stem: bool = False
    quant: Any = False  # int8 serving path (eval-only; see ops/quantize.py)
    # fused-int8 downsample emitter: "direct" | "s2d" | "pallas" (layers.py)
    ds_conv: str = "direct"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not (self.s2d_stem and self.pad_stem)
        if self.pad_stem and x.shape[-1] == 3:
            x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, 1),))
        # stage1: conv0 + groups up to and including the 256-ch / 8-block group
        if self.s2d_stem:
            x = space_to_depth(x)
            x = ConvBNLeakyS2D(
                self.channels[0], name="conv0", quant=self.quant, dtype=self.dtype
            )(x, train)
        else:
            x = ConvBNLeaky(
                self.channels[0], kernel=3, stride=1, name="conv0",
                quant=self.quant, dtype=self.dtype
            )(x, train)
        routes = []
        for i, (nblocks, ch) in enumerate(zip(self.layers, self.channels[1:])):
            # selective remat: the high-resolution groups dominate activation
            # memory; recomputing only them frees most of the HBM for a
            # fraction of full-backbone recompute
            cls = nn.remat(DarknetStage, static_argnums=(2,)) if i < self.remat_stages else DarknetStage
            x = cls(
                ch, nblocks,
                s2d_in=self.s2d_stem and i == 0,
                quant=self.quant,
                ds_conv=self.ds_conv,
                name=f"stage{i + 1}",
                dtype=self.dtype,
            )(x, train)
            if i >= 2:  # 256, 512, 1024-channel groups are the FPN routes
                routes.append(x)
        return tuple(routes)


class Darknet53Stage1(nn.Module):
    """The first FPN slice as a standalone module (reference `features[:15]`,
    wrappers.py:58): conv0 + the 64/128/256-channel groups -> (B, H/8, W/8, 256).
    Used by temporal models that route stages separately (yolo3_temporal.py)."""

    quant: Any = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNLeaky(32, kernel=3, stride=1, name="conv0", quant=self.quant, dtype=self.dtype)(x, train)
        x = DarknetStage(64, 1, name="stage1", quant=self.quant, dtype=self.dtype)(x, train)
        x = DarknetStage(128, 2, name="stage2", quant=self.quant, dtype=self.dtype)(x, train)
        x = DarknetStage(256, 8, name="stage3", quant=self.quant, dtype=self.dtype)(x, train)
        return x


class Darknet53Classifier(nn.Module):
    """Full ImageNet classifier head (darknet.py:96-99): global avg pool +
    Dense(classes).  Kept for pretrained-weight round-trips and feature
    extraction parity."""

    classes: int = 1000
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        routes = Darknet53(name="backbone", dtype=self.dtype)(x, train)
        x = routes[-1]
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.classes, dtype=self.dtype)(x)
