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

from .layers import ConvBNLeaky

DARKNET53_LAYERS = (1, 2, 8, 8, 4)
DARKNET53_CHANNELS = (32, 64, 128, 256, 512, 1024)


class DarknetBasicBlock(nn.Module):
    """Residual 1x1-reduce + 3x3-expand block (darknet.py:15-42)."""

    channels: int  # channels of the 1x1 reduce; 3x3 expands to 2x
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        x = ConvBNLeaky(self.channels, kernel=1, stride=1, dtype=self.dtype)(x, train)
        x = ConvBNLeaky(self.channels * 2, kernel=3, stride=1, dtype=self.dtype)(x, train)
        return x + residual


class DarknetStage(nn.Module):
    """Stride-2 downsample conv followed by `num_blocks` residual blocks."""

    channels: int
    num_blocks: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNLeaky(self.channels, kernel=3, stride=2, dtype=self.dtype)(x, train)
        for _ in range(self.num_blocks):
            x = DarknetBasicBlock(self.channels // 2, dtype=self.dtype)(x, train)
        return x


class Darknet53(nn.Module):
    """DarkNet-53 feature extractor returning the three FPN routes.

    Input (B, H, W, 3) -> routes:
      r1 (B, H/8,  W/8,  256), r2 (B, H/16, W/16, 512), r3 (B, H/32, W/32, 1024)
    """

    layers: Sequence[int] = DARKNET53_LAYERS
    channels: Sequence[int] = DARKNET53_CHANNELS
    remat_stages: int = 0  # rematerialise the first N stages (high-res ones)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stage1: conv0 + groups up to and including the 256-ch / 8-block group
        x = ConvBNLeaky(self.channels[0], kernel=3, stride=1, name="conv0", dtype=self.dtype)(
            x, train
        )
        routes = []
        for i, (nblocks, ch) in enumerate(zip(self.layers, self.channels[1:])):
            # selective remat: the high-resolution groups dominate activation
            # memory; recomputing only them frees most of the HBM for a
            # fraction of full-backbone recompute
            cls = nn.remat(DarknetStage, static_argnums=(2,)) if i < self.remat_stages else DarknetStage
            x = cls(ch, nblocks, name=f"stage{i + 1}", dtype=self.dtype)(x, train)
            if i >= 2:  # 256, 512, 1024-channel groups are the FPN routes
                routes.append(x)
        return tuple(routes)


class Darknet53Stage1(nn.Module):
    """The first FPN slice as a standalone module (reference `features[:15]`,
    wrappers.py:58): conv0 + the 64/128/256-channel groups -> (B, H/8, W/8, 256).
    Used by temporal models that route stages separately (yolo3_temporal.py)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNLeaky(32, kernel=3, stride=1, name="conv0", dtype=self.dtype)(x, train)
        x = DarknetStage(64, 1, name="stage1", dtype=self.dtype)(x, train)
        x = DarknetStage(128, 2, name="stage2", dtype=self.dtype)(x, train)
        x = DarknetStage(256, 8, name="stage3", dtype=self.dtype)(x, train)
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
