"""Hierarchical temporal DarkNet (flax, NTHWC, TPU-first).

Capability parity with `/root/reference/models/definitions/darknet/
h_darknet.py` (`HDarknet` :46, `get_hdarknet` :191): t input frames are
processed TimeDistributed and merged in groups of 3 at up to 5 pyramid
depths (after the stem conv, and after the 64/128/256-channel stages), via
either a temporal max or a zero-init grouped temporal conv (`_conv1d`,
reference layers.py:50-60).  With windows=[3,3,1,1,1], t=9 frames funnel
9 -> 3 -> 1; windows support up to t=3^4 at the 4 merge points the detector
path uses.

TPU-first: groups-of-3 merging is a reshape (B, T, ...) -> (B, T/3, 3, ...)
plus a max/conv over the static window axis — no symbolic shape surgery; 2D
convs over the surviving frames fold time into batch for the MXU.

Returns the three FPN routes (B, H/8, W/8, 256), (.., 512), (.., 1024).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

from flax import linen as nn

from .darknet import DarknetStage
from .layers import Conv1DTemporal, ConvBNLeaky, time_distributed

__all__ = ["HDarknet"]


class HDarknet(nn.Module):
    windows: Sequence[int] = (3, 1, 1, 1, 1)
    merge_type: str = "max"  # 'max' | 'conv' (h_darknet.py type param)
    dtype: Optional[Any] = None

    def _merge(self, x, window: int, level: int):
        """(B, T, H, W, C) -> (B, T/3, H, W, C): merge groups of 3 frames."""
        b, t = x.shape[0], x.shape[1]
        assert t % 3 == 0, f"t={t} not divisible by the window of 3"
        g = x.reshape(b * (t // 3), 3, *x.shape[2:])
        if self.merge_type == "max":
            merged = g.max(axis=1)
        else:
            merged = Conv1DTemporal(
                x.shape[-1], kernel=window, padding=0, name=f"conv1d_{level}",
                dtype=self.dtype,
            )(g)[:, 0]
        return merged.reshape(b, t // 3, *merged.shape[1:])

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.merge_type in ("max", "conv")
        assert self.windows[4] == 1, (
            "a 5th-level window never reaches the detection path "
            "(h_darknet.py:181-188 returns a single deep feature instead)"
        )
        levels = [
            ConvBNLeaky(32, kernel=3, stride=1, name="conv0", dtype=self.dtype),
            DarknetStage(64, 1, name="stage1", dtype=self.dtype),
            DarknetStage(128, 2, name="stage2", dtype=self.dtype),
            DarknetStage(256, 8, name="stage3", dtype=self.dtype),
        ]
        y = x
        for i, level in enumerate(levels):
            if y.ndim == 5 and y.shape[1] > 1:
                y = time_distributed(partial(level, train=train), y)
            else:
                if y.ndim == 5:
                    y = y[:, 0]
                y = level(y, train)
            if y.ndim == 5 and self.windows[i] > 1:
                y = self._merge(y, self.windows[i], i)
        if y.ndim == 5:
            assert y.shape[1] == 1, (
                f"windows {self.windows} do not collapse t={x.shape[1]} to 1"
            )
            y = y[:, 0]
        a = y
        b = DarknetStage(512, 8, name="stage4", dtype=self.dtype)(a, train)
        c = DarknetStage(1024, 4, name="stage5", dtype=self.dtype)(b, train)
        return a, b, c
