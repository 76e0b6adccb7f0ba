"""Two-stream DarkNet backbones (flax, NTHWC, TPU-first).

Capability parity with `/root/reference/models/definitions/darknet/
ts_darknet.py` (`DarknetFlownet` :13, `DarknetR21D` :125,
`get_darknet_flownet` :225, `get_darknet_r21d` :233): the middle frame runs
through DarkNet-53 while the remaining frames run through a motion stream
(FlowNetS features or an R(2+1)D clip network); per-FPN-level the two
streams' features are concatenated.  With `add_type` in {'add','mul'} the
motion stream is additionally injected ("gated") into four darknet residual
blocks at matching depths (ts_darknet.py:44-115 / :156-221), applied to the
block *body* with a manual residual.

TPU-first: pure-function composition — stream features are computed once and
threaded into the darknet stage pipeline; no `.features[i:j]` index surgery.
The two streams are independent subgraphs until the concat, so XLA schedules
them in parallel on-chip.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .darknet import DarknetBasicBlock, DarknetStage
from .flownet import FlowNetSEncoder, _FlowDecoder, stack_frames_on_channels
from .layers import ConvBNLeaky
from .r21d import R21D, R21D_CONFIGS

__all__ = ["TwoStreamDarknet"]


class _GatedStart(nn.Module):
    """conv0..stage3 of DarkNet-53 with motion gates injected into the first
    residual block of each of the first three groups plus stage4's first
    block handled by the caller (ts_darknet.py:52-95).  Gate tensors g1..g3
    must match (64, H/2), (128, H/4), (256, H/8)."""

    quant: Any = False  # static/dynamic int8 on the darknet-side cells
    dtype: Optional[Any] = None

    def _gated_block(self, d, gate, channel, add_type, name, train):
        """block body on (d <op> relu(gate)) with manual residual."""
        body_in = d + nn.relu(gate) if add_type == "add" else d * nn.relu(gate)
        y = ConvBNLeaky(channel, kernel=1, name=f"{name}_reduce", quant=self.quant,
                        dtype=self.dtype)(body_in, train)
        y = ConvBNLeaky(channel * 2, kernel=3, name=f"{name}_expand",
                        quant=self.quant, dtype=self.dtype)(y, train)
        return d + y

    @nn.compact
    def __call__(self, x, g1, g2, g3, add_type, train: bool = False):
        d = ConvBNLeaky(32, kernel=3, name="conv0", quant=self.quant, dtype=self.dtype)(x, train)
        # group 1 (64ch, /2): downsample then gated block
        d = ConvBNLeaky(64, kernel=3, stride=2, name="down1", quant=self.quant, dtype=self.dtype)(d, train)
        d = self._gated_block(d, g1, 32, add_type, "g1", train)
        # group 2 (128ch, /4): gated first block, plain second
        d = ConvBNLeaky(128, kernel=3, stride=2, name="down2", quant=self.quant, dtype=self.dtype)(d, train)
        d = self._gated_block(d, g2, 64, add_type, "g2", train)
        d = DarknetBasicBlock(64, name="b2_2", quant=self.quant, dtype=self.dtype)(d, train)
        # group 3 (256ch, /8): gated first block, 7 plain
        d = ConvBNLeaky(256, kernel=3, stride=2, name="down3", quant=self.quant, dtype=self.dtype)(d, train)
        d = self._gated_block(d, g3, 128, add_type, "g3", train)
        for j in range(7):
            d = DarknetBasicBlock(128, name=f"b3_{j + 2}", quant=self.quant, dtype=self.dtype)(d, train)
        return d  # (B, H/8, W/8, 256)


class _GatedStage4(nn.Module):
    """stage4 (512ch, /16) with the gate on its first block
    (ts_darknet.py:86-95)."""

    quant: Any = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, d, g4, add_type, train: bool = False):
        d = ConvBNLeaky(512, kernel=3, stride=2, name="down4", quant=self.quant, dtype=self.dtype)(d, train)
        body_in = d + nn.relu(g4) if add_type == "add" else d * nn.relu(g4)
        y = ConvBNLeaky(256, kernel=1, name="g4_reduce", quant=self.quant, dtype=self.dtype)(body_in, train)
        y = ConvBNLeaky(512, kernel=3, name="g4_expand", quant=self.quant, dtype=self.dtype)(y, train)
        d = d + y
        for j in range(7):
            d = DarknetBasicBlock(256, name=f"b4_{j + 2}", quant=self.quant, dtype=self.dtype)(d, train)
        return d  # (B, H/16, W/16, 512)


class TwoStreamDarknet(nn.Module):
    """DarknetFlownet / DarknetR21D unified (ts_darknet.py:13,125).

    Input (B, t, H, W, 3); t=3 for flownet, t in {9, 33} for r21d.  Returns
    three concat routes (256+256, 512+512, 1024+512 base channels for
    flownet; darknet + r21d channels for r21d).
    """

    stream: str = "flownet"  # 'flownet' | 'r21d'
    t: int = 3
    add_type: Optional[str] = None  # None | 'add' | 'mul'
    # int8 serving: mixed precision — the darknet-side cells quantise (they
    # are ConvBNLeaky, so ops/quantize's structural walk converts them); the
    # motion stream stays real-valued (flownet has no BN to fold, r21d folds
    # across module boundaries) and the walk leaves it untouched.
    quant: Any = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.stream in ("flownet", "r21d")
        assert self.add_type in (None, "add", "mul")
        assert x.ndim == 5 and x.shape[1] == self.t
        mid_idx = self.t // 2
        mid = x[:, mid_idx]

        if self.stream == "flownet":
            # all frames except the middle, stacked on channels
            rest = jnp.concatenate(
                [x[:, : mid_idx], x[:, mid_idx + 1 :]], axis=1
            )
            flat = stack_frames_on_channels(rest)
            c1, c2, c3, c4, c5, c6 = FlowNetSEncoder(name="flow_encoder", dtype=self.dtype)(
                flat
            )
            _, _, _, _, _, cat3, cat4, cat5 = _FlowDecoder(
                name="flow_decoder", dtype=self.dtype
            )(c2, c3, c4, c5, c6)
            gates = (c1, c2, c3, c4)
            feats = (cat3, cat4, cat5)
        else:
            block, layers, channels = R21D_CONFIGS[34]
            r1, r2, r3, r4 = R21D(
                block=block, layers=layers, channels=channels, return_taps=True,
                name="r21d", dtype=self.dtype,
            )(x, train)
            # gates: temporal max only (ts_darknet.py:163-198)
            gates = tuple(jnp.max(r, axis=1) for r in (r1, r2, r3, r4))
            # route features: 2x2 spatial max + temporal max (:205-211)
            feats = []
            for r in (r2, r3, r4):
                p = nn.max_pool(r.reshape((-1,) + r.shape[2:]), (2, 2), strides=(2, 2))
                p = p.reshape(r.shape[:2] + p.shape[1:])
                feats.append(jnp.max(p, axis=1))
            feats = tuple(feats)

        if self.add_type is None:
            d1 = ConvBNLeaky(32, kernel=3, name="conv0", quant=self.quant, dtype=self.dtype)(mid, train)
            d1 = DarknetStage(64, 1, name="stage1", quant=self.quant, dtype=self.dtype)(d1, train)
            d1 = DarknetStage(128, 2, name="stage2", quant=self.quant, dtype=self.dtype)(d1, train)
            d1 = DarknetStage(256, 8, name="stage3", quant=self.quant, dtype=self.dtype)(d1, train)
            d2 = DarknetStage(512, 8, name="stage4", quant=self.quant, dtype=self.dtype)(d1, train)
            d3 = DarknetStage(1024, 4, name="stage5", quant=self.quant, dtype=self.dtype)(d2, train)
        else:
            g1, g2, g3, g4 = gates
            d1 = _GatedStart(name="gstart", quant=self.quant, dtype=self.dtype)(
                mid, g1, g2, g3, self.add_type, train
            )
            d2 = _GatedStage4(name="gstage4", quant=self.quant, dtype=self.dtype)(
                d1, g4, self.add_type, train
            )
            d3 = DarknetStage(1024, 4, name="stage5", quant=self.quant, dtype=self.dtype)(d2, train)

        return (
            jnp.concatenate([d1, feats[0]], axis=-1),
            jnp.concatenate([d2, feats[1]], axis=-1),
            jnp.concatenate([d3, feats[2]], axis=-1),
        )
