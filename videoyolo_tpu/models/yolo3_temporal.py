"""Temporal YOLOv3 family (flax, N[T]HWC, TPU-first).

Capability parity with the reference temporal detectors:
* `YOLOV3T`  (yolo3.py:915-1211): k-frame window, TimeDistributed stages,
  early/late k-joins (max/mean/cat), correlation insertion, conv-RNN tips
  ('late') or outputs ('out'), 2D/3D/2+1D detection blocks.
* `YOLOV3TB` (yolo3.py:1305+): same head over a backbone that returns the
  three routes itself (3D darknet, hierarchical darknet) — here simply
  `YOLOv3T(backbone=<module>)`.
* `YOLOV3TS` (yolo3.py:632+): two-stream — plug a two-stream backbone in the
  same way.
* `YOLOV3Temporal` (yolo3_temporal.py:242-560): t=5 per-timestep outputs
  (`t_out`), correlation pyramid path, and the non-t_out 5->3->1 temporal
  funnel fused with 2+1D convs.

TPU-first design notes:
* One module covers YOLOV3T/TB/TS — "temporal vs joined" is tracked by array
  rank ((B,T,H,W,C) vs (B,H,W,C)), so every config compiles to a single
  static XLA program; there is no `F.slice_like` shape patching.
* TimeDistributed is a fold of T into the batch axis (free reshape, keeps
  convs large for the MXU); temporal joins are jnp reductions that XLA fuses
  into the surrounding convs.
* The conv-RNN runs as an unrolled scan over the (short, static) window.
* Train mode returns the same raw-head dict as `YOLOv3` (with a leading T
  axis when `t_out`), so the pjit train step is shared across the family.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import DEFAULT_ANCHORS, DEFAULT_STRIDES
from .darknet import Darknet53Stage1, DarknetStage
from .layers import (
    Conv21D,
    ConvBNLeaky,
    ConvBNLeaky3D,
    ConvRNN,
    Corr,
    TemporalPooling,
    time_distributed,
    upsample2x,
)
from .yolo3 import FPN_CHANNELS, decode_predictions

__all__ = ["YOLOv3T", "YOLOv3Temporal"]


def _anchor_pairs(level_anchors) -> Tuple[Tuple[float, float], ...]:
    return tuple(
        (level_anchors[2 * j], level_anchors[2 * j + 1])
        for j in range(len(level_anchors) // 2)
    )


def _fold_time_into_channels(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, H, W, T*C), the reference 'cat' join
    (yolo3.py:1108-1110 reshape (0,-3,-2))."""
    b, t, h, w, c = x.shape
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)


class _TCell(nn.Module):
    """A conv cell that adapts to its input rank: 2D cells run TimeDistributed
    over temporal input; 3D/2+1D cells require it."""

    features: int
    kernel: int
    conv_type: str  # '2' | '3' | '21'
    quant: Any = False  # int8 serving (2D/3D/2+1D; ops/quantize.py)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.conv_type == "2":
            cell = ConvBNLeaky(self.features, kernel=self.kernel, quant=self.quant, dtype=self.dtype)
            if x.ndim == 5:
                return time_distributed(partial(cell, train=train), x)
            return cell(x, train)
        if self.conv_type == "3" or self.kernel == 1:
            # 1x1 stays a plain 1x1x1 3D conv even for '21' (yolo3.py:228-231)
            k = self.kernel
            return ConvBNLeaky3D(
                self.features, kernel=(k if self.conv_type == "3" else 1, k, k),
                quant=self.quant, dtype=self.dtype,
            )(x, train)
        return Conv21D(
            self.features, kernel=self.kernel, quant=self.quant, dtype=self.dtype
        )(x, train)


class YOLODetectionBlockT(nn.Module):
    """5-conv FPN block + tip for any conv type (yolo3.py:202-263).
    `with_tip=False` gives the NoTip variant used with rnn_pos='late'
    (yolo3.py:266-314)."""

    channel: int
    conv_type: str = "2"
    with_tip: bool = True
    quant: Any = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.channel % 2 == 0
        one = "3" if self.conv_type in ("3", "21") else "2"
        for _ in range(2):
            x = _TCell(self.channel, 1, one, quant=self.quant, dtype=self.dtype)(x, train)
            x = _TCell(self.channel * 2, 3, self.conv_type, quant=self.quant, dtype=self.dtype)(x, train)
        route = _TCell(self.channel, 1, one, quant=self.quant, dtype=self.dtype)(x, train)
        if not self.with_tip:
            return route
        tip = _TCell(self.channel * 2, 3, self.conv_type, quant=self.quant, dtype=self.dtype)(route, train)
        return route, tip


class YOLOOutputRNN(nn.Module):
    """Output head for rnn_pos='out' (yolo3.py:63-66,155-160): a 1x1 conv-GRU
    over the k tips, temporal-pooled, then the shared anchor decode."""

    num_classes: int
    anchors: Tuple[Tuple[float, float], ...]
    stride: int
    k_join_type: str = "max"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, tip, train: bool = False):
        num_pred = (1 + 4 + self.num_classes) * len(self.anchors)
        pred = ConvRNN(num_pred, kernel=(1, 1), dtype=self.dtype, name="prediction")(tip)
        pred = TemporalPooling(type=self.k_join_type or "max")(pred)
        return decode_predictions(
            pred, self.anchors, self.stride, self.num_classes, train
        )


class YOLOOutputConvT(nn.Module):
    """Plain conv output head shared with the 2D model, but usable per-frame
    (TimeDistributed) for t_out models."""

    num_classes: int
    anchors: Tuple[Tuple[float, float], ...]
    stride: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, tip, train: bool = False):
        num_pred = (1 + 4 + self.num_classes) * len(self.anchors)
        conv = nn.Conv(num_pred, (1, 1), padding="VALID", dtype=self.dtype, name="prediction")
        if tip.ndim == 5:
            b, t = tip.shape[0], tip.shape[1]
            pred = conv(tip.reshape((b * t,) + tip.shape[2:]))
            out = decode_predictions(
                pred, self.anchors, self.stride, self.num_classes, train
            )
            if train:
                return {k: v.reshape((b, t) + v.shape[1:]) for k, v in out.items()}
            return tuple(v.reshape((b, t) + v.shape[1:]) for v in out)
        pred = conv(tip)
        return decode_predictions(pred, self.anchors, self.stride, self.num_classes, train)


class YOLOv3T(nn.Module):
    """k-frame temporal YOLOv3 (yolo3.py:915 YOLOV3T; with a `backbone`
    module it is also YOLOV3TB :1305 and YOLOV3TS :632).

    Input (B, k, H, W, 3) for k > 1 (or routes when `backbone` given).
    Returns the same contracts as `YOLOv3` — train: raw-head dict; eval:
    (boxes (B,N,4), scores (B,N,C or 1 if agnostic)).
    """

    num_classes: int
    k: int = 1
    k_join_type: Optional[str] = None  # max | mean | cat
    k_join_pos: Optional[str] = None  # early | late
    block_conv_type: str = "2"
    rnn_pos: Optional[str] = None  # late | out
    corr_pos: Optional[str] = None  # early | late
    corr_d: Optional[int] = None
    agnostic: bool = False
    backbone: Optional[nn.Module] = None  # temporal/two-stream backbone -> routes
    # streaming deep-split head (videoyolo_tpu/streaming.py): feed="tips"
    # takes the 3-tuple of per-frame (B, k, H, W, C) pre-join FPN tip
    # windows (deep->shallow, cached by streaming._FrameTips) and runs only
    # joins + output heads — legal for plain late joins, whose whole
    # per-frame FPN is frame-pure
    feed: Optional[str] = None
    anchors: Any = DEFAULT_ANCHORS
    strides: Sequence[int] = DEFAULT_STRIDES
    channels: Sequence[int] = FPN_CHANNELS
    # int8 serving (ops/quantize.py): 2D/3D/2+1D blocks; built-in backbone
    # or a quant-threaded one (e.g. TwoStreamDarknet's mixed int8).  RNN
    # configs serve MIXED precision: every ConvBNLeaky cell (stages, blocks,
    # transitions) quantises, the ConvRNN tips/outputs stay real-valued —
    # requantising the recurrent carry would compound rounding across the
    # k-step scan (and the GRU/LSTM gates are elementwise, nothing for the
    # int8 MXU path anyway), the same split the two-stream family uses for
    # its BN-less motion stream.
    quant: Any = False
    dtype: Optional[Any] = None

    def _validate(self):
        # the reference's config asserts (yolo3.py:978-995)
        if self.quant:
            if self.backbone is not None:
                assert getattr(self.backbone, "quant", None) == self.quant, (
                    "a custom backbone must carry the same quant mode "
                    "(ops/quantize.replace_quant threads it)"
                )
        assert self.rnn_pos in (None, "late", "out")
        assert self.k_join_type in (None, "max", "mean", "cat")
        assert self.k_join_pos in (None, "early", "late")
        assert self.corr_pos in (None, "early", "late")
        if self.feed is not None:
            assert self.feed == "tips"
            assert self.corr_pos is None and self.block_conv_type == "2", (
                "feed='tips' needs a frame-pure per-frame FPN"
            )
            assert self.rnn_pos == "out" or (
                self.rnn_pos is None
                and self.k_join_pos == "late"
                and self.k_join_type is not None
            ), "feed='tips' covers plain late joins and rnn_pos='out'"
        if self.corr_pos is not None:
            assert self.corr_d, "corr_pos requires corr_d > 0"
        if self.block_conv_type in ("3", "21"):
            assert self.k > 1, "3D/2+1D blocks need k > 1"
            assert self.k_join_pos == "late", "3D/2+1D blocks join late"
            assert self.k_join_type is not None
        if self.rnn_pos == "late":
            assert self.k_join_pos == "late"

    def _join(self, x):
        if self.k_join_type == "cat":
            return _fold_time_into_channels(x)
        return TemporalPooling(type=self.k_join_type)(x)

    def _finish(self, level_outs, train: bool):
        if train:
            return {
                key: jnp.concatenate([o[key] for o in level_outs], axis=-2)
                for key in level_outs[0]
            }
        boxes = jnp.concatenate([o[0] for o in level_outs], axis=-2)
        class_scores = jnp.concatenate([o[1] for o in level_outs], axis=-2)
        conf = jnp.concatenate([o[2] for o in level_outs], axis=-2)
        if self.agnostic:
            return boxes, conf
        return boxes, class_scores

    @nn.compact
    def __call__(self, x, train: bool = False):
        self._validate()
        temporal = self.k is not None and self.k > 1

        if self.feed == "tips":
            # x: 3-tuple of per-frame pre-join tip windows (B, k, H, W, C),
            # deep->shallow — only the joins/output-RNN + output heads run,
            # so the params this branch creates (output0..2) are exactly
            # the streaming head's name-split variables
            anchors_rev = list(self.anchors)[::-1]
            strides_rev = list(self.strides)[::-1]
            level_outs = []
            for i in range(3):
                pairs = _anchor_pairs(anchors_rev[i])
                if self.rnn_pos == "out":
                    out = YOLOOutputRNN(
                        self.num_classes, pairs, strides_rev[i],
                        k_join_type=self.k_join_type or "max",
                        name=f"output{i}", dtype=self.dtype,
                    )(x[i], train)
                else:
                    out = YOLOOutputConvT(
                        self.num_classes, pairs, strides_rev[i],
                        name=f"output{i}", dtype=self.dtype,
                    )(self._join(x[i]), train)
                level_outs.append(out)
            return self._finish(level_outs, train)

        if self.backbone is not None:
            routes = list(self.backbone(x, train))
        else:
            stages = [
                Darknet53Stage1(name="stage1", quant=self.quant, dtype=self.dtype),
                DarknetStage(512, 8, name="stage2", quant=self.quant, dtype=self.dtype),
                DarknetStage(1024, 4, name="stage3", quant=self.quant, dtype=self.dtype),
            ]
            routes = []
            y = x
            for stage in stages:
                if temporal and y.ndim == 5:
                    y = time_distributed(partial(stage, train=train), y)
                else:
                    y = stage(y, train)
                routes.append(y)

        corr = (
            Corr(self.corr_d, self.k, kernel_size=1, stride=1, keep="all", name="corr")
            if (temporal and self.corr_pos is not None)
            else None
        )

        # early join / early corr over every route (yolo3.py:1105-1124)
        if temporal and routes[0].ndim == 5:
            if self.k_join_pos == "early" and self.rnn_pos != "out":
                routes = [self._join(r) for r in routes]
            elif self.corr_pos == "early":
                routes = [corr(r) for r in routes]

        anchors_rev = list(self.anchors)[::-1]
        strides_rev = list(self.strides)[::-1]

        level_outs = []
        y = routes[-1]
        for i in range(3):
            if self.rnn_pos == "late":
                y = YOLODetectionBlockT(
                    self.channels[i],
                    self.block_conv_type,
                    with_tip=False,
                    name=f"block{i}",
                    quant=self.quant,
                    dtype=self.dtype,
                )(y, train)
                tip = ConvRNN(
                    self.channels[i] * 2, kernel=(3, 3), dtype=self.dtype, name=f"tip_rnn{i}"
                )(y)
            else:
                y, tip = YOLODetectionBlockT(
                    self.channels[i],
                    self.block_conv_type,
                    name=f"block{i}",
                    quant=self.quant,
                    dtype=self.dtype,
                )(y, train)

            # late join / late corr on the tip (yolo3.py:1134-1141)
            if tip.ndim == 5 and self.rnn_pos != "out":
                if self.k_join_pos == "late" and self.k_join_type is not None:
                    tip = self._join(tip)
                elif self.corr_pos == "late":
                    tip = corr(tip)

            pairs = _anchor_pairs(anchors_rev[i])
            if self.rnn_pos == "out":
                out = YOLOOutputRNN(
                    self.num_classes,
                    pairs,
                    strides_rev[i],
                    k_join_type=self.k_join_type or "max",
                    name=f"output{i}",
                    dtype=self.dtype,
                )(tip, train)
            else:
                out = YOLOOutputConvT(
                    self.num_classes, pairs, strides_rev[i], name=f"output{i}", dtype=self.dtype
                )(tip, train)
            level_outs.append(out)

            if i < 2:
                trans = ConvBNLeaky(
                    self.channels[i + 1], kernel=1, name=f"transition{i}",
                    quant=self.quant, dtype=self.dtype,
                )
                if y.ndim == 5:
                    y = time_distributed(partial(trans, train=train), y)
                else:
                    y = trans(y, train)
                y = upsample2x(y)
                y = jnp.concatenate([y, routes[2 - (i + 1)]], axis=-1)

        return self._finish(level_outs, train)


class YOLOv3Temporal(nn.Module):
    """The newer t=5 temporal model (yolo3_temporal.py:242-560).

    t_out=True : every branch runs per-frame; outputs carry a (B, T, N, ...)
                 leading pair.  With `corr_d`, the correlation-pyramid path:
                 stage1 per-frame, cost volumes vs the middle frame
                 (keep='none', comp_mid=True), a 3-level conv pyramid of the
                 correlation features concatenated with the middle frame's
                 darknet features (yolo3_temporal.py:403-424).
    t_out=False: the 5->3->1 temporal funnel — per-frame stages fused with
                 strided 2+1D convs, emitting single-frame routes
                 (yolo3_temporal.py:434-448).

    `feed` is the streaming split point (videoyolo_tpu/streaming.py): None
    takes frames; "stage1" takes the cached per-frame stage1 feature window
    (B, T, H/8, W/8, 256) — the only per-frame compute the corr-pyramid and
    funnel paths have; "routes" takes the 3-tuple of per-frame route
    buffers (plain t_out path, whose whole backbone is per-frame).  The
    skipped stages' params are simply never created (flax lazily creates on
    call), so a feed-clone applies cleanly on the name-split variables.
    """

    num_classes: int
    t: int = 5
    conv: int = 2
    corr_d: int = 0
    t_out: bool = True
    feed: Optional[str] = None
    agnostic: bool = False
    anchors: Any = DEFAULT_ANCHORS
    strides: Sequence[int] = DEFAULT_STRIDES
    channels: Sequence[int] = FPN_CHANNELS
    # int8 serving (ops/quantize.py): every conv-BN cell quantises (2D and
    # the funnel's 2+1D 3D cells); prediction convs and Corr stay real
    quant: Any = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.t in (1, 5), "reference supports t=5 (yolo3_temporal.py:400)"
        assert self.feed in (None, "stage1", "routes")
        if self.feed == "routes":
            assert self.t_out and not self.corr_d, (
                "feed='routes' is the plain t_out split; the corr/funnel "
                "paths split at stage1 (feed='stage1')"
            )
        if self.feed == "stage1":
            assert self.t > 1 and (self.corr_d or not self.t_out)
        stages = [
            Darknet53Stage1(name="stage1", quant=self.quant, dtype=self.dtype),
            DarknetStage(512, 8, name="stage2", quant=self.quant, dtype=self.dtype),
            DarknetStage(1024, 4, name="stage3", quant=self.quant, dtype=self.dtype),
        ]
        routes = []
        if self.t == 1:
            y = x
            for stage in stages:
                y = stage(y, train)
                routes.append(y)
        elif self.t_out and self.corr_d:
            if self.feed == "stage1":
                y = x
            else:
                y = time_distributed(partial(stages[0], train=train), x)
            mid = y[:, self.t // 2]
            c = Corr(
                self.corr_d, self.t, kernel_size=3, stride=1, keep="none",
                comp_mid=True, name="corr",
            )(y)
            conv1 = ConvBNLeaky(128, kernel=3, stride=1, name="convs1", quant=self.quant, dtype=self.dtype)
            conv2 = ConvBNLeaky(128, kernel=3, stride=2, name="convs2", quant=self.quant, dtype=self.dtype)
            conv3 = ConvBNLeaky(128, kernel=3, stride=2, name="convs3", quant=self.quant, dtype=self.dtype)

            c = time_distributed(partial(conv1, train=train), c)
            rep = jnp.repeat(mid[:, None], self.t, axis=1)
            routes.append(jnp.concatenate([rep, c], axis=-1))

            mid = stages[1](mid, train)
            rep = jnp.repeat(mid[:, None], self.t, axis=1)
            c = time_distributed(partial(conv2, train=train), c)
            routes.append(jnp.concatenate([rep, c], axis=-1))

            mid = stages[2](mid, train)
            rep = jnp.repeat(mid[:, None], self.t, axis=1)
            c = time_distributed(partial(conv3, train=train), c)
            routes.append(jnp.concatenate([rep, c], axis=-1))
        elif self.t_out:
            if self.feed == "routes":
                routes = list(x)
            else:
                y = x
                for stage in stages:
                    y = time_distributed(partial(stage, train=train), y)
                    routes.append(y)
        else:
            # 5 -> 3 -> 1 temporal funnel with strided 2+1D fusion convs:
            # _conv21d(512, t=3, m=256, spatial stride 2, temporal VALID) so T
            # shrinks 5->3->1 while the per-frame darknet stages run on the
            # shrinking window (yolo3_temporal.py:326-333, 434-448)
            def funnel(feat, m, name):
                def f(z, train):
                    z = ConvBNLeaky3D(
                        m, kernel=(1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1),
                        quant=self.quant, dtype=self.dtype, name=f"{name}_s",
                    )(z, train)
                    return ConvBNLeaky3D(
                        feat, kernel=(3, 1, 1), stride=(1, 1, 1), padding=(0, 0, 0),
                        quant=self.quant, dtype=self.dtype, name=f"{name}_t",
                    )(z, train)
                return f

            if self.feed == "stage1":
                y = x
            else:
                y = time_distributed(partial(stages[0], train=train), x)
            routes.append(y[:, 2])
            cx = funnel(512, 256, "convs1")(y, train)  # (B, 3, H/16, W/16, 512)
            y = time_distributed(partial(stages[1], train=train), y[:, 1:4]) + cx
            routes.append(y[:, 1])
            cx = funnel(1024, 512, "convs2")(y, train)  # (B, 1, H/32, W/32, 1024)
            y = time_distributed(partial(stages[2], train=train), y[:, 1:2]) + cx
            y = y[:, 0]
            routes.append(y)

        anchors_rev = list(self.anchors)[::-1]
        strides_rev = list(self.strides)[::-1]
        per_frame = self.t > 1 and self.t_out

        level_outs = []
        y = routes[-1]
        for i in range(3):
            block = YOLODetectionBlockT(
                self.channels[i], str(self.conv), name=f"block{i}",
                quant=self.quant, dtype=self.dtype,
            )
            if per_frame and self.conv == 2:
                y, tip = time_distributed(partial(block, train=train), y)
            else:
                y, tip = block(y, train)

            out = YOLOOutputConvT(
                self.num_classes,
                _anchor_pairs(anchors_rev[i]),
                strides_rev[i],
                name=f"output{i}",
                dtype=self.dtype,
            )(tip, train)
            level_outs.append(out)

            if i < 2:
                trans = ConvBNLeaky(
                    self.channels[i + 1], kernel=1, name=f"transition{i}",
                    quant=self.quant, dtype=self.dtype,
                )
                if per_frame:
                    y = time_distributed(partial(trans, train=train), y)
                else:
                    y = trans(y, train)
                y = upsample2x(y)
                y = jnp.concatenate([y, routes[2 - (i + 1)]], axis=-1)

        if train:
            return {
                key: jnp.concatenate([o[key] for o in level_outs], axis=-2)
                for key in level_outs[0]
            }
        boxes = jnp.concatenate([o[0] for o in level_outs], axis=-2)
        class_scores = jnp.concatenate([o[1] for o in level_outs], axis=-2)
        conf = jnp.concatenate([o[2] for o in level_outs], axis=-2)
        if self.agnostic:
            return boxes, conf
        return boxes, class_scores
