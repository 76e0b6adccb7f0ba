"""Model factory — the reference's combinatorial config surface.

Capability parity with `/root/reference/models/definitions/yolo/wrappers.py`
(`yolo3_darknet53` :9, `yolo3_3ddarknet` :113, `yolo3_no_backbone` :133): one
entry point dispatching over the temporal-model config axes — every reachable
reference configuration builds (YoloConfig.validate() rejects the same
illegal combinations the reference asserts on, yolo3.py:978-988).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from .yolo3 import YOLOv3

__all__ = [
    "YoloConfig",
    "yolo3_darknet53",
    "yolo3_3ddarknet",
    "yolo3_no_backbone",
    "build_model",
]


@dataclass(frozen=True)
class YoloConfig:
    """Typed replacement for the ~15 interacting wrapper kwargs
    (wrappers.py:9-13 + scattered asserts, yolo3.py:978-988)."""

    num_classes: int
    k: Optional[int] = None  # temporal window size
    k_join_type: Optional[str] = None  # max | mean | cat
    k_join_pos: Optional[str] = None  # early | late
    block_conv_type: str = "2"  # '2' | '3' | '21'
    rnn_pos: Optional[str] = None  # late | out
    corr_pos: Optional[str] = None  # early | late
    corr_d: Optional[int] = None
    motion_stream: Optional[str] = None  # flownet | r21d
    add_type: Optional[str] = None  # stream gating: add | mul
    agnostic: bool = False
    new_model: bool = False
    hierarchical: Sequence[int] = (1, 1, 1, 1, 1)
    h_join_type: Optional[str] = None  # max | conv
    temporal: bool = False
    t_out: bool = False
    conv_types: Sequence[int] = (2, 2, 2, 2, 2, 2)
    funnel_time: bool = False
    remat: bool = False  # rematerialise backbone activations (2D model)
    s2d_stem: bool = False  # space-to-depth stem (2D model; models/s2d.py)
    # input-channel-padded stem (2D model; bit-equivalent, +7.7% detect —
    # models/s2d.pad_stem_cin refolds standard checkpoints)
    pad_stem: bool = False
    dtype: object = None

    def validate(self):
        assert not (self.s2d_stem and self.pad_stem), (
            "s2d_stem already reshapes the input to 12 channels; pad_stem "
            "does not compose with it"
        )
        if self.k is not None and self.k > 1:
            assert self.k_join_type in (None, "max", "mean", "cat")
            assert self.k_join_pos in (None, "early", "late")
        assert self.block_conv_type in ("2", "3", "21")
        if self.motion_stream == "flownet":
            assert self.k == 3, "flownet stream requires k=3 (wrappers.py:63)"
        if self.motion_stream == "r21d":
            assert self.k in (9, 33), "r21d stream requires k in {9,33} (wrappers.py:72)"


def build_model(cfg: YoloConfig):
    """Config -> model instance, the reference wrapper dispatch
    (wrappers.py:41-110) over typed config axes."""
    cfg.validate()
    if cfg.motion_stream:
        # YOLOV3TS (yolo3.py:632): two-stream backbone + plain 2D head
        from .ts_darknet import TwoStreamDarknet
        from .yolo3_temporal import YOLOv3T

        backbone = TwoStreamDarknet(
            stream=cfg.motion_stream, t=cfg.k, add_type=cfg.add_type, dtype=cfg.dtype
        )
        return YOLOv3T(
            num_classes=cfg.num_classes,
            k=cfg.k,
            backbone=backbone,
            agnostic=cfg.agnostic,
            dtype=cfg.dtype,
        )
    if cfg.temporal or cfg.t_out:
        from .yolo3_temporal import YOLOv3Temporal

        return YOLOv3Temporal(
            num_classes=cfg.num_classes,
            t=cfg.k or 5,
            conv=int(cfg.block_conv_type),
            corr_d=cfg.corr_d or 0,
            t_out=cfg.t_out,
            agnostic=cfg.agnostic,
            dtype=cfg.dtype,
        )
    if cfg.new_model:
        # YOLOV3TB (yolo3.py:1305): backbone returns routes itself
        from .yolo3_temporal import YOLOv3T

        if cfg.hierarchical[0] > 1:
            from .h_darknet import HDarknet

            backbone = HDarknet(
                windows=tuple(cfg.hierarchical),
                merge_type=cfg.h_join_type or "max",
                dtype=cfg.dtype,
            )
            k = 1
        else:
            from .darknet3d import Darknet3D

            backbone = Darknet3D(
                conv_types=tuple(cfg.conv_types),
                funnel_time=cfg.funnel_time,
                dtype=cfg.dtype,
            )
            k = cfg.k or 1
        return YOLOv3T(
            num_classes=cfg.num_classes,
            k=k,
            k_join_type=cfg.k_join_type,
            k_join_pos=cfg.k_join_pos,
            block_conv_type=cfg.block_conv_type,
            rnn_pos=cfg.rnn_pos,
            corr_pos=cfg.corr_pos,
            corr_d=cfg.corr_d,
            backbone=backbone,
            agnostic=cfg.agnostic,
            dtype=cfg.dtype,
        )
    if cfg.k is not None and cfg.k > 1:
        from .yolo3_temporal import YOLOv3T

        return YOLOv3T(
            num_classes=cfg.num_classes,
            k=cfg.k,
            k_join_type=cfg.k_join_type or "max",
            k_join_pos=cfg.k_join_pos or "early",
            block_conv_type=cfg.block_conv_type,
            rnn_pos=cfg.rnn_pos,
            corr_pos=cfg.corr_pos,
            corr_d=cfg.corr_d,
            agnostic=cfg.agnostic,
            dtype=cfg.dtype,
        )
    return YOLOv3(
        num_classes=cfg.num_classes, agnostic=cfg.agnostic, remat=cfg.remat,
        s2d_stem=cfg.s2d_stem, pad_stem=cfg.pad_stem, dtype=cfg.dtype,
    )


def yolo3_3ddarknet(classes, conv_types=(2, 2, 2, 2, 2, 2), agnostic=False, dtype=None, **kwargs):
    """3D-darknet detector factory (wrappers.py:113-130)."""
    num = classes if isinstance(classes, int) else len(classes)
    cfg = YoloConfig(
        num_classes=num, new_model=True, conv_types=tuple(conv_types),
        agnostic=agnostic, dtype=dtype, **kwargs,
    )
    return build_model(cfg)


def yolo3_darknet53(classes, dtype=None, **kwargs) -> YOLOv3:
    """Reference factory surface (wrappers.py:9): classes may be a list of
    names or an int count."""
    num = classes if isinstance(classes, int) else len(classes)
    cfg = YoloConfig(num_classes=num, dtype=dtype, **kwargs)
    return build_model(cfg)


def yolo3_no_backbone(classes, agnostic: bool = False, dtype=None) -> YOLOv3:
    """Head-only model over pre-extracted (f1,f2,f3) features
    (wrappers.py:133, yolo3.py:1686)."""
    num = classes if isinstance(classes, int) else len(classes)
    return YOLOv3(num_classes=num, agnostic=agnostic, use_backbone=False, dtype=dtype)
