"""Core detection math: bbox ops, anchors, NMS, target generation, losses."""

from . import anchors, bbox, losses, nms, targets  # noqa: F401
