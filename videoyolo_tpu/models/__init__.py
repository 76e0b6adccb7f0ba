"""Model definitions: backbones, detectors, primitive layers."""

from .darknet import Darknet53, Darknet53Classifier  # noqa: F401
from .yolo3 import YOLOv3, postprocess, select_topk_candidates  # noqa: F401
