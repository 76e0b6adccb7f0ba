"""Host-side evaluation metrics (fed from small post-NMS device outputs)."""

from .pascalvoc import VOC07MApMetric, VOCMApMetric, VOCMApMetricTemporal  # noqa: F401
