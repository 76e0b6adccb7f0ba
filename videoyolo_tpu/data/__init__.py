"""Datasets (uniform protocol), host-side transforms, and the input pipeline."""

from .base import DetectionDataset, load_names  # noqa: F401
from .detectset import DetectSet  # noqa: F401
from .pascalvoc import VOCDetection  # noqa: F401
