"""Host-side utilities: drawing, video <-> frames, progress, log parsing."""

from .general import as_numpy, print_progress  # noqa: F401
from .image import cv_plot_bbox  # noqa: F401
