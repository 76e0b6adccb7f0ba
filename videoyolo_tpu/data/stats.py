"""Offline dataset statistics tables.

Capability parity with `/root/reference/datasets/stats.py` (:1-200): builds
per-dataset and cross-dataset sample/box/class tables (the README dataset
statistics) from any dataset implementing the shared protocol; emits
tab-separated text suitable for spreadsheets.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

__all__ = ["dataset_stats", "combined_stats_table"]


def dataset_stats(dataset) -> Dict[str, object]:
    """Counts: samples, boxes, boxes per class, images-with-boxes."""
    n_boxes = np.zeros(len(dataset.classes), np.int64)
    n_nonempty = 0
    total_boxes = 0
    for idx in range(len(dataset)):
        label = dataset._load_label(idx)
        label = np.asarray(label).reshape(-1, label.shape[-1]) if len(label) else label
        valid = [row for row in label if row[4] >= 0]
        if valid:
            n_nonempty += 1
        for row in valid:
            cls = int(row[4])
            if 0 <= cls < len(n_boxes):
                n_boxes[cls] += 1
                total_boxes += 1
    return {
        "name": getattr(dataset, "name", dataset.__class__.__name__),
        "samples": len(dataset),
        "nonempty": n_nonempty,
        "boxes": int(total_boxes),
        "classes": int((n_boxes > 0).sum()),
        "boxes_per_class": n_boxes,
    }


def combined_stats_table(datasets: Sequence, header: bool = True) -> str:
    """One row per dataset, tab separated (reference stats.py tables)."""
    out = ""
    if header:
        out += "dataset\tsamples\tnonempty\tboxes\tclasses\n"
    for ds in datasets:
        s = dataset_stats(ds)
        out += f"{s['name']}\t{s['samples']}\t{s['nonempty']}\t{s['boxes']}\t{s['classes']}\n"
    return out
