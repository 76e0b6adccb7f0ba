"""Train-log -> tab-separated stats for spreadsheets.

Capability parity with `/root/reference/utils/process_logs.py` (:7-45),
adapted to this framework's log lines (train_yolov3.py logging format:
per-epoch "[Epoch N] done ..." summaries, per-interval loss lines
"ObjLoss=..., BoxCenterLoss=..., ..." and validation blocks "name=value").
"""
from __future__ import annotations

import re
from typing import Dict, List

__all__ = ["extract_stats", "display_stats"]

_LOSS_RE = re.compile(
    r"\[Epoch (\d+)\].*?"
    r"ObjLoss=([\d.eE+-]+), BoxCenterLoss=([\d.eE+-]+), "
    r"BoxScaleLoss=([\d.eE+-]+), ClassLoss=([\d.eE+-]+)"
)
_MAP_RE = re.compile(r"^mAP=([\d.eE+-]+|nan)")
_VAL_EPOCH_RE = re.compile(r"\[Epoch (\d+)\] Validation")


def extract_stats(log_file_path: str) -> Dict[int, Dict[str, float]]:
    """Per-epoch dict of the four loss components (last logged interval of
    the epoch) and validation mAP."""
    stats: Dict[int, Dict[str, float]] = {}
    current_val_epoch = None
    with open(log_file_path) as f:
        for line in f:
            line = line.rstrip()
            m = _LOSS_RE.search(line)
            if m:
                epoch = int(m.group(1))
                stats.setdefault(epoch, {}).update(
                    ObjLoss=float(m.group(2)),
                    BoxCenterLoss=float(m.group(3)),
                    BoxScaleLoss=float(m.group(4)),
                    ClassLoss=float(m.group(5)),
                )
                continue
            m = _VAL_EPOCH_RE.search(line)
            if m:
                current_val_epoch = int(m.group(1))
                continue
            m = _MAP_RE.match(line)
            if m and current_val_epoch is not None:
                stats.setdefault(current_val_epoch, {})["mAP"] = float(m.group(1))
    return stats


def display_stats(
    stats: Dict[int, Dict[str, float]],
    columns: List[str] = (
        "Epoch", "mAP", "ObjLoss", "BoxCenterLoss", "BoxScaleLoss", "ClassLoss"
    ),
    header: bool = True,
) -> str:
    out = ""
    if header:
        out += "\t".join(columns) + "\n"
    for epoch in sorted(stats):
        row = []
        for c in columns:
            row.append(str(epoch) if c == "Epoch" else str(stats[epoch].get(c, "")))
        out += "\t".join(row) + "\n"
    return out
