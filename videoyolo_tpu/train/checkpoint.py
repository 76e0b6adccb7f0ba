"""Checkpointing with the reference's save/resume/best/GC policies.

Capability parity with `/root/reference/train_yolov3.py`:
  * `save_params` (:289-309): always write `<prefix>_best.params` on val-mAP
    improvement and append to `<prefix>_best_map.log`; positive
    `save_interval` saves every N epochs; NEGATIVE interval saves every epoch
    then garbage-collects all but every |N|th;
  * `resume` (:312-329): explicit file, or `start_epoch=-1` auto-finds the
    latest `*_0*.params` in the experiment dir.

Format: flax msgpack of {params, batch_stats[, opt_state, step]} — a single
`.params` file like the reference's gluon param files.
"""
from __future__ import annotations

import glob
import os
from typing import Any, Dict, Optional, Tuple

from flax import serialization

__all__ = [
    "save_variables",
    "load_variables",
    "load_detector_params",
    "save_params",
    "resume_params",
    "find_latest",
]


def save_variables(path: str, variables: Dict[str, Any]) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = serialization.to_bytes(
        {k: serialization.to_state_dict(v) for k, v in variables.items()}
    )
    # atomic (tmp + rename): a kill mid-write (e.g. the preemption grace
    # window expiring) must not leave a truncated .params that
    # find_latest/--start_epoch -1 would pick and crash on; the .tmp
    # suffix also keeps partial files out of find_latest's *.params glob
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return path


def load_variables(path: str, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    with open(path, "rb") as f:
        raw = f.read()
    if template is not None:
        tmpl = {k: serialization.to_state_dict(v) for k, v in template.items()}
        state = serialization.from_bytes(tmpl, raw)
        return {
            k: serialization.from_state_dict(template[k], state[k]) for k in template
        }
    return serialization.msgpack_restore(raw)


def load_detector_params(path: str, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Load a detector checkpoint, sniffing the container format.

    `.params` files from the reference (gluon save_parameters, mx.nd.save
    container magic 0x112 — train_yolov3.py:289-329) are ingested via the
    full yolo3_darknet53 name mapping; anything else is this repo's flax
    msgpack.  Lets a reference user point --model_path at their existing
    checkpoints unchanged."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if len(magic) == 8 and int.from_bytes(magic, "little") == 0x112:
        from ..utils.gluon_import import load_gluon_yolo3

        return load_gluon_yolo3(dict(variables), path)
    return load_variables(path, variables)


def save_params(
    prefix: str,
    variables: Dict[str, Any],
    current_map: float,
    best_map: float,
    epoch: int,
    save_interval: int,
) -> float:
    """Reference save_params policy (train_yolov3.py:289-309).  Returns the
    (possibly updated) best mAP."""
    current_map = float(current_map)
    if current_map > best_map:
        best_map = current_map
        save_variables(f"{prefix}_best.params", variables)
        with open(prefix + "_best_map.log", "a") as f:
            f.write(f"{epoch:04d}:\t{current_map:.4f}\n")
    # file name matches the reference exactly ({prefix}_{epoch:04d}.params):
    # checkpoints exported via write_mxnet_params stay loadable by the
    # reference's resume, which parses the last '_' token as the epoch
    if save_interval > 0 and epoch % save_interval == 0:
        save_variables(f"{prefix}_{epoch:04d}.params", variables)
    if save_interval < 0:
        # save every epoch; on each |interval| boundary delete the strays
        # since the previous boundary (train_yolov3.py:301-309)
        save_variables(f"{prefix}_{epoch:04d}.params", variables)
        if epoch % -save_interval == 0:
            for d in range(max(0, epoch + save_interval + 1), epoch):
                stale = f"{prefix}_{d:04d}.params"
                if os.path.exists(stale):
                    os.remove(stale)
    return best_map


def _epoch_of(path: str) -> int:
    """Epoch from a checkpoint name — the reference's parse:
    int(file[:-7].split('_')[-1]) for {prefix}_{epoch:04d}.params."""
    try:
        return int(os.path.basename(path)[: -len(".params")].split("_")[-1])
    except ValueError:
        return -1


def find_latest(save_dir: str) -> Optional[str]:
    """Latest epoch checkpoint in a dir (resume start_epoch=-1 behaviour).

    Matches every *.params whose suffix parses as an epoch — the reference
    globs '*_0*.params' and documents that it "requires the first digit of
    epoch in save string is a 0" (train_yolov3.py:319-325), which silently
    misses e.g. _1111.params; the _epoch_of filter already excludes
    _best.params, so the wider glob is strictly safer."""
    files = [
        f
        for f in glob.glob(os.path.join(save_dir, "*.params"))
        if _epoch_of(f) >= 0
    ]
    if not files:
        return None
    return max(files, key=_epoch_of)


def resume_params(
    resume: str,
    start_epoch: int,
    save_dir: str,
    template: Optional[Dict[str, Any]] = None,
) -> Tuple[Optional[Dict[str, Any]], int]:
    """Reference resume() (train_yolov3.py:312-329): explicit file or latest."""
    if resume and resume.strip():
        path = resume.strip()
        variables = load_variables(path, template)
        if start_epoch < 0:
            e = _epoch_of(path)
            return variables, e + 1 if e >= 0 else 0
        return variables, start_epoch
    if start_epoch == -1:
        latest = find_latest(save_dir)
        if latest is None:
            return None, 0
        variables = load_variables(latest, template)
        return variables, _epoch_of(latest) + 1
    return None, max(start_epoch, 0)
