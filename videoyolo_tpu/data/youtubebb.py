"""YouTube-BoundingBoxes dataset.

Capability parity with `/root/reference/datasets/youtubebb.py`
(`YouTubeBBDetection` :20): csv annotations; per-clip (one object instance
per clip, YTBB default) or per-video grouping (:404-432); fraction/count
frame subsampling (`frames` param, :439-451); the same centred temporal
window sampler as ImageNet-VID (:456-478); streaming acquisition — download
via youtube-dl + OpenCV frame extraction in a process pool (:230-383),
recording failures to `frame_get_errors.txt` (:292-296).

Labels keep the raw YTBB fractional coordinates (the reference does too,
youtubebb.py:490-523) with rows [xmin,ymin,xmax,ymax,cls_id,trk_id] in
[0,1].  The acquisition path degrades gracefully when youtube-dl/yt-dlp is
not installed (this image has no network egress anyway).
"""
from __future__ import annotations

import csv
import logging
import math
import os
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional

import numpy as np

from .base import DetectionDataset, load_names, read_image

__all__ = ["YouTubeBBDetection"]


def _download_and_extract(args):
    """Worker: fetch one video and dump the annotated frames
    (youtubebb.py:300-383).  Runs in a process pool."""
    root, v_id, frames, keep_vids = args
    vid_dir = os.path.join(root, "videos")
    frames_dir = os.path.join(root, "frames", v_id)
    os.makedirs(vid_dir, exist_ok=True)
    os.makedirs(frames_dir, exist_ok=True)
    video_path = os.path.join(vid_dir, v_id + ".mp4")
    try:
        if not os.path.exists(video_path):
            try:
                import yt_dlp as youtube_dl  # pragma: no cover
            except ImportError:
                import youtube_dl  # pragma: no cover
            opts = {
                "outtmpl": video_path,
                "format": "mp4",
                "quiet": True,
            }
            with youtube_dl.YoutubeDL(opts) as ydl:  # pragma: no cover
                ydl.download([f"https://www.youtube.com/watch?v={v_id}"])
        import cv2

        cap = cv2.VideoCapture(video_path)
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        for ts_ms in frames:
            out = os.path.join(frames_dir, f"{ts_ms}.jpg")
            if os.path.exists(out):
                continue
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(round(int(ts_ms) / 1000.0 * fps)))
            ok, frame = cap.read()
            if ok:
                cv2.imwrite(out, frame)
        cap.release()
        if not keep_vids and os.path.exists(video_path):
            os.remove(video_path)
        return None
    except Exception as e:  # record failure, don't kill the pool
        return (v_id, str(e))


class YouTubeBBDetection(DetectionDataset):
    """YouTube-BB object detection dataset (youtubebb.py:20)."""

    name = "yt"

    def __init__(
        self,
        root=os.path.join("datasets", "YouTubeBB"),
        splits=("train",),
        allow_empty: bool = False,
        videos: bool = False,
        clips: bool = True,
        download: bool = False,
        keep_vids: bool = False,
        transform=None,
        index_map=None,
        frames: float = 1,
        inference: bool = False,
        window=(1, 1),
    ):
        super().__init__(transform=transform, inference=inference)
        assert len(splits) == 1, "one split at a time (conflicting ids otherwise)"
        self.root = os.path.expanduser(root)
        self._splits = list(splits)
        self._videos = videos
        self._clips = clips
        self._download = download
        self._keep_vids = keep_vids
        self._frames = frames
        self._window_size = window[0]
        self._window_step = window[1]
        if videos or self._window_size > 1:
            allow_empty = True
        self._allow_empty = allow_empty
        self._windows: Optional[Dict] = None

        self._image_path = os.path.join(self.root, "frames", "{}", "{}.jpg")
        self._coco_path = os.path.join(
            self.root, "jsons", "_".join(self._splits) + ".json"
        )
        self.index_map = index_map or dict(zip(self.class_ids, range(self.num_class)))
        self.samples = self._load_items(self._splits)
        # sample ids are "<vid_id>,<timestamp_ms>": order frames WITHIN a
        # video numerically by timestamp (lexicographic string sort scrambles
        # clip order — 10000 < 2000 — which would feed temporal windows and
        # --stream ring buffers time-shuffled frames)
        self.sample_ids = sorted(
            self.samples.keys(),
            key=lambda s: (s.rsplit(",", 1)[0], int(s.rsplit(",", 1)[1]))
            if s.rsplit(",", 1)[-1].isdigit() else (s, 0),
        )

    @property
    def classes(self) -> List[str]:
        return load_names("youtubebb")

    @property
    def class_ids(self) -> List[int]:
        return [int(x) for x in load_names("youtubebb_ids")]

    @property
    def wn_classes(self) -> List[str]:
        return load_names("youtubebb_wn")

    def __len__(self):
        return len(self.sample_ids)

    def get_sample_ids(self):
        return self.sample_ids

    def sample_path(self, idx):
        sid = self.sample_ids[idx]
        v_id = sid.split(",")[0]
        frame_id = sid.split(",")[-1]
        return self._image_path.format(v_id, frame_id)

    def _sid_path(self, sid):
        return self._image_path.format(sid.split(",")[0], sid.split(",")[-1])

    def window_paths(self, idx):
        """Frame paths of the sample's temporal window (mult_out detect)."""
        return [self._sid_path(s) for s in self._windows[self.sample_ids[idx]]]

    def __getitem__(self, idx):
        label = self._load_label(idx)[:, :-1]  # strip track id
        if self._window_size > 1:
            imgs = [
                read_image(self._sid_path(sid))
                for sid in self._windows[self.sample_ids[idx]]
            ]
            img = np.stack(imgs)
        else:
            img = read_image(self.sample_path(idx))
        return self._transformed(img, label, idx)

    # --- annotation loading (youtubebb.py:384-487) --------------------------
    def _load_items(self, splits):
        rows = []
        for split in splits:
            if split == "val":
                split = "validation"
            path = os.path.join(self.root, f"yt_bb_detection_{split}.csv")
            if os.path.exists(path):
                with open(path) as f:
                    rows.extend(csv.reader(f))

        videos: Dict[str, Dict[str, list]] = {}
        empty = 0
        for row in rows:
            if not self._allow_empty and row[5] == "absent":
                empty += 1
                continue
            # per-clip: key on (video, class, object instance); per-video:
            # key on video id alone (youtubebb.py:404-432)
            vid_id = row[0] + "," + row[2] + "," + row[4] if self._clips else row[0]
            videos.setdefault(vid_id, {}).setdefault(row[1], []).append(row[2:])
        if empty:
            logging.info("removed %d empty annotations", empty)

        if self._download and videos:
            self.download(videos)

        # fraction/count subsampling per video (youtubebb.py:439-451)
        if self._frames != 1:
            for vid_id in videos:
                frame_ids = sorted(videos[vid_id].keys(), key=int)
                if self._frames < 1:
                    keep = frame_ids[:: int(1 / self._frames)]
                else:
                    keep = frame_ids[:: int(math.ceil(len(frame_ids) / self._frames))]
                keep = set(keep)
                videos[vid_id] = {
                    k: v for k, v in videos[vid_id].items() if k in keep
                }

        if self._videos:
            return videos

        # centred clamped temporal windows (youtubebb.py:456-478)
        if self._window_size > 1:
            self._windows = {}
            half = int(self._window_size / 2.0)
            step = self._window_step
            for vid_id in videos:
                fids = [
                    vid_id + "," + f
                    for f in sorted(videos[vid_id].keys(), key=int)
                ]
                for i in range(len(fids)):
                    window = [
                        fids[max(0, i - b)]
                        for b in range(half * step, step - 1, -step)
                    ]
                    window.append(fids[i])
                    for fwd in range(step, half * step + 1, step):
                        if len(window) == self._window_size:
                            break
                        window.append(fids[min(len(fids) - 1, i + fwd)])
                    self._windows[fids[i]] = window

        frames = {}
        for vid_id in videos:
            for frame_id, objs in videos[vid_id].items():
                frames[vid_id + "," + frame_id] = objs
        return frames

    def _load_label(self, idx, frame_id=None) -> np.ndarray:
        sample = self.samples[self.sample_ids[idx]]
        if self._videos:
            assert frame_id is not None
            sample = sample[frame_id]
        label = []
        for obj in sample:
            cls_id = int(obj[0])
            if cls_id not in self.class_ids:
                continue
            cls_id = self.index_map[cls_id]
            trk_id = int(obj[2])
            xmin, xmax = float(obj[4]), float(obj[5])
            ymin, ymax = float(obj[6]), float(obj[7])
            if obj[3] == "absent" or min(xmin, xmax, ymin, ymax) < 0:
                continue
            xmin, ymin = min(max(0.0, xmin), 1.0), min(max(0.0, ymin), 1.0)
            xmax, ymax = min(max(xmin, xmax), 1.0), min(max(ymin, ymax), 1.0)
            label.append([xmin, ymin, xmax, ymax, cls_id, trk_id])
        if self._allow_empty and not label:
            label.append([-1, -1, -1, -1, -1, -1])
        return np.array(label, dtype=np.float64)

    # --- streaming acquisition (youtubebb.py:230-383) -----------------------
    def download(self, videos: Dict[str, Dict[str, list]], workers: int = 8):
        """Fetch + frame-extract every video whose frames are missing; log
        failures to frame_get_errors.txt (youtubebb.py:292-296)."""
        jobs = []
        for vid_key, frames in videos.items():
            v_id = vid_key.split(",")[0]
            missing = [
                f
                for f in frames
                if not os.path.exists(self._image_path.format(v_id, f))
            ]
            if missing:
                jobs.append((self.root, v_id, sorted(missing), self._keep_vids))
        if not jobs:
            return
        errors = []
        with ProcessPoolExecutor(max_workers=workers) as pool:
            for res in pool.map(_download_and_extract, jobs):
                if res is not None:
                    errors.append(res)
        if errors:
            with open(os.path.join(self.root, "frame_get_errors.txt"), "a") as f:
                for v_id, err in errors:
                    f.write(f"{v_id}\t{err}\n")
            logging.warning("%d videos failed to download/extract", len(errors))
