"""Video <-> frames conversion (reference `/root/reference/utils/video.py`):
`video_to_frames` chunked multi-worker extraction (:93-147), `extract_frames`
(:34-90), `frames_to_video` (:150-195)."""
from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import List, Optional, Tuple

import cv2


def extract_frames(
    video_path: str,
    frames_dir: str,
    overwrite: bool = False,
    start: int = -1,
    end: int = -1,
    every: int = 1,
) -> int:
    """Extract frames [start, end) (every nth) from a video to
    frames_dir/<video_name>/%010d.jpg.  Returns count saved."""
    video_path = os.path.normpath(video_path)
    frames_dir = os.path.normpath(frames_dir)
    _, video_filename = os.path.split(video_path)

    capture = cv2.VideoCapture(video_path)
    if start < 0:
        start = 0
    if end < 0:
        end = int(capture.get(cv2.CAP_PROP_FRAME_COUNT))

    capture.set(cv2.CAP_PROP_POS_FRAMES, start)
    frame = start
    saved_count = 0
    safety = 0  # consecutive bad-read guard (reference video.py:63-71)
    while frame < end:
        ret, image = capture.read()
        if not ret:
            safety += 1
            if safety > 500:
                break
            frame += 1
            continue
        safety = 0
        if frame % every == 0:
            save_path = os.path.join(frames_dir, video_filename, f"{frame:010d}.jpg")
            if not os.path.exists(save_path) or overwrite:
                os.makedirs(os.path.dirname(save_path), exist_ok=True)
                cv2.imwrite(save_path, image)
                saved_count += 1
        frame += 1
    capture.release()
    return saved_count


def video_to_frames(
    video_path: str,
    frames_dir: str,
    overwrite: bool = False,
    every: int = 1,
    chunk_size: int = 1000,
    max_workers: Optional[int] = None,
) -> Optional[str]:
    """Extract all frames of a video, chunked across a worker pool
    (reference video.py:93-147).  Returns the frames directory."""
    video_path = os.path.normpath(video_path)
    frames_dir = os.path.normpath(frames_dir)
    _, video_filename = os.path.split(video_path)

    capture = cv2.VideoCapture(video_path)
    total = int(capture.get(cv2.CAP_PROP_FRAME_COUNT))
    capture.release()
    if total < 1:
        return None

    if max_workers is None:
        max_workers = min(os.cpu_count() or 1, 8)
    chunks = [
        (start, min(start + chunk_size, total)) for start in range(0, total, chunk_size)
    ]
    if max_workers <= 1 or len(chunks) == 1:
        for start, end in chunks:
            extract_frames(video_path, frames_dir, overwrite, start, end, every)
    else:
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            futures = [
                pool.submit(extract_frames, video_path, frames_dir, overwrite, s, e, every)
                for s, e in chunks
            ]
            for f in futures:
                f.result()
    return os.path.join(frames_dir, video_filename)


def frames_to_video(
    frames_dir: str,
    video_path: str,
    fps: int = 30,
    ext: str = "jpg",
) -> Optional[str]:
    """Assemble ordered frames into an mp4 (reference video.py:150-195)."""
    frames = sorted(
        f for f in os.listdir(frames_dir) if f.lower().endswith(ext.lower())
    )
    if not frames:
        return None
    first = cv2.imread(os.path.join(frames_dir, frames[0]))
    h, w = first.shape[:2]
    os.makedirs(os.path.dirname(video_path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for fname in frames:
        img = cv2.imread(os.path.join(frames_dir, fname))
        if img is not None:
            writer.write(img)
    writer.release()
    return video_path
