"""ImageNet-VID video object detection dataset — the core video dataset.

Capability parity with `/root/reference/datasets/imgnetvid.py`
(`ImageNetVidDetection` :17):
  * frames-or-videos samples (:50);
  * `every` nth-frame subsampling (:328-346);
  * temporal **window sampler**: for window [k, step] builds, per frame, a
    list of k frame-ids centred on it and clamped to clip bounds (:480-506);
  * `mult_out` returns per-frame labels for the whole window (:206-223);
  * features-dir mode loads pre-extracted `_F1/_F2/_F3.npy` maps (:143-189);
  * nonempty caching (:348-393); track ids in labels (:547,:557);
  * `motion_ious` ground truth (:113-126) + `generate_motion_ious`
    (:742-786, FGFA-compatible, keyed by sample id).

Images come out as HWC uint8 numpy (single frame) or stacked (K,H,W,C).
"""
from __future__ import annotations

import json
import logging
import os
import xml.etree.ElementTree as et
from typing import Dict, List, Optional

import numpy as np

from .base import DetectionDataset, load_names, read_image


class ImageNetVidDetection(DetectionDataset):
    name = "vid"

    def __init__(
        self,
        root=os.path.join("datasets", "ImageNetVID", "ILSVRC"),
        splits=((2017, "train"),),
        allow_empty: bool = True,
        videos: bool = False,
        transform=None,
        index_map=None,
        every: int = 1,
        frames_per_video: int = 0,
        inference: bool = False,
        window=(1, 1),
        features_dir: Optional[str] = None,
        mult_out: bool = False,
    ):
        super().__init__(transform=transform, inference=inference)
        assert len(splits) == 1, "one split at a time (conflicting image ids otherwise)"
        self.root = os.path.expanduser(root)
        self._splits = list(splits)
        self._videos = videos
        self._window_size = window[0]
        self._window_step = window[1]
        self._mult_out = mult_out
        if videos or self._window_size > 1:
            allow_empty = True
        self._allow_empty = allow_empty
        self._windows: Optional[Dict] = None
        self._features_dir = features_dir

        self._coco_path = os.path.join(
            self.root, "jsons", "_".join(str(s[0]) + s[1] for s in self._splits) + ".json"
        )
        self._annotations_path = os.path.join(self.root, "Annotations", "VID", "{}", "{}", "{}.xml")
        self._image_path = os.path.join(self.root, "Data", "VID", "{}", "{}", "{}.JPEG")
        self.index_map = index_map or dict(zip(self.wn_classes, range(self.num_class)))
        self.samples = self._load_samples()
        self.all_samples = dict(self.samples) if not videos else None
        assert every >= 1
        self._every = int(every)
        self._frames_per_video = int(frames_per_video)
        if every != 1:
            self.samples = self._only_every(self.samples, int(every))
        if self._frames_per_video > 0:
            assert every == 1 and not videos, "frames_per_video excludes every/videos"
            self.samples = self._per_video_count(self.samples, self._frames_per_video)
        self.sample_ids = sorted(self.samples.keys())
        self._labels = {}  # (sample_id, frame_id) -> parsed rows, filled below
        for idx in range(len(self)):
            if self._videos:
                frames = self.samples[self.sample_ids[idx]][2]
                if frames:
                    self._load_label(idx, frame_id=frames[0])
            else:
                self._load_label(idx)
        if not allow_empty:
            self.samples, self.sample_ids = self._remove_empties()

    @property
    def classes(self) -> List[str]:
        return load_names("imagenetvid")

    @property
    def wn_classes(self) -> List[str]:
        return load_names("imagenetvid_wn")

    @property
    def motion_ious(self):
        """Per-sample mean 21-frame track IoUs (imgnetvid.py:113-126)."""
        path = os.path.join(self.root, f"{self._splits[0][1]}_motion_ious.json")
        if not os.path.exists(path):
            generate_motion_ious(self.root, self._splits[0][1])
        with open(path) as f:
            return json.load(f)

    def __len__(self):
        return len(self.sample_ids)

    def get_label(self, sid):
        return self._label_for_sid(sid)[:, :-1]

    def get_sample_ids(self):
        if self._window_size > 1 and self._mult_out:
            return [
                self._windows[sid][: self._window_size] for sid in self.sample_ids
            ]
        return self.sample_ids

    def sample_path(self, idx):
        if self._videos:
            sample = self.samples[self.sample_ids[idx]]
            return os.path.join(sample[0], sample[1])
        if self._mult_out:
            assert self._window_size > 1
            wids = self._windows[self.sample_ids[idx]][: self._window_size]
            return [self._image_path.format(*self.all_samples[sid]) for sid in wids]
        return self._image_path.format(*self.samples[self.sample_ids[idx]])

    def window_paths(self, idx):
        wids = self._windows[self.sample_ids[idx]]
        return [self._image_path.format(*self.all_samples[sid]) for sid in wids]

    def __getitem__(self, idx):
        if self._features_dir is not None:
            return self._get_features_sample(idx)
        if self._videos:
            return self._get_video_sample(idx)
        img_path = self.sample_path(idx) if not self._mult_out else None
        label = self._load_label(idx)[:, :-1]  # strip track id
        if self._window_size > 1:
            imgs, lbls = [], []
            wids = self._windows[self.sample_ids[idx]][: self._window_size]
            for sid in wids:
                img = read_image(self._image_path.format(*self.all_samples[sid]))
                lbl = None
                if self._mult_out:
                    lbl = self._label_for_sid(sid)[:, :-1]
                imgs.append(img)
                lbls.append(lbl)
            img = np.stack(imgs)
            if self._mult_out:
                label = lbls
        else:
            img = read_image(img_path)
        return self._transformed(img, label, idx)

    def _get_features_sample(self, idx):
        """features_dir mode (imgnetvid.py:142-189)."""
        label = self._load_label(idx)[:, :-1]

        def load_feats(img_path):
            file_id = os.path.join(
                img_path.split(os.sep)[-2], os.path.basename(img_path)[:-5]
            )
            return [
                np.load(os.path.join(self._features_dir, f"{file_id}_F{i}.npy"))
                for i in (1, 2, 3)
            ]

        if self._window_size > 1:
            wids = self._windows[self.sample_ids[idx]]
            imgs, f1s, f2s, f3s = [], [], [], []
            for sid in wids:
                p = self._image_path.format(*self.all_samples[sid])
                imgs.append(read_image(p))
                f1, f2, f3 = load_feats(p)
                f1s.append(f1)
                f2s.append(f2)
                f3s.append(f3)
            img = np.stack(imgs)
            f1, f2, f3 = np.stack(f1s), np.stack(f2s), np.stack(f3s)
        else:
            p = self.sample_path(idx)
            img = read_image(p)
            f1, f2, f3 = load_feats(p)
        if self._transform is not None:  # NB transforms (box rescale)
            if self._inference:
                return self._transform(img, f1, f2, f3, label, idx)
            return self._transform(img, f1, f2, f3, label)
        if self._inference:
            return img, f1, f2, f3, label, idx
        return img, f1, f2, f3, label

    def _get_video_sample(self, idx):
        """videos mode: whole clip + per-frame padded labels (imgnetvid.py:249-287)."""
        sample_id = self.sample_ids[idx]
        sample = self.samples[sample_id]
        vid, labels = [], []
        for frame_id in sample[2]:
            img_path = self._image_path.format(sample[0], sample[1], frame_id)
            label = self._label_for_sid(sample_id, frame_id=frame_id)
            img = read_image(img_path)
            if self._transform is not None:
                out = self._transform(img, label)
                if len(out) == 3:
                    raise NotImplementedError(
                        "device_color train transforms are not supported in "
                        "videos mode (per-frame matrices); pass --host_color"
                    )
                img, label = out
            labels.append(self._pad_to_dense(label, 20))
            vid.append(img)
        vid = np.stack(vid)
        labels = np.array(labels)
        if self._inference:
            return vid, labels, idx
        return vid, labels

    def _only_every(self, samples, every):
        """nth-frame subsampling (imgnetvid.py:328-346)."""
        if self._videos:
            for k, v in samples.items():
                frame_ids, frame_nums = [], []
                for i, frame_name in enumerate(v[2]):
                    if int(frame_name) % every == 0:
                        frame_ids.append(frame_name)
                        frame_nums.append(v[3][i])
                samples[k][2] = frame_ids
                samples[k][3] = frame_nums
            return samples
        return {k: v for k, v in samples.items() if int(v[-1]) % every == 0}

    def _per_video_count(self, samples, count):
        """Per-video frame-COUNT subsampling: stride ceil(len/count) within
        each clip (the reference's frames>1 semantics,
        extract_base_features.py:44-47 / imgnetvid frames handling)."""
        import math

        by_clip: Dict[str, list] = {}
        for k in sorted(samples):  # ids follow val.txt order: clip-major
            by_clip.setdefault(samples[k][1], []).append(k)
        keep = set()
        for ks in by_clip.values():
            step = max(1, int(math.ceil(len(ks) / float(count))))
            keep.update(ks[::step])
        return {k: v for k, v in samples.items() if k in keep}

    def _remove_empties(self):
        assert not self._videos, "Can't exclude non-empty samples for videos"
        # the cached id list depends on the subsampling (the filter runs
        # over the subsampled id set); key the cache by it so runs with
        # different --every/frames don't load each other's lists (defaults
        # keep the reference-compatible name, imgnetvid.py:352)
        tag = "" if self._every in (1, None) else f"_every{self._every}"
        if self._frames_per_video:
            tag += f"_fpv{self._frames_per_video}"
        not_empty_file = os.path.join(
            self.root, "ImageSets", "VID",
            self._splits[0][1] + tag + "_nonempty.txt",
        )
        stats_file = os.path.join(
            self.root, "ImageSets", "VID",
            self._splits[0][1] + tag + "_nonempty_stats.txt",
        )
        if os.path.exists(not_empty_file):
            logging.info("Loading splits from: %s", not_empty_file)
            with open(not_empty_file) as f:
                good_sample_ids = [int(line.rstrip()) for line in f if line.strip()]
            stale = [sid for sid in good_sample_ids if sid not in self.samples]
            if stale:
                logging.warning(
                    "%s: %d cached ids are not in the current sample set "
                    "(stale cache from different settings?) — ignoring them; "
                    "delete the file to rebuild", not_empty_file, len(stale),
                )
                good_sample_ids = [
                    sid for sid in good_sample_ids if sid in self.samples
                ]
        else:
            good_sample_ids, removed, n_boxes = [], 0, 0
            for sid in self.sample_ids:
                n = len(
                    [b for b in self._label_for_sid(sid) if b[4] >= 0]
                )
                if n < 1:
                    removed += 1
                else:
                    n_boxes += n
                    good_sample_ids.append(sid)
            msg = (
                f"Removed {removed} out of {len(self.sample_ids)} images, leaving "
                f"{len(good_sample_ids)} with {n_boxes} boxes over {len(self.classes)} classes.\n"
            )
            os.makedirs(os.path.dirname(not_empty_file), exist_ok=True)
            with open(not_empty_file, "w") as f:
                f.writelines(f"{sid}\n" for sid in good_sample_ids)
            with open(stats_file, "w") as f:
                f.write(msg)
        good_samples = {sid: self.samples[sid] for sid in good_sample_ids}
        return good_samples, good_sample_ids

    def _load_samples(self):
        """Split txt -> video dict or frame dict (+ window index)
        (imgnetvid.py:395-506)."""
        ids = []
        for year, split in self._splits:
            lf = os.path.join(self.root, "ImageSets", "VID", split + ".txt")
            logging.info("Loading splits from: %s", lf)
            with open(lf) as f:
                ids_ = [
                    (int(line.split()[1]), self.root, split, line.split()[0])
                    for line in f
                    if line.strip()
                ]
            if year == 2015:
                ids_ = [i for i in ids_ if "ILSVRC2015" in i[-1]]
            ids += ids_

        videos: Dict[str, list] = {}
        for frame_id, _, split, name in ids:
            vid_id = name[:-7]
            frame = name[-6:]
            if vid_id not in videos:
                videos[vid_id] = [split, vid_id, [], []]
            videos[vid_id][2].append(frame)
            videos[vid_id][3].append(frame_id)

        if self._videos:
            return videos

        frames = {}
        for video in videos.values():
            for frame_name, frame_id in zip(video[2], video[3]):
                frames[frame_id] = (video[0], video[1], frame_name)

        if self._window_size > 1:
            self._windows = {}
            for video in videos.values():
                frame_ids = video[3]
                for i in range(len(frame_ids)):
                    window = []
                    half = int(self._window_size / 2.0)
                    for back_i in range(
                        half * self._window_step, self._window_step - 1, -self._window_step
                    ):
                        window.append(frame_ids[max(0, i - back_i)])
                    window.append(frame_ids[i])
                    for fwd_i in range(
                        self._window_step, half * self._window_step + 1, self._window_step
                    ):
                        if len(window) == self._window_size:
                            break  # even window size: drop the last
                        window.append(frame_ids[min(len(frame_ids) - 1, i + fwd_i)])
                    self._windows[frame_ids[i]] = window
        return frames

    def _load_label(self, idx, frame_id=None):
        return self._label_for_sid(self.sample_ids[idx], frame_id)

    def _label_for_sid(self, sample_id, frame_id=None):
        """Label rows for a sample id, from the parse-once cache.

        The reference re-parses the XML on every access and preloads only
        VOC (pascalvoc.py:221-224); at VID scale (1.18M frames) that is a
        real per-epoch tax, so the parse done by the __init__ warm-up loop
        is kept in `self._labels` and every later access is a dict hit.
        """
        key = (sample_id, frame_id)
        cached = self._labels.get(key)
        if cached is not None:
            return cached.copy()
        label = self._parse_label(sample_id, frame_id)
        self._labels[key] = label
        return label.copy()

    def _parse_label(self, sample_id, frame_id=None):
        sample = (self.all_samples or self.samples)[sample_id]
        if self._videos:
            assert frame_id is not None
            anno_path = self._annotations_path.format(sample[0], sample[1], frame_id)
        else:
            anno_path = self._annotations_path.format(*sample)
        if not os.path.exists(anno_path):
            return np.array([[-1, -1, -1, -1, -1, -1]], dtype=np.float64)
        root = et.parse(anno_path).getroot()
        size = root.find("size")
        width = float(size.find("width").text)
        height = float(size.find("height").text)
        if sample_id not in self._im_shapes:
            self._im_shapes[sample_id] = (width, height)
        label = []
        for obj in root.iter("object"):
            cls_name = obj.find("name").text.strip().lower()
            if cls_name not in self.index_map:
                continue
            cls_id = self.index_map[cls_name]
            trk_id = int(obj.find("trackid").text)
            xml_box = obj.find("bndbox")
            xmin = float(xml_box.find("xmin").text)
            ymin = float(xml_box.find("ymin").text)
            xmax = float(xml_box.find("xmax").text)
            ymax = float(xml_box.find("ymax").text)
            xmin, ymin, xmax, ymax = self._validate_box(
                xmin, ymin, xmax, ymax, width, height, anno_path
            )
            label.append([xmin, ymin, xmax, ymax, cls_id, trk_id])
        if self._allow_empty and len(label) < 1:
            label.append([-1, -1, -1, -1, -1, -1])
        return np.array(label) if label else np.zeros((0, 6))

    @staticmethod
    def _validate_box(xmin, ymin, xmax, ymax, width, height, anno_path):
        if not 0 <= xmin < width or not 0 <= ymin < height or not xmin < xmax <= width or not ymin < ymax <= height:
            xmin = min(max(0, xmin), width - 1)
            ymin = min(max(0, ymin), height - 1)
            xmax = min(max(xmin + 1, xmax), width)
            ymax = min(max(ymin + 1, ymax), height)
        return xmin, ymin, xmax, ymax

    @staticmethod
    def _pad_to_dense(labels, maxlen=100):
        x = -np.ones((maxlen, 6))
        for enu, row in enumerate(labels[:maxlen]):
            x[enu, :] += row + 1
        return x

    def image_size(self, sample_id):
        return self._im_shapes[sample_id]

    def _coco_json_path(self):
        return self._coco_path

    def stats(self):
        """Video/frame/box/instance counts (imgnetvid.py:615-695)."""
        cls_boxes = []
        n_boxes = [0] * len(self.classes)
        n_frames = 0
        vids = set()
        vid_instances = [set() for _ in self.classes]
        for idx in range(len(self.sample_ids)):
            sample_id = self.sample_ids[idx]
            vid_id = self.samples[sample_id][1]
            vids.add(vid_id)
            if self._videos:
                for frame_id in self.samples[sample_id][2]:
                    n_frames += 1
                    for box in self._load_label(idx, frame_id):
                        if int(box[4]) < 0:
                            continue
                        n_boxes[int(box[4])] += 1
                        vid_instances[int(box[4])].add(vid_id + str(box[-1]))
            else:
                n_frames += 1
                for box in self._load_label(idx):
                    if int(box[4]) < 0:
                        continue
                    n_boxes[int(box[4])] += 1
                    vid_instances[int(box[4])].add(vid_id + str(box[-1]))
        n_instances = [len(vi) for vi in vid_instances]
        out = (
            f"{'Split:': <10} {', '.join(str(s[0]) + s[1] for s in self._splits)}\n"
            f"{'Videos:': <10} {len(vids)}\n"
            f"{'Frames:': <10} {n_frames}\n"
            f"{'Boxes:': <10} {sum(n_boxes)}\n"
            f"{'Instances:': <10} {sum(n_instances)}\n"
            f"{'Classes:': <10} {len(self.classes)}\n"
        ) + "-" * 35 + "\n"
        for i, (nb, ni) in enumerate(zip(n_boxes, n_instances)):
            out += f"{i: <3} {self.wn_classes[i]: <10} {self.classes[i]: <15} {nb: <10} {ni}\n"
            cls_boxes.append([i, self.wn_classes[i], self.classes[i], nb, ni])
        out += "-" * 35 + "\n"
        return out, cls_boxes


def _single_iou(bb, bbgt):
    """+1-convention IoU used by the FGFA motion-iou gt (imgnetvid.py:718-739)."""
    ov = 0.0
    iw = np.min((bb[2], bbgt[2])) - np.max((bb[0], bbgt[0])) + 1
    ih = np.min((bb[3], bbgt[3])) - np.max((bb[1], bbgt[1])) + 1
    if iw > 0 and ih > 0:
        intersect = iw * ih
        ua = (
            (bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
            + (bbgt[2] - bbgt[0] + 1.0) * (bbgt[3] - bbgt[1] + 1.0)
            - intersect
        )
        ov = intersect / ua
    return ov


def generate_motion_ious(root, split):
    """FGFA-compatible motion IoUs keyed by sample id (imgnetvid.py:742-786):
    for every box with a track id, the mean IoU against the same track in
    frames +-10; one list per frame."""
    dataset = ImageNetVidDetection(
        root=root, splits=[(2017, split)], allow_empty=True, videos=True
    )
    all_ious = {}
    sample_id = 1
    for idx in range(len(dataset)):
        _, video = dataset[idx][:2]
        for frame in range(len(video)):
            frame_ious = []
            for box_idx in range(len(video[frame])):
                trk_id = video[frame][box_idx][5]
                if trk_id > -1:
                    ious = []
                    for i in range(-10, 11):
                        frame_c = frame + i
                        if 0 <= frame_c < len(video) and i != 0:
                            for c_box_idx in range(len(video[frame_c])):
                                if video[frame_c][c_box_idx][5] == trk_id:
                                    ious.append(
                                        _single_iou(
                                            video[frame][box_idx], video[frame_c][c_box_idx]
                                        )
                                    )
                                    break
                    frame_ious.append(np.mean(ious) if ious else 0.0)
            all_ious[sample_id] = frame_ious if frame_ious else [0.0]
            sample_id += 1
    out = os.path.join(root, f"{split}_motion_ious.json")
    with open(out, "w") as f:
        json.dump(all_ious, f)
    return out
