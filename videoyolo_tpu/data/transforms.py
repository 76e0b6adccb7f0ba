"""Host-side image/video/bbox augmentations + the YOLO3 transform pipelines.

Capability parity with:
  * `/root/reference/models/transforms/bbox.py` — crop/flip/resize/translate
    and SSD-style `random_crop_with_constraints`, all accepting a single
    (N,4+) array OR a list-per-timestep;
  * `/root/reference/models/transforms/video.py` — video-volume (K,H,W,C)
    `random_expand` and `random_color_distort`;
  * `/root/reference/models/definitions/yolo/transforms.py` — the
    `YOLO3Default{Train,Inference}Transform` and
    `YOLO3Video{Train,Inference}Transform` pipelines (one sampled augmentation
    applied consistently across all k frames, :227-242).

TPU-first difference: the reference transforms also ran the training target
generator in CPU workers (transforms.py:103-106); here target generation is
on-device inside the jitted train step (ops/targets.py), so transforms return
only (image, boxes).  Images come out HWC (or KHWC) float32, normalized.
"""
from __future__ import annotations

import random
from typing import List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np

from ..ops.bbox import np_bbox_iou

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)

Boxes = Union[np.ndarray, List[np.ndarray]]

_INTERPS = {
    0: cv2.INTER_NEAREST,
    1: cv2.INTER_LINEAR,
    2: cv2.INTER_CUBIC,
    3: cv2.INTER_AREA,
    4: cv2.INTER_LANCZOS4,
}


def imresize(img: np.ndarray, width: int, height: int, interp: int = 1) -> np.ndarray:
    """cv2 resize with mxnet-style interp codes (9 = auto area/cubic)."""
    if interp == 9:
        interp = 3 if (img.shape[0] > height or img.shape[1] > width) else 2
    if interp == 10:
        interp = random.randint(0, 4)
    return cv2.resize(img, (width, height), interpolation=_INTERPS[interp])


# --------------------------------------------------------------------------
# bbox transforms (list-per-timestep aware, like models/transforms/bbox.py)
# --------------------------------------------------------------------------

def _listify(bboxs: Boxes):
    if isinstance(bboxs, list):
        return bboxs, False
    return [bboxs], True


def bbox_crop(bboxs: Boxes, crop_box=None, allow_outside_center: bool = True) -> Boxes:
    """Crop boxes to a (x, y, w, h) region (bbox.py:131-198)."""
    boxes_list, single = _listify(bboxs)
    out = []
    for bbox in boxes_list:
        bbox = bbox.copy()
        if crop_box is None or all(c is None for c in crop_box):
            out.append(bbox)
            continue
        l, t, w, h = crop_box
        left = l or 0
        top = t or 0
        right = left + (w if w else np.inf)
        bottom = top + (h if h else np.inf)
        crop_bbox = np.array((left, top, right, bottom))
        if allow_outside_center:
            mask = np.ones(bbox.shape[0], dtype=bool)
        else:
            centers = (bbox[:, :2] + bbox[:, 2:4]) / 2
            mask = np.logical_and(crop_bbox[:2] <= centers, centers < crop_bbox[2:]).all(axis=1)
        bbox[:, :2] = np.maximum(bbox[:, :2], crop_bbox[:2])
        bbox[:, 2:4] = np.minimum(bbox[:, 2:4], crop_bbox[2:4])
        bbox[:, :2] -= crop_bbox[:2]
        bbox[:, 2:4] -= crop_bbox[:2]
        mask = np.logical_and(mask, (bbox[:, :2] < bbox[:, 2:4]).all(axis=1))
        out.append(bbox[mask])
    return out[0] if single else out


def bbox_flip(bboxs: Boxes, size, flip_x: bool = False, flip_y: bool = False) -> Boxes:
    width, height = size
    boxes_list, single = _listify(bboxs)
    out = []
    for bbox in boxes_list:
        bbox = bbox.copy()
        if flip_y:
            ymax = height - bbox[:, 1]
            ymin = height - bbox[:, 3]
            bbox[:, 1], bbox[:, 3] = ymin, ymax
        if flip_x:
            xmax = width - bbox[:, 0]
            xmin = width - bbox[:, 2]
            bbox[:, 0], bbox[:, 2] = xmin, xmax
        out.append(bbox)
    return out[0] if single else out


def bbox_resize(bboxs: Boxes, in_size, out_size) -> Boxes:
    boxes_list, single = _listify(bboxs)
    x_scale = out_size[0] / in_size[0]
    y_scale = out_size[1] / in_size[1]
    out = []
    for bbox in boxes_list:
        bbox = bbox.copy()
        bbox[:, 0] *= x_scale
        bbox[:, 2] *= x_scale
        bbox[:, 1] *= y_scale
        bbox[:, 3] *= y_scale
        out.append(bbox)
    return out[0] if single else out


def bbox_translate(bboxs: Boxes, x_offset=0, y_offset=0) -> Boxes:
    boxes_list, single = _listify(bboxs)
    out = []
    for bbox in boxes_list:
        bbox = bbox.copy()
        bbox[:, :2] += (x_offset, y_offset)
        bbox[:, 2:4] += (x_offset, y_offset)
        out.append(bbox)
    return out[0] if single else out


def random_crop_with_constraints(
    bboxs: Boxes,
    size,
    min_scale: float = 0.3,
    max_scale: float = 1.0,
    max_aspect_ratio: float = 2.0,
    constraints=None,
    max_trial: int = 50,
):
    """SSD-style min-IoU constrained random crop (bbox.py:13-128).

    The reference samples up to `max_trial` crops per constraint one at a
    time in a Python loop (~300 tiny numpy calls per image); here each
    constraint's trials are drawn as one vectorised batch and checked with a
    single IoU matrix — same distribution (the first satisfying trial in
    draw order wins), ~10x less host time per image.
    """
    if constraints is None:
        constraints = ((0.1, None), (0.3, None), (0.5, None), (0.7, None), (0.9, None), (None, 1))
    w, h = size
    boxes_list, single = _listify(bboxs)
    all_boxes = np.concatenate(
        [b[:, :4] for b in boxes_list if len(b)], axis=0
    ) if any(len(b) for b in boxes_list) else np.zeros((0, 4))

    candidates = [(0, 0, w, h)]
    for min_iou, max_iou in constraints:
        min_iou = -np.inf if min_iou is None else min_iou
        max_iou = np.inf if max_iou is None else max_iou
        scale = np.random.uniform(min_scale, max_scale, max_trial)
        aspect_ratio = np.random.uniform(
            np.maximum(1 / max_aspect_ratio, scale * scale),
            np.minimum(max_aspect_ratio, 1 / (scale * scale)),
        )
        crop_h = (h * scale / np.sqrt(aspect_ratio)).astype(np.int64)
        crop_w = (w * scale * np.sqrt(aspect_ratio)).astype(np.int64)
        geom_ok = (crop_h < h) & (crop_w < w) & (crop_h > 0) & (crop_w > 0)
        # random.randrange(n) equivalent, guarded for invalid trials
        span_h = np.maximum(h - crop_h, 1)
        span_w = np.maximum(w - crop_w, 1)
        crop_t = (np.random.uniform(0, 1, max_trial) * span_h).astype(np.int64)
        crop_l = (np.random.uniform(0, 1, max_trial) * span_w).astype(np.int64)

        if len(all_boxes) == 0:
            if geom_ok.any():
                i = int(np.argmax(geom_ok))
                out = boxes_list[0] if single else boxes_list
                return out, (int(crop_l[i]), int(crop_t[i]), int(crop_w[i]), int(crop_h[i]))
            continue

        crop_bb = np.stack(
            [crop_l, crop_t, crop_l + crop_w, crop_t + crop_h], axis=1
        ).astype(np.float64)
        iou = np_bbox_iou(all_boxes, crop_bb)  # (N, T)
        ok = geom_ok & (iou.min(axis=0) >= min_iou) & (iou.max(axis=0) <= max_iou)
        if ok.any():
            i = int(np.argmax(ok))
            candidates.append(
                (int(crop_l[i]), int(crop_t[i]), int(crop_w[i]), int(crop_h[i]))
            )

    while candidates:
        crop_b = candidates.pop(np.random.randint(0, len(candidates)))
        new_bboxs = bbox_crop(
            boxes_list if not single else boxes_list[0], crop_b, allow_outside_center=False
        )
        check = [new_bboxs] if single else new_bboxs
        if any(nb.size < 1 for nb in check):
            continue
        return new_bboxs, tuple(crop_b)
    out = boxes_list[0] if single else boxes_list
    return out, (0, 0, w, h)


# --------------------------------------------------------------------------
# image / video-volume transforms (video.py:12-158)
# --------------------------------------------------------------------------

def random_expand(src: np.ndarray, max_ratio: float = 4, fill=0, keep_ratio: bool = True):
    """Place the image (HWC) or volume (KHWC) on a larger filled canvas.
    Returns (dst, (off_x, off_y, new_w, new_h))."""
    squeeze = src.ndim == 3
    if squeeze:
        src = src[None]
    if max_ratio <= 1:
        out = src[0] if squeeze else src
        return out, (0, 0, src.shape[2], src.shape[1])
    k, h, w, c = src.shape
    ratio_x = random.uniform(1, max_ratio)
    ratio_y = ratio_x if keep_ratio else random.uniform(1, max_ratio)
    oh, ow = int(h * ratio_y), int(w * ratio_x)
    off_y = random.randint(0, oh - h)
    off_x = random.randint(0, ow - w)
    if np.isscalar(fill):
        dst = np.full((k, oh, ow, c), fill, dtype=src.dtype)
    else:
        dst = np.broadcast_to(
            np.asarray(fill, dtype=src.dtype).reshape(1, 1, 1, c), (k, oh, ow, c)
        ).copy()
    dst[:, off_y : off_y + h, off_x : off_x + w, :] = src
    out = dst[0] if squeeze else dst
    return out, (off_x, off_y, ow, oh)


def random_color_distort(
    src: np.ndarray,
    brightness_delta: int = 32,
    contrast_low: float = 0.5,
    contrast_high: float = 1.5,
    saturation_low: float = 0.5,
    saturation_high: float = 1.5,
    hue_delta: int = 18,
) -> np.ndarray:
    """Photometric distortion in [0,255] space; HWC or KHWC (one sampled
    parameter set applies to the whole volume, video.py:68-158)."""
    src = src.astype(np.float32)

    def brightness(x):
        if np.random.uniform() > 0.5:
            x += np.random.uniform(-brightness_delta, brightness_delta)
        return x

    def contrast(x):
        if np.random.uniform() > 0.5:
            x *= np.random.uniform(contrast_low, contrast_high)
        return x

    def saturation(x):
        if np.random.uniform() > 0.5:
            alpha = np.random.uniform(saturation_low, saturation_high)
            gray = (x * np.array([0.299, 0.587, 0.114], np.float32)).sum(-1, keepdims=True)
            x = x * alpha + gray * (1.0 - alpha)
        return x

    def hue(x):
        if np.random.uniform() > 0.5:
            alpha = random.uniform(-hue_delta, hue_delta)
            u = np.cos(alpha * np.pi)
            w_ = np.sin(alpha * np.pi)
            bt = np.array([[1.0, 0.0, 0.0], [0.0, u, -w_], [0.0, w_, u]])
            tyiq = np.array(
                [[0.299, 0.587, 0.114], [0.596, -0.274, -0.321], [0.211, -0.523, 0.311]]
            )
            ityiq = np.array([[1.0, 0.956, 0.621], [1.0, -0.272, -0.647], [1.0, -1.107, 1.705]])
            t = (ityiq @ bt @ tyiq).T.astype(np.float32)
            x = x @ t
        return x

    src = brightness(src)
    if np.random.randint(0, 2):
        src = contrast(src)
        src = saturation(src)
        src = hue(src)
    else:
        src = saturation(src)
        src = hue(src)
        src = contrast(src)
    return src


def to_normalized(img: np.ndarray, mean=MEAN, std=STD) -> np.ndarray:
    """[0,255] HWC/KHWC -> normalized float32 (channel-last, TPU layout)."""
    img = img.astype(np.float32) / 255.0
    return (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


_YIQ = np.array(
    [[0.299, 0.587, 0.114], [0.596, -0.274, -0.321], [0.211, -0.523, 0.311]]
)
_YIQ_INV = np.array(
    [[1.0, 0.956, 0.621], [1.0, -0.272, -0.647], [1.0, -1.107, 1.705]]
)
_LUMA = np.array([0.299, 0.587, 0.114])


def sample_color_matrix(
    brightness_delta: int = 32,
    contrast_low: float = 0.5,
    contrast_high: float = 1.5,
    saturation_low: float = 0.5,
    saturation_high: float = 1.5,
    hue_delta: int = 18,
    mean=MEAN,
    std=STD,
) -> np.ndarray:
    """Sample the reference's photometric distortion (video.py:68-158) AS ONE
    affine color map, composed with input normalization: a (3, 4) matrix M
    with  out = M[:, :3] @ rgb + M[:, 3]  on [0,255] pixels.

    Every step of `random_color_distort` (brightness add, contrast scale,
    saturation = alpha*x + (1-alpha)*luma(x), YIQ hue rotation) is an affine
    map on RGB, and normalization is affine too — so the whole pipeline
    composes exactly into one matrix.  Because affine color maps commute with
    linear resampling (bilinear/cubic/area weights sum to 1), applying M
    AFTER crop/resize/flip — on device, inside the jitted train step — is
    mathematically identical to the reference's distort-first ordering
    (fill pixels from random-expand aside, which get distorted here but not
    in the reference).  Shipping uint8 pixels + M quarters host->device
    traffic and moves the float math onto the TPU.
    """
    A = np.eye(3)
    b = np.zeros(3)

    def compose(A2, b2):
        nonlocal A, b
        A = A2 @ A
        b = A2 @ b + b2

    def brightness():
        if np.random.uniform() > 0.5:
            compose(np.eye(3), np.full(3, np.random.uniform(-brightness_delta, brightness_delta)))

    def contrast():
        if np.random.uniform() > 0.5:
            compose(np.eye(3) * np.random.uniform(contrast_low, contrast_high), np.zeros(3))

    def saturation():
        if np.random.uniform() > 0.5:
            alpha = np.random.uniform(saturation_low, saturation_high)
            compose(alpha * np.eye(3) + (1.0 - alpha) * np.outer(np.ones(3), _LUMA), np.zeros(3))

    def hue():
        if np.random.uniform() > 0.5:
            alpha = random.uniform(-hue_delta, hue_delta)
            u, w_ = np.cos(alpha * np.pi), np.sin(alpha * np.pi)
            bt = np.array([[1.0, 0.0, 0.0], [0.0, u, -w_], [0.0, w_, u]])
            compose(_YIQ_INV @ bt @ _YIQ, np.zeros(3))

    brightness()
    if np.random.randint(0, 2):
        contrast()
        saturation()
        hue()
    else:
        saturation()
        hue()
        contrast()
    # normalize: (x/255 - mean)/std
    compose(np.diag(1.0 / (255.0 * np.asarray(std))), -np.asarray(mean) / np.asarray(std))
    return np.concatenate([A, b[:, None]], axis=1).astype(np.float32)


def apply_color_np(img: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Apply a (3,4) color matrix to HWC/KHWC [0,255] pixels (host path)."""
    flat = img.reshape(-1, 3).astype(np.float32)
    out = flat @ mat[:, :3].T + mat[:, 3]
    return out.reshape(img.shape).astype(np.float32)


def crop_resize_pad(
    img: np.ndarray,
    rect: Tuple[int, int, int, int],
    out_w: int,
    out_h: int,
    interp: int,
    fill,
) -> np.ndarray:
    """Resize crop-window `rect` of `img` to (out_h, out_w), fill-padding the
    part of the window outside the image.

    `rect` = (x0, y0, w, h) in IMAGE coordinates and may extend beyond the
    image (that's how random-expand composes with the crop without ever
    materialising the up-to-16x expanded canvas the reference allocates:
    only the image∩window region is resized and pasted onto a fill canvas).
    """
    x0, y0, cw, ch = rect
    h, w = img.shape[:2]
    out = np.empty((out_h, out_w, 3), img.dtype)
    out[:] = np.asarray(fill, img.dtype)
    sx0, sy0 = max(x0, 0), max(y0, 0)
    sx1, sy1 = min(x0 + cw, w), min(y0 + ch, h)
    if sx1 <= sx0 or sy1 <= sy0:
        return out
    scale_x, scale_y = out_w / cw, out_h / ch
    dx0 = int(round((sx0 - x0) * scale_x))
    dy0 = int(round((sy0 - y0) * scale_y))
    dx1 = min(out_w, int(round((sx1 - x0) * scale_x)))
    dy1 = min(out_h, int(round((sy1 - y0) * scale_y)))
    if dx1 <= dx0 or dy1 <= dy0:
        return out
    sub = cv2.resize(
        img[sy0:sy1, sx0:sx1],
        (dx1 - dx0, dy1 - dy0),
        interpolation=_INTERPS[interp],
    )
    out[dy0:dy1, dx0:dx1] = sub
    return out


# --------------------------------------------------------------------------
# YOLO3 pipelines (yolo/transforms.py)
# --------------------------------------------------------------------------

def _sample_train_geometry(label, w, h, max_expand_ratio: float = 4.0):
    """Expand (p=.5) + constrained crop + flip, labels-only.

    Returns (bbox, rect, flip) where `rect` is the crop window in ORIGINAL
    image coordinates (may extend beyond the image — those parts are
    expand-fill).  No pixel is touched: the expanded canvas the reference
    materialises (video.py:12-65) exists only as coordinate offsets here.
    """
    if np.random.uniform() > 0.5:
        ratio = random.uniform(1, max_expand_ratio)
        ow, oh = int(w * ratio), int(h * ratio)
        off_x = random.randint(0, ow - w)
        off_y = random.randint(0, oh - h)
        bbox = bbox_translate(label, x_offset=off_x, y_offset=off_y)
    else:
        off_x = off_y = 0
        ow, oh = w, h
        bbox = [b.copy() for b in label] if isinstance(label, list) else label.copy()
    bbox, crop = random_crop_with_constraints(bbox, (ow, oh))
    x0, y0, cw, ch = [int(c) for c in crop]
    rect = (x0 - off_x, y0 - off_y, cw, ch)
    return bbox, rect, np.random.uniform() > 0.5


class YOLO3DefaultTrainTransform:
    """Color distort -> random expand (p=.5) -> constrained crop -> resize
    (random interp) -> random flip -> normalize (transforms.py:60-107).

    Rebuilt as: geometry first (fused expand+crop+resize via crop_resize_pad,
    no canvas allocation), then the photometric distortion + normalization as
    one affine color matrix (see sample_color_matrix — exact because color
    maps commute with linear resampling).  `device_color=True` returns
    (uint8 img, bbox, (3,4) matrix) and leaves the float color math to the
    jitted train step on the TPU; False applies the matrix on host.
    """

    def __init__(self, width, height, mean=MEAN, std=STD, mixup=False,
                 device_color: bool = False):
        self._width = width
        self._height = height
        self._mean = mean
        self._std = std
        self._mixup = mixup
        self._device_color = device_color

    def plan(self, label, w, h):
        """Sample the complete augmentation for a (w, h) image WITHOUT
        touching pixels: (bbox_out, rect, flip, interp, color_matrix).

        `bbox_out` is already in output coordinates.  The native train path
        (native/loader.cc vy_load_train_batch) consumes the plan and does
        decode+crop+resize+flip in C++; __call__ consumes the same plan for
        the in-Python pixels, so both paths share one RNG stream and one
        set of semantics.
        """
        bbox, rect, flip = _sample_train_geometry(label, w, h)
        interp = int(np.random.randint(0, 5))
        bbox = bbox_resize(bbox, (rect[2], rect[3]), (self._width, self._height))
        if flip:
            bbox = bbox_flip(bbox, (self._width, self._height), flip_x=True)
        mat = sample_color_matrix(mean=self._mean, std=self._std)
        return bbox, rect, flip, interp, mat

    @property
    def fill(self):
        return [m * 255 for m in self._mean]

    @property
    def out_wh(self):
        return self._width, self._height

    def __call__(self, src, label):
        h, w, _ = src.shape
        bbox, rect, flip, interp, mat = self.plan(label, w, h)
        img = crop_resize_pad(src, rect, self._width, self._height, interp, self.fill)
        if flip:
            img = img[:, ::-1, :]
        img = np.ascontiguousarray(img)
        if self._device_color:
            return img, bbox.astype(np.float32), mat
        return apply_color_np(img, mat), bbox.astype(np.float32)


class YOLO3DefaultInferenceTransform:
    """Resize (interp 9) + normalize (transforms.py:110-140)."""

    def __init__(self, width, height, mean=MEAN, std=STD):
        self._width = width
        self._height = height
        self._mean = mean
        self._std = std

    def __call__(self, src, label, idx=None):
        h, w, _ = src.shape
        img = imresize(src, self._width, self._height, interp=9)
        bbox = bbox_resize(label, (w, h), (self._width, self._height))
        img = to_normalized(img, self._mean, self._std)
        if idx is not None:
            return img, bbox.astype(np.float32), idx
        return img, bbox.astype(np.float32)


class YOLO3VideoTrainTransform:
    """Video version: ONE sampled augmentation applied consistently across
    all k frames (transforms.py:143-294).  src: (K,H,W,C); label: (N,4+) for
    the key frame or list of per-frame labels when `mult_out`."""

    def __init__(self, k, width, height, mean=MEAN, std=STD, mixup=False,
                 device_color: bool = False):
        self._k = k
        self._width = width
        self._height = height
        self._mean = mean
        self._std = std
        self._mixup = mixup
        self._device_color = device_color

    def __call__(self, src, label):
        k, h, w, _ = src.shape
        bbox, rect, flip = _sample_train_geometry(label, w, h)
        interp = np.random.randint(0, 5)
        fill = [m * 255 for m in self._mean]
        imgs = np.stack(
            [crop_resize_pad(f, rect, self._width, self._height, interp, fill) for f in src]
        )
        bbox = bbox_resize(bbox, (rect[2], rect[3]), (self._width, self._height))
        if flip:
            imgs = imgs[:, :, ::-1, :]
            bbox = bbox_flip(bbox, (self._width, self._height), flip_x=True)
        imgs = np.ascontiguousarray(imgs)
        mat = sample_color_matrix(mean=self._mean, std=self._std)
        if isinstance(bbox, list):
            bbox = [b.astype(np.float32) for b in bbox]
        else:
            bbox = bbox.astype(np.float32)
        if self._device_color:
            return imgs, bbox, mat
        return apply_color_np(imgs, mat), bbox


class YOLO3VideoInferenceTransform:
    """Resize + normalize for (K,H,W,C) volumes (transforms.py:297-350)."""

    def __init__(self, width, height, mean=MEAN, std=STD):
        self._width = width
        self._height = height
        self._mean = mean
        self._std = std

    def __call__(self, src, label, idx=None):
        k, h, w, _ = src.shape
        imgs = np.stack([imresize(f, self._width, self._height, interp=9) for f in src])
        bbox = bbox_resize(label, (w, h), (self._width, self._height))
        imgs = to_normalized(imgs, self._mean, self._std)
        if isinstance(bbox, list):
            bbox = [b.astype(np.float32) for b in bbox]
        else:
            bbox = bbox.astype(np.float32)
        if idx is not None:
            return imgs, bbox, idx
        return imgs, bbox


class YOLO3NBTrainTransform:
    """No-backbone (pre-extracted feature) train transform
    (reference yolo/transforms.py:353-425): features pass through untouched —
    they were extracted at a fixed scale — and only the boxes rescale from
    the source image size to the network input size.  Target generation
    happens on-device here, so nothing else is needed."""

    def __init__(self, width, height):
        self._width = width
        self._height = height

    def __call__(self, img, f1, f2, f3, bbox):
        h, w = img.shape[-3], img.shape[-2]
        bbox = bbox_resize(bbox, (w, h), (self._width, self._height))
        return f1, f2, f3, np.asarray(bbox, np.float32)


class YOLO3NBInferenceTransform:
    """No-backbone validation transform (yolo/transforms.py:426-457)."""

    def __init__(self, width, height):
        self._width = width
        self._height = height

    def __call__(self, img, f1, f2, f3, bbox, idx=None):
        h, w = img.shape[-3], img.shape[-2]
        bbox = bbox_resize(bbox, (w, h), (self._width, self._height))
        if idx is not None:
            return f1, f2, f3, np.asarray(bbox, np.float32), idx
        return f1, f2, f3, np.asarray(bbox, np.float32)


class MixupDetection:
    """Dataset wrapper: beta(alpha,beta)-mixed image pairs with the mix ratio
    appended as the label's last column (gluoncv MixupDetection semantics,
    used at train_yolov3.py:227-229 via --mixup).

    Deliberate divergence: the mixed image is rounded back to uint8 (gluoncv
    keeps float32) so the uint8+on-device-color input contract — 4x less
    host->device traffic — holds under mixup too; the rounding is <=0.5
    intensity per pixel, far below the augmentation noise floor."""

    def __init__(self, dataset, mixup_alpha: float = 1.5, mixup_beta: float = 1.5):
        self._dataset = dataset
        self._alpha = mixup_alpha
        self._beta = mixup_beta
        self._enabled = True
        # applied AFTER mixing (gluoncv mixes raw pairs, then the train
        # transform augments the mixed image); set by the loader's per-batch
        # view, never on the wrapped dataset
        self._transform = None

    def set_mixup(self, enabled: bool):
        # reference disables mixup for the final no_mixup_epochs (train_yolov3.py:574-580)
        self._enabled = enabled

    def __len__(self):
        return len(self._dataset)

    def __getattr__(self, item):
        # no dunder delegation (copy/pickle probe __getstate__ etc. on a
        # half-built instance where _dataset isn't set yet)
        if item.startswith("__"):
            raise AttributeError(item)
        try:
            ds = object.__getattribute__(self, "_dataset")
        except AttributeError:
            raise AttributeError(item) from None
        return getattr(ds, item)

    def __getitem__(self, idx):
        img, label = self._mix(idx)
        if self._transform is not None:
            return self._transform(img, label)  # may be (img, label, color)
        return img, label

    def _mix(self, idx):
        img1, label1 = self._dataset[idx][:2]
        label1 = np.hstack((label1, np.full((label1.shape[0], 1), 1.0, label1.dtype)))
        if not self._enabled:
            return img1, label1
        lambd = max(0.0, min(1.0, np.random.beta(self._alpha, self._beta)))
        if lambd >= 1:
            return img1, label1
        idx2 = np.random.randint(0, len(self._dataset))
        img2, label2 = self._dataset[idx2][:2]
        height = max(img1.shape[0], img2.shape[0])
        width = max(img1.shape[1], img2.shape[1])
        mix_img = np.zeros((height, width, 3), np.float32)
        mix_img[: img1.shape[0], : img1.shape[1]] += img1.astype(np.float32) * lambd
        mix_img[: img2.shape[0], : img2.shape[1]] += img2.astype(np.float32) * (1 - lambd)
        label1[:, -1] = lambd
        label2 = np.hstack((label2, np.full((label2.shape[0], 1), 1 - lambd, label2.dtype)))
        return mix_img.astype(img1.dtype), np.vstack((label1, label2))
