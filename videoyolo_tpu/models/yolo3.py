"""YOLOv3 detector (flax/linen, NHWC, TPU-first).

Capability parity with `/root/reference/models/definitions/yolo/yolo3.py`:
`YOLOOutputV3` (:25, anchor decode at :155-199), `YOLODetectionBlockV3`
(:202), `YOLOV3` (:350, FPN wiring at :476-534), `YOLOV3_noback` (:1686).

TPU-first differences:
* NHWC everywhere; upsample+concat and 1x1 convs stay fused by XLA.
* No oversized "alloc_size" anchor/offset constant params — grids are built
  at trace time for the static feature shape (see ops/anchors.py).
* Eval mode returns compact (boxes (B,N,4), scores (B,N,C)) instead of the
  reference's materialised (B, N*C, 6) per-class tensor; candidate selection
  for NMS is a top-k over the flattened score matrix, which is equivalent to
  `box_nms(topk=...)` over the big tensor but avoids writing N*C rows to HBM.
  A `flatten_detections` helper reproduces the reference tensor for parity
  tests.
* NMS is the fixed-shape batched device kernel in ops/nms.py rather than
  MXNet's native `F.contrib.box_nms` (yolo3.py:525-530).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.anchors import DEFAULT_ANCHORS, DEFAULT_STRIDES, grid_offsets
from ..ops.nms import box_nms
from .darknet import Darknet53
from .layers import ConvBNLeaky, QTensor, quant_concat, upsample2x

FPN_CHANNELS = (512, 256, 128)


class YOLODetectionBlock(nn.Module):
    """5-conv FPN block + 3x3 tip (yolo3.py:202-263, conv_type='2').

    In the fused-int8 modes the tip cell emits real values (`qout=False`):
    its only consumer is the f32 prediction conv, so requantising it would
    cost an int8 round-trip at the most precision-sensitive point."""

    channel: int
    quant: Any = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.channel % 2 == 0
        for _ in range(2):
            x = ConvBNLeaky(self.channel, kernel=1, quant=self.quant, dtype=self.dtype)(x, train)
            x = ConvBNLeaky(self.channel * 2, kernel=3, quant=self.quant, dtype=self.dtype)(x, train)
        route = ConvBNLeaky(self.channel, kernel=1, quant=self.quant, dtype=self.dtype)(x, train)
        tip = ConvBNLeaky(
            self.channel * 2, kernel=3, quant=self.quant, qout=False, dtype=self.dtype
        )(route, train)
        return route, tip


class YOLOOutput(nn.Module):
    """Prediction conv + anchor decode for one FPN level (yolo3.py:25-199).

    Decode (yolo3.py:172-177):
      centers = (sigmoid(raw_xy) + grid_offsets) * stride
      scales  = exp(raw_wh) * anchors
      conf    = sigmoid(obj); class_score = sigmoid(cls) * conf
      bbox    = corner format (cx - w/2, cy - h/2, cx + w/2, cy + h/2)
    """

    num_classes: int
    anchors: Tuple[Tuple[float, float], ...]  # ((w,h),...) for this level
    stride: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, tip, train: bool = False):
        num_anchors = len(self.anchors)
        num_pred = 1 + 4 + self.num_classes
        pred = nn.Conv(
            num_anchors * num_pred, (1, 1), padding="VALID", dtype=self.dtype, name="prediction"
        )(tip)
        return decode_predictions(
            pred, self.anchors, self.stride, self.num_classes, train
        )


def decode_predictions(pred, anchor_pairs, stride, num_classes, train: bool):
    """Anchor decode of a raw prediction map (B, H, W, A*(5+C))
    (yolo3.py:155-199).  Shared by the conv and conv-RNN output heads.

    Returns train: dict of raw heads; eval: (bbox, class_score, conf)."""
    num_anchors = len(anchor_pairs)
    num_pred = 1 + 4 + num_classes
    b, h, w = pred.shape[0], pred.shape[1], pred.shape[2]
    # (B, H*W, A, 5+C); NHWC layout makes this a pure reshape.
    pred = pred.reshape(b, h * w, num_anchors, num_pred).astype(jnp.float32)

    raw_centers = pred[..., 0:2]
    raw_scales = pred[..., 2:4]
    objness = pred[..., 4:5]
    class_pred = pred[..., 5:]

    offsets = jnp.asarray(grid_offsets(h, w))[None, :, None, :]  # (1,HW,1,2)
    anchors = jnp.asarray(np.asarray(anchor_pairs, np.float32))[None, None, :, :]

    centers = (jax.nn.sigmoid(raw_centers) + offsets) * float(stride)
    scales = jnp.exp(raw_scales) * anchors
    half = scales / 2.0
    bbox = jnp.concatenate([centers - half, centers + half], axis=-1)  # (B,HW,A,4)

    if train:
        return {
            "bbox": bbox.reshape(b, -1, 4),
            "raw_centers": raw_centers.reshape(b, -1, 2),
            "raw_scales": raw_scales.reshape(b, -1, 2),
            "objness": objness.reshape(b, -1, 1),
            "class_pred": class_pred.reshape(b, -1, num_classes),
        }

    conf = jax.nn.sigmoid(objness)
    class_score = jax.nn.sigmoid(class_pred) * conf
    return bbox.reshape(b, -1, 4), class_score.reshape(b, -1, num_classes), conf.reshape(
        b, -1, 1
    )


class YOLOv3(nn.Module):
    """Full YOLOv3: backbone routes -> reverse-FPN -> per-level outputs
    (yolo3.py:350-534).

    Call with either an image batch (B, H, W, 3), or — the `YOLOV3_noback`
    capability (yolo3.py:1686) — a tuple of three pre-extracted routes
    (r1, r2, r3) with `use_backbone=False`.

    Returns:
      train=True : dict of concatenated raw heads, deep->shallow order
                   (matches reference concat order, yolo3.py:507-520)
      train=False: (boxes (B, N, 4) pixels, scores (B, N, C)); if `agnostic`,
                   scores is (B, N, 1) objectness confidence (yolo3.py:184-188).
    """

    num_classes: int
    anchors: Any = DEFAULT_ANCHORS  # shallow->deep per level
    strides: Sequence[int] = DEFAULT_STRIDES
    channels: Sequence[int] = FPN_CHANNELS
    agnostic: bool = False
    use_backbone: bool = True
    # rematerialise backbone activations (large-batch train): True/"full"
    # checkpoints the whole backbone; "stem" only the three high-resolution
    # groups.  Measured on v5e at 416px B=64 (r2 forced-timing harness):
    # full remat wins over selective — keeping deep activations costs more
    # HBM than their recompute saves.  Use full for B>32.
    remat: Any = False
    # evaluate the darknet stem on the space-to-depth grid (bit-equivalent,
    # MXU-shaped — darknet.ConvBNLeakyS2D); standard checkpoints refold via
    # models/s2d.refold_stem_s2d(variables, prefix="backbone")
    s2d_stem: bool = False
    # zero-pad the RGB input to 4 channels inside the graph (bit-equivalent,
    # +7.7% full-step detect — see Darknet53.pad_stem); standard checkpoints
    # refold via models/s2d.pad_stem_cin(variables, prefix="backbone")
    pad_stem: bool = False
    # int8 serving path: conv-BN-leaky cells contract int8 on the MXU with
    # dynamically-quantised activations; convert a trained checkpoint via
    # ops/quantize.quantize_detector_variables (never init).  Eval-only.
    quant: Any = False
    # fused-int8 only: how the backbone downsample convs are emitted --
    # "direct" (XLA strided int8 conv, the shipped path), "s2d"
    # (space-to-depth + dense 2x2 packed-tap conv, measured 0.90x e2e), or
    # "pallas" (ops/pallas_conv.py kernel, measured 0.54x e2e) -- both
    # alternatives kept for the record; see ROADMAP.md
    ds_conv: str = "direct"
    # eval only: return per-level (boxes, scores) pairs instead of the
    # concatenated tensors, for postprocess_levels (serving fast path)
    return_levels: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_backbone:
            # jax.checkpoint trades FLOPs for HBM: at 416px the full
            # activation set spills beyond a v5e chip past batch ~32
            if self.remat == "stem":
                routes = Darknet53(
                    name="backbone", remat_stages=3, s2d_stem=self.s2d_stem, pad_stem=self.pad_stem,
                    quant=self.quant, ds_conv=self.ds_conv, dtype=self.dtype,
                )(x, train)
            elif self.remat:
                cls = nn.remat(Darknet53, static_argnums=(2,))
                routes = cls(
                    name="backbone", s2d_stem=self.s2d_stem, pad_stem=self.pad_stem,
                    quant=self.quant, ds_conv=self.ds_conv, dtype=self.dtype
                )(x, train)
            else:
                routes = Darknet53(
                    name="backbone", s2d_stem=self.s2d_stem, pad_stem=self.pad_stem,
                    quant=self.quant, ds_conv=self.ds_conv, dtype=self.dtype
                )(x, train)
        else:
            routes = tuple(x)
        assert len(routes) == 3

        # deep -> shallow, matching yolo3.py:421-430 (anchors/strides reversed)
        anchors_rev = list(self.anchors)[::-1]
        strides_rev = list(self.strides)[::-1]

        level_outs = []
        y = routes[-1]
        for i in range(3):
            route, tip = YOLODetectionBlock(
                self.channels[i], name=f"block{i}", quant=self.quant, dtype=self.dtype
            )(y, train)
            anchor_pairs = tuple(
                (anchors_rev[i][2 * j], anchors_rev[i][2 * j + 1])
                for j in range(len(anchors_rev[i]) // 2)
            )
            out = YOLOOutput(
                self.num_classes,
                anchor_pairs,
                strides_rev[i],
                name=f"output{i}",
                dtype=self.dtype,
            )(tip, train)
            level_outs.append(out)
            if i < 2:
                y = ConvBNLeaky(
                    self.channels[i + 1], kernel=1, name=f"transition{i}",
                    quant=self.quant, dtype=self.dtype,
                )(route, train)
                if isinstance(y, QTensor):
                    # fused-int8: upsample the int8 data (nearest-neighbour
                    # repeat is exact on quantised values) and concat without
                    # leaving int8 (quant_concat rescales onto a common scale)
                    y = QTensor(upsample2x(y.q), y.s)
                    y = quant_concat([y, routes[2 - (i + 1)]], axis=-1)
                else:
                    y = upsample2x(y)
                    y = jnp.concatenate([y, routes[2 - (i + 1)]], axis=-1)

        if train:
            return {
                key: jnp.concatenate([o[key] for o in level_outs], axis=1)
                for key in level_outs[0]
            }

        if self.return_levels:
            # per-level (boxes, scores) pairs for postprocess_levels: the
            # serving fast path that never materialises the concatenated
            # score/box tensors
            if self.agnostic:
                return tuple((o[0], o[2]) for o in level_outs)
            return tuple((o[0], o[1]) for o in level_outs)

        boxes = jnp.concatenate([o[0] for o in level_outs], axis=1)
        class_scores = jnp.concatenate([o[1] for o in level_outs], axis=1)
        conf = jnp.concatenate([o[2] for o in level_outs], axis=1)
        if self.agnostic:
            return boxes, conf
        return boxes, class_scores


def select_topk_candidates(
    boxes: jnp.ndarray, scores: jnp.ndarray, topk: int = 400,
    select_dtype=None, approx_recall: Optional[float] = None,
) -> jnp.ndarray:
    """(B,N,4) boxes + (B,N,C) scores -> (B,K,6) (id, score, x1,y1,x2,y2).

    Equivalent to feeding the reference's (B, N*C, 6) per-class tensor into
    box_nms(topk=K): the same top-K (box, class) pairs survive, but we never
    materialise the N*C rows.

    Two-stage exact selection: XLA's TopK cost grows with the scan width, and
    a flat top-K over N*C (213k lanes at 416px/20cls) measured 34 ms at B=128
    on v5e — more than half the whole backbone forward.  Instead we first
    take the top-K *boxes* by their best class score (width N), then the
    top-K (box,class) pairs within that pool (width K*C).  Exactness: any
    pair in the true top-K has value >= the K-th pair value t, so its box's
    best score is >= t, and any box with best score > t contributes a pair
    above t — hence all true top-K pairs live in the K-box pool (ties at t
    may resolve in a different order, as with any top-k).  Measured: 3.9 ms
    for select+NMS, 1.55x end-to-end detect throughput.

    The score gather over the (B, N, C) matrix is the single most expensive
    op in the tail, so scores and boxes are fetched in ONE combined gather
    (locality: 96-byte rows instead of 80+16).  `select_dtype=jnp.bfloat16`
    runs the score selection (and the reported candidate scores) in bf16 —
    halving the score gather/reduce traffic for ~1.5 ms at B=128/416 on
    v5e — at the cost of bf16-rounded score values; box coordinates stay
    exact in either mode, and the default keeps the exact f32 selection.

    `approx_recall` (None = exact) switches both top-k stages to the TPU
    `lax.approx_max_k` PartialReduce with that per-stage recall target;
    `aggregate_to_topk=True` keeps the output exactly sorted descending,
    so the NMS presorted invariant is unaffected.  Only the *membership*
    of the K-candidate pool is approximate — losses concentrate at the
    pool's low-score boundary, which post_nms=100 discards anyway."""
    b, n, c = scores.shape
    k_pairs = min(topk, n * c)
    k_boxes = min(topk, n)
    if select_dtype is not None:
        scores = scores.astype(select_dtype)

    def _topk(vals, k):
        if approx_recall is not None:
            return jax.lax.approx_max_k(vals, k, recall_target=approx_recall)
        return jax.lax.top_k(vals, k)

    box_best = jnp.max(scores, axis=-1)  # (B,N)
    _, box_idx0 = _topk(box_best, k_boxes)
    if scores.dtype == boxes.dtype:
        cand = jnp.concatenate([scores, boxes], axis=-1)
        pool = jnp.take_along_axis(cand, box_idx0[..., None], axis=1)  # (B,K,C+4)
        pool_scores = pool[..., :c]
        pool_boxes = pool[..., c:]
    else:
        pool_scores = jnp.take_along_axis(scores, box_idx0[..., None], axis=1)
        pool_boxes = jnp.take_along_axis(boxes, box_idx0[..., None], axis=1)
    flat = pool_scores.reshape(b, k_boxes * c)
    top_scores, flat_idx = _topk(flat, min(k_pairs, k_boxes * c))
    box_idx = flat_idx // c
    cls_idx = (flat_idx % c).astype(boxes.dtype)
    top_boxes = jnp.take_along_axis(pool_boxes, box_idx[..., None], axis=1)
    return jnp.concatenate(
        [
            cls_idx[..., None],
            top_scores[..., None].astype(boxes.dtype),
            top_boxes,
        ],
        axis=-1,
    )


def flatten_detections(boxes: jnp.ndarray, scores: jnp.ndarray) -> jnp.ndarray:
    """Materialise the reference per-class detection tensor (B, N*C, 6) in the
    reference's class-major order (yolo3.py:191-199).  Parity-test helper."""
    b, n, c = scores.shape
    ids = jnp.broadcast_to(jnp.arange(c, dtype=boxes.dtype)[None, :, None, None], (b, c, n, 1))
    sc = jnp.transpose(scores, (0, 2, 1))[..., None]  # (B,C,N,1)
    bx = jnp.broadcast_to(boxes[:, None], (b, c, n, 4))
    return jnp.concatenate([ids, sc, bx], axis=-1).reshape(b, c * n, 6)


def _nms_tail(cands, nms_thresh, post_nms, force_suppress):
    if 0 < nms_thresh < 1:
        result = box_nms(
            cands,
            overlap_thresh=nms_thresh,
            valid_thresh=0.01,
            topk=-1,  # candidates are already the top-k...
            presorted=True,  # ...in descending-score order
            post_nms=post_nms,
            force_suppress=force_suppress,
        )
    else:
        result = cands[:, : post_nms if post_nms > 0 else cands.shape[1]]
    return result[..., 0:1], result[..., 1:2], result[..., 2:6]


def postprocess(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    nms_thresh: float = 0.45,
    nms_topk: int = 400,
    post_nms: int = 100,
    force_suppress: bool = False,
    select_dtype=None,
    approx_recall: Optional[float] = None,
):
    """Candidates -> NMS -> (ids, scores, bboxes), the reference's inference
    return contract (yolo3.py:523-534).  ids/scores: (B,P,1); bboxes (B,P,4).
    Set nms_thresh outside (0,1) to disable NMS, and nms_topk <= 0 for NO
    top-k cap — all (box, class) pairs become candidates, materialising the
    full N*C set exactly like the reference's box_nms(topk=-1) (set_nms
    parity, yolo3.py:394-396).
    `select_dtype=jnp.bfloat16` opts into the half-traffic bf16 score
    selection; `approx_recall` into the approx_max_k candidate pool (see
    select_topk_candidates)."""
    topk = nms_topk if nms_topk > 0 else boxes.shape[1] * scores.shape[-1]
    cands = select_topk_candidates(
        boxes, scores, topk=topk, select_dtype=select_dtype,
        approx_recall=approx_recall,
    )
    return _nms_tail(cands, nms_thresh, post_nms, force_suppress)


def postprocess_levels(
    level_outs,
    nms_thresh: float = 0.45,
    nms_topk: int = 400,
    post_nms: int = 100,
    force_suppress: bool = False,
    select_dtype=None,
):
    """Per-FPN-level candidate selection + NMS (serving fast path).

    `level_outs`: sequence of (boxes (B,Ni,4), scores (B,Ni,C)) per level
    (YOLOv3 with `return_levels=True`).  Runs the two-stage top-k on each
    level's tensors BEFORE any concatenation — the (B, sum Ni, C) score
    matrix and its box twin never materialise, which at B=128/416 removes
    the largest memory-bound ops of the detect tail.  Exact: every global
    top-K (box, class) pair lies inside its own level's top-K pool (the
    same threshold argument as select_topk_candidates, applied per level),
    so the merged re-top-K reproduces the single-pass selection modulo
    ties at the K-th value."""
    pools = [
        select_topk_candidates(b, s, topk=nms_topk, select_dtype=select_dtype)
        for b, s in level_outs
    ]
    merged = jnp.concatenate(pools, axis=1)  # (B, levels*K, 6)
    k = min(nms_topk, merged.shape[1])
    _, idx = jax.lax.top_k(merged[..., 1], k)
    cands = jnp.take_along_axis(merged, idx[..., None], axis=1)
    return _nms_tail(cands, nms_thresh, post_nms, force_suppress)


def postprocess_tout(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    nms_thresh: float = 0.45,
    nms_topk: int = 400,
    post_nms: int = 100,
    force_suppress: bool = False,
    select_dtype=None,
    approx_recall: Optional[float] = None,
):
    """`postprocess` that also accepts per-timestep (t_out / mult_out)
    outputs: (B, T, N, ...) boxes/scores fold T into the batch for the
    top-k + NMS (each timestep is an independent image — the reference
    runs box_nms on the folded (B*T, N, 6) tensor the same way,
    yolo3_temporal.py:544-550) and the detections unfold back to
    (B, T, P, ...), offset-major.  Plain (B, N, ...) inputs pass straight
    through to `postprocess`.  The single shared fold for every t_out call
    site (detect CLI, serving/streaming export, bench)."""
    if boxes.ndim == 4:
        b, t = boxes.shape[:2]
        dets = postprocess(
            boxes.reshape((b * t,) + boxes.shape[2:]),
            scores.reshape((b * t,) + scores.shape[2:]),
            nms_thresh=nms_thresh, nms_topk=nms_topk, post_nms=post_nms,
            force_suppress=force_suppress, select_dtype=select_dtype,
            approx_recall=approx_recall,
        )
        return tuple(a.reshape((b, t) + a.shape[1:]) for a in dets)
    return postprocess(
        boxes, scores, nms_thresh=nms_thresh, nms_topk=nms_topk,
        post_nms=post_nms, force_suppress=force_suppress,
        select_dtype=select_dtype, approx_recall=approx_recall,
    )
