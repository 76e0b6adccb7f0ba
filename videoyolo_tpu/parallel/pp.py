"""Pipeline-parallel (two-stage) serving: backbone and head on different
devices with async microbatch handoff.

Darknet53's stages are heterogeneous (unlike a transformer's uniform
blocks), so the shard_map/ppermute pipelining recipe does not apply; the
TPU-native form for this model family is INTER-OP pipelining at the same
natural boundary the streaming module uses — the route tuple.  Stage A
(device 0) runs the backbone to the three FPN routes; stage B (device 1)
runs the reverse-FPN + heads + decode + NMS (`YOLOv3(use_backbone=False)`,
the reference's yolo3_no_backbone surface, wrappers.py:37-47).  JAX
dispatch is asynchronous, so feeding microbatches back-to-back overlaps
stage A of batch i+1 with stage B of batch i with no scheduler code at
all — the host thread never blocks until results are consumed.

The split is placement-only: stage outputs are bit-identical inputs to the
head, so pipelined results match the single-device apply (locked for f32
and int8 in tests/test_pp.py).  Each stage can itself be a mesh sharding
(pass `devices` as two shardings for pp×dp); the default is the first two
devices.

The reference has no pipeline mode of any kind — its multi-GPU path
replicates the whole model per GPU (train_yolov3.py:596-606).
"""
from __future__ import annotations

from typing import Any, Optional

import jax

from ..models.darknet import Darknet53
from ..models.yolo3 import YOLOv3, postprocess

__all__ = ["PipelinedDetector", "split_backbone_variables"]


def split_backbone_variables(variables):
    """YOLOv3 variables -> (backbone_vars, head_vars) by the top-level
    "backbone" module name.  The backbone subtree applies directly to a
    standalone Darknet53 (same child names); the rest drives
    `model.clone(use_backbone=False)`.  int8 collections (qkernel/wscale/
    xscale) live inside the same subtrees and split identically."""
    backbone, head = {}, {}
    for col, tree in variables.items():
        b = {k: v for k, v in tree.items() if k == "backbone"}
        h = {k: v for k, v in tree.items() if k != "backbone"}
        if b:
            backbone[col] = b["backbone"]
        if h:
            head[col] = h
    return backbone, head


class PipelinedDetector:
    """Two-stage pipelined YOLOv3 serving.

        pipe = PipelinedDetector(model, variables)       # devices 0 and 1
        for dets in pipe.detect(batches):                # stays pipelined
            ids, scores, boxes = [np.asarray(d) for d in dets]

    `detect` yields device arrays WITHOUT forcing them, so consuming the
    iterator keeps both stages busy (stage A computes batch i+1 while
    stage B finishes batch i); force (np.asarray / device_get) only when
    using a result.  `step(images)` is the single-shot form.
    """

    def __init__(
        self,
        model,
        variables,
        devices: Optional[Any] = None,
        nms_thresh: float = 0.45,
        nms_topk: int = 400,
        post_nms: int = 100,
    ):
        assert type(model) is YOLOv3 and model.use_backbone, (
            "pipeline serving splits the plain YOLOv3 at the route boundary"
        )
        assert not model.return_levels, (
            "pipeline serving owns the postprocess tail; build the model "
            "with return_levels=False (the default)"
        )
        if devices is None:
            devs = jax.devices()
            assert len(devs) >= 2, "pipeline parallelism needs >= 2 devices"
            devices = (devs[0], devs[1])
        self.devices = tuple(devices)

        embed_model = Darknet53(
            s2d_stem=model.s2d_stem, quant=model.quant, ds_conv=model.ds_conv,
            dtype=model.dtype,
        )
        head_model = model.clone(use_backbone=False)
        embed_vars, head_vars = split_backbone_variables(variables)
        # committed placements: jit follows its operands, so the two stages
        # compile onto their own devices with a single D2D route transfer
        embed_vars = jax.device_put(embed_vars, self.devices[0])
        head_vars = jax.device_put(head_vars, self.devices[1])

        @jax.jit
        def embed_fn(images):
            return embed_model.apply(embed_vars, images, train=False)

        @jax.jit
        def head_fn(routes):
            boxes, scores = head_model.apply(head_vars, routes, train=False)
            return postprocess(
                boxes, scores, nms_thresh=nms_thresh, nms_topk=nms_topk,
                post_nms=post_nms,
            )

        self._embed = embed_fn
        self._head = head_fn

    def step(self, images):
        """One pipelined pass: (ids, scores, boxes) for a (B, H, W, 3)
        batch.  Semantically identical to the single-device apply."""
        images = jax.device_put(images, self.devices[0])
        routes = self._embed(images)
        routes = jax.device_put(routes, self.devices[1])
        return self._head(routes)

    def detect(self, batches):
        """Yield (ids, scores, boxes) per input batch, keeping one batch in
        flight per stage (async dispatch does the overlapping)."""
        for images in batches:
            yield self.step(images)
