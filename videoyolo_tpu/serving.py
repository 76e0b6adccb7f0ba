"""Portable serving artifacts for the detector (jax.export / StableHLO).

Production deployment path the reference lacked (its closest analog is
hybridize + symbol export mentioned at yolo3.py:56-75 "export to symbol so
we can run it in c++"): the full inference step — forward + decode +
two-stage top-k + NMS — is traced once, serialized as a portable StableHLO
artifact with the weights baked in, and can be reloaded and executed in any
process with a compatible jax runtime (CPU/TPU) WITHOUT the model code or
checkpoint files.

    from videoyolo_tpu.serving import export_detector, load_detector
    export_detector(model, variables, "det.stablehlo", batch_size=8)
    serve = load_detector("det.stablehlo")
    ids, scores, boxes = serve(images)   # (B,S,S,3) -> (B,100,...)

Works for f32/bf16 and the int8 (`quant="static"`/`"fused"`) variants
alike — quantized weights and scales are constants in the artifact — and
for the temporal families via `window` (input (B, k, S, S, 3); per-frame
t_out outputs come back offset-major with leading dim B*k).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

__all__ = ["export_detector", "load_detector", "BucketedDetector"]


def export_detector(
    model,
    variables: Dict[str, Any],
    path: str,
    batch_size: int = 1,
    size: int = 416,
    window: Optional[int] = None,
    input_dtype: Any = None,
    nms_thresh: float = 0.45,
    nms_topk: int = 400,
    post_nms: int = 100,
    platforms: Optional[Tuple[str, ...]] = None,
) -> str:
    """Trace model+postprocess at a fixed (batch_size, size) and write a
    serialized StableHLO artifact with weights baked in.  Returns `path`.

    `window` exports a temporal model: input (B, window, S, S, 3).  Models
    with per-timestep outputs (t_out) fold T into the batch before NMS —
    the artifact then returns leading dim B*window, offset-major per image,
    exactly what detect() post-slices (detect_yolo3.py mult_out handling).

    `platforms` defaults to the current backend; pass e.g. ("tpu", "cpu")
    for an artifact loadable on both."""
    import jax
    import jax.numpy as jnp

    from .models.yolo3 import postprocess_tout

    dtype = input_dtype or jnp.float32

    def fn(images):
        boxes, scores = model.apply(variables, images, train=False)
        dets = postprocess_tout(
            boxes, scores, nms_thresh=nms_thresh, nms_topk=nms_topk, post_nms=post_nms
        )
        if boxes.ndim == 4:  # artifact contract: leading dim B*window, offset-major
            dets = tuple(a.reshape((-1,) + a.shape[2:]) for a in dets)
        return dets

    in_shape = (
        (batch_size, size, size, 3)
        if not window or window <= 1
        else (batch_size, window, size, size, 3)
    )
    x = jax.ShapeDtypeStruct(in_shape, dtype)
    exported = jax.export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(x)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_detector(path: str) -> Callable:
    """Load a serialized detector artifact -> callable(images) ->
    (ids (B,P,1), scores (B,P,1), boxes (B,P,4))."""
    import jax

    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return jax.jit(exported.call)


class BucketedDetector:
    """Dynamic-batching serving wrapper: requests of ANY batch size run
    through a small fixed set of compiled step shapes.

    XLA compiles one executable per input shape, so a serving frontend that
    forwards raw request batches recompiles (20-40 s on TPU) for every new
    size it sees.  This wrapper pads each request up to the smallest bucket
    that fits (chunking requests larger than the biggest bucket), so at most
    `len(buckets)` compilations ever happen — the standard fixed-shape
    serving contract.  Padding is sliced back off before returning; NMS is
    batched per image, so pad rows cannot influence real detections (locked
    by tests/test_serving.py).

    Works with any model/variables pair the one-shot export supports —
    f32/bf16, the int8 variants, and temporal windows ((B, k, S, S, 3)
    inputs batch on dim 0 the same way).  Buckets compile lazily on first
    use; pass `warmup=True` to compile all of them up front (serving wants
    the compile hit at deploy time, not on the first odd-sized request).

        det = BucketedDetector(model, variables)
        ids, scores, boxes = det.detect(images)   # any leading batch size
    """

    def __init__(
        self,
        model,
        variables: Dict[str, Any],
        buckets: Sequence[int] = (1, 2, 4, 8, 16, 32, 64, 128),
        nms_thresh: float = 0.45,
        nms_topk: int = 400,
        post_nms: int = 100,
        warmup_example: Any = None,
    ):
        import jax

        from .models.yolo3 import postprocess_tout

        assert buckets and all(b > 0 for b in buckets)
        self._buckets = sorted(set(int(b) for b in buckets))

        def fn(images):
            boxes, scores = model.apply(variables, images, train=False)
            return postprocess_tout(
                boxes, scores, nms_thresh=nms_thresh, nms_topk=nms_topk,
                post_nms=post_nms,
            )

        self._step = jax.jit(fn)  # one jit; per-shape executables cached
        if warmup_example is not None:
            for b in self._buckets:
                jax.block_until_ready(self._step(self._pad(warmup_example, b)))

    @staticmethod
    def _pad(images, bucket: int):
        import jax.numpy as jnp

        n = images.shape[0]
        if n == bucket:
            return images
        pad = jnp.zeros((bucket - n,) + images.shape[1:], images.dtype)
        return jnp.concatenate([jnp.asarray(images), pad], axis=0)

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if b >= n:
                return b
        return self._buckets[-1]

    def detect(self, images):
        """(B, ...) images, any B >= 1 -> (ids, scores, boxes) with leading
        dim B.  Requests beyond the largest bucket are chunked."""
        import jax.numpy as jnp

        n = images.shape[0]
        assert n >= 1, "empty request"
        biggest = self._buckets[-1]
        outs = []
        i = 0
        while i < n:
            take = min(biggest, n - i)
            b = self._bucket_for(take)
            res = self._step(self._pad(images[i : i + take], b))
            outs.append(tuple(r[:take] for r in res))
            i += take
        if len(outs) == 1:
            return outs[0]
        return tuple(jnp.concatenate(parts, axis=0) for parts in zip(*outs))
