"""videoyolo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video object detection framework.

Re-implements the full capability surface of HaydenFaulkner/VideoYOLO
(MXNet/Gluon YOLOv3 + temporal variants + VOC/COCO/DET/VID/YTBB datasets +
VOC/COCO/VID-motion metrics + train/detect/extract CLIs) as a brand-new
TPU-first design:

- NHWC layouts, bf16-friendly compute, static shapes, `jax.jit` everywhere.
- Data parallelism via `jax.sharding.Mesh` + `pjit`/`shard_map`; BN stats and
  gradients ride ICI collectives (`psum`/`pmean`), not a parameter server.
- Fixed-shape batched on-device NMS instead of host box_nms (vmapped XLA
  scan; a bit-equivalent Pallas kernel exists and measured slower — see
  ops/pallas_nms.py); Pallas cost-volume kernel for correlation models.
- On-device vectorised training-target generation (replaces the reference's
  CPU-worker Python scatter loop, `yolo_target.py:104-130`).
"""

__version__ = "0.1.0"
