"""Detection / evaluation CLI.

Capability parity with `/root/reference/detect_yolo3.py` (flag surface
:41-118, pipeline: detect :198 -> save_predictions :275 -> load_predictions
:333 -> visualise :537 -> evaluate :659), re-built on the TPU-native stack:
the device program is one jitted forward+decode+NMS step; predictions are
cached to the same `pred/*.txt` format (`img_path,cls,score,x1,y1,x2,y2`,
boxes normalized by data_shape) so cached runs skip the device entirely.
"""
from __future__ import annotations

import itertools
import logging
import os

import numpy as np
from absl import app, flags

logging.basicConfig(level=logging.INFO)

FLAGS = flags.FLAGS

flags.DEFINE_string("model_path", "", "Path to the detection model params to use ('' = random init)")
flags.DEFINE_string("network", "darknet53", "Base network name: darknet53")
flags.DEFINE_list("dataset", ["voc"], "Dataset or .jpg image or .mp4 video or .txt image/video list.")
flags.DEFINE_string("dataset_root", "datasets", "Root directory holding the datasets")
flags.DEFINE_string("trained_on", "", "Dataset the model was trained on.")
flags.DEFINE_string("save_prefix", "0001", "Model save prefix.")
flags.DEFINE_string("save_dir", "results", "Save directory to save images.")
flags.DEFINE_list("metrics", ["voc"], "List of metrics separated by , eg. voc,coco")
flags.DEFINE_integer("batch_size", 1, "Batch size for detection.")
flags.DEFINE_integer("data_shape", 416, "Input data shape.")
flags.DEFINE_float("detection_threshold", 0.5, "Display threshold on detections.")
flags.DEFINE_integer("max_do", -1, "Maximum samples to detect on. -1 is all.")
flags.DEFINE_float("every", 25, "do every this many frames")
flags.DEFINE_list("window", [1, 1], "Temporal window size of frames and stride.")
flags.DEFINE_string("k_join_type", None, "way to fuse k type, either max, mean, cat.")
flags.DEFINE_string("k_join_pos", None, "position of k fuse, either early or late.")
flags.DEFINE_string("block_conv_type", "2", "conv type for YOLO blocks: 2, 3 or 21.")
flags.DEFINE_string("rnn_pos", None, "position of RNN: late or out")
flags.DEFINE_string("corr_pos", None, "position of correlation features: early or late")
flags.DEFINE_integer("corr_d", 4, "The d value for the correlation filter.")
flags.DEFINE_string("motion_stream", None, "Add a motion stream? flownet or r21d.")
flags.DEFINE_string("stream_gating", None, "Gating on appearance stream: add or mul.")
flags.DEFINE_list("conv_types", [2, 2, 2, 2, 2, 2], "Darknet conv types per layer.")
flags.DEFINE_string("h_join_type", None, "Hierarchical darknet join: max or conv.")
flags.DEFINE_list("hier", [1, 1, 1, 1, 1], "Hierarchical factors.")
flags.DEFINE_boolean("mult_out", False, "One or multiple outs for timeseries data")
flags.DEFINE_boolean("temp", False, "Use new temporal model")
flags.DEFINE_boolean("visualise", False, "Display/save the detections?")
flags.DEFINE_boolean("per_frame_metric", False, "Save a per-frame metric to prediction files?")
flags.DEFINE_string("worst_video_path", None, "Path to save video of worst case detections.")
flags.DEFINE_boolean("display_gt", True, "Display the ground truth boxes on the images?")
flags.DEFINE_boolean("model_agnostic", False, "make the model class agnostic?")
flags.DEFINE_boolean(
    "s2d_stem", False,
    "Evaluate the darknet stem on the space-to-depth grid (bit-equivalent, "
    "faster on TPU); standard checkpoints are refolded on load.",
)
flags.DEFINE_boolean(
    "pad_stem", False,
    "Zero-pad the RGB input to 4 channels inside the graph (bit-equivalent, "
    "~8% faster detect on TPU; 2D darknet53 model only); standard "
    "checkpoints are refolded on load.",
)
flags.DEFINE_float(
    "approx_topk_recall", 0.0,
    "If > 0, run the NMS candidate top-k via the TPU approx_max_k reduce "
    "with this per-stage recall target (e.g. 0.95) — output stays sorted; "
    "only the membership of the 400-candidate pool is approximate "
    "(measured +0.5 percent detect fps at 416/B=128; 0 = exact selection, "
    "the default).",
)
flags.DEFINE_boolean("metric_agnostic", False, "make the metric class agnostic?")
flags.DEFINE_list("gpus", [0], "Kept for reference CLI parity; devices come from JAX.")
flags.DEFINE_string(
    "export_model",
    "",
    "Write a portable serving artifact (StableHLO, weights baked in — "
    "videoyolo_tpu/serving.py) to this path and exit instead of detecting; "
    "composes with --quantize and the temporal families (--window k: the "
    "artifact takes (B,k,S,S,3); t_out outputs fold to leading dim B*k).",
)
flags.DEFINE_enum(
    "quantize",
    "",
    ["", "int8", "int8_static", "int8_dynamic"],
    "int8 serving path.  Eligible (ops/quantize.assert_quantizable): plain "
    "yolo3_darknet53; the full t=5 YOLOv3Temporal family (--temp / "
    "--mult_out, corr pyramid and funnel incl.); and any non-RNN windowed "
    "YOLOv3T config — built-in 2D/3D/2+1D backbones, the no-backbone "
    "feature-input head, and the two-stream family (darknet side int8, "
    "motion stream bf16).  'int8' calibrates on "
    "the first batches and uses the fastest eligible pipeline (fused "
    "end-to-end for plain YOLOv3, static scales otherwise); 'int8_static' "
    "forces per-cell static scales; 'int8_dynamic' needs no calibration "
    "(per-image scales).",
)
flags.DEFINE_boolean(
    "skip_existing", False,
    "Resume an interrupted detect sweep: samples whose pred/*.txt cache "
    "files already exist (every window offset, for mult_out) are neither "
    "decoded nor re-detected; the final predictions reload from the "
    "completed cache.  (Beyond the reference, whose cache is all-or-"
    "nothing: one missing file re-runs the whole sweep.)  Not compatible "
    "with --stream (the ring buffer needs consecutive frames).",
)
flags.DEFINE_boolean(
    "stream", False,
    "Streaming sliding-window detection (videoyolo_tpu/streaming.py, "
    "--window k > 1, any YOLOv3T config incl. conv-RNN): frames run in "
    "order with per-frame "
    "backbone routes cached in a device ring buffer — ONE backbone pass per "
    "detection instead of k.  Works on ad-hoc inputs (.mp4/.jpg dirs/.txt "
    "lists; pass --every 1 to keep every video frame); each frame's "
    "detections use the window ending at that frame, streams reset per "
    "video.  Composes with --quantize and --export_model (stateful "
    "streaming artifact).  Covers YOLOv3T and the YOLOv3Temporal t=5 "
    "family (--temp / --mult_out: the corr-pyramid and funnel paths cache "
    "stage1 features; stages 2/3 re-run on the window).",
)
flags.DEFINE_enum(
    "stream_anchor", "trail", ["trail", "center"],
    "--stream window anchoring: 'trail' = detections for the window ending "
    "at each frame (zero latency, live serving); 'center' = detections for "
    "the window centered on each frame with clip-bound clamping — "
    "bit-identical to the windowed detect path's per-frame predictions "
    "(reference window sampler) at 1/k backbone cost, emitted k//2 frames "
    "late.",
)
flags.DEFINE_integer(
    "mesh_spatial", 1,
    "Shard the image H axis this many ways across the device mesh on top of "
    "the batch split (GSPMD spatial partitioning with automatic halo "
    "exchange, parallel/mesh.py) — latency over throughput when chips "
    "outnumber the batch.  Must divide the device count; needs "
    "data_shape/32 >= 3 (parallel/mesh.assert_spatial_safe).",
)
flags.DEFINE_integer("num_workers", 8, "Data loading workers.")
flags.DEFINE_boolean("new_model", False, "Use features Yolo (new) or stages Yolo (old)?")
flags.DEFINE_integer("offset", 0, "If mult_out, the offset to test: -2..2")
flags.DEFINE_integer("hier_level", 10, "Hierarchical level cutoff for dets and eval")


def get_dataset(dataset_name):
    """Dataset flag -> (dataset, inference dataset); mirrors reference
    get_dataset (detect_yolo3.py:121-170)."""
    from videoyolo_tpu.data import DetectSet, VOCDetection

    ds = dataset_name[0] if isinstance(dataset_name, (list, tuple)) else dataset_name
    if ds == "voc":
        return VOCDetection(
            root=os.path.join(FLAGS.dataset_root, "PascalVOC", "VOCdevkit"),
            splits=[(2007, "test")],
            inference=True,
        )
    if ds == "coco":
        from videoyolo_tpu.data.mscoco import COCODetection

        return COCODetection(
            root=os.path.join(FLAGS.dataset_root, "MSCoco"),
            splits=["instances_val2017"],
            allow_empty=True,
            inference=True,
        )
    if ds == "det":
        from videoyolo_tpu.data.imgnetdet import ImageNetDetection

        return ImageNetDetection(
            root=os.path.join(FLAGS.dataset_root, "ImageNetDET", "ILSVRC"),
            splits=["val"],
            allow_empty=True,
            inference=True,
        )
    if ds == "vid":
        from videoyolo_tpu.data.imgnetvid import ImageNetVidDetection

        # --stream builds its own sliding windows from the device ring
        # buffer: the dataset must yield SINGLE frames in clip order, not
        # pre-stacked (k,H,W,3) windows (the model still takes --window k)
        window = [1, 1] if FLAGS.stream else [int(w) for w in FLAGS.window]
        return ImageNetVidDetection(
            root=os.path.join(FLAGS.dataset_root, "ImageNetVID", "ILSVRC"),
            splits=[(2017, "val")],
            every=int(FLAGS.every),
            window=window,
            mult_out=FLAGS.mult_out and not FLAGS.stream,
            inference=True,
        )
    if ds == "yt":
        from videoyolo_tpu.data.youtubebb import YouTubeBBDetection

        window = [1, 1] if FLAGS.stream else [int(w) for w in FLAGS.window]
        return YouTubeBBDetection(
            root=os.path.join(FLAGS.dataset_root, "YouTubeBB"),
            splits=["val"],
            frames=FLAGS.every,
            window=window,
            inference=True,
        )
    if ds == "comb":
        from videoyolo_tpu.data.combined import CombinedDetection
        from videoyolo_tpu.data.imgnetdet import ImageNetDetection
        from videoyolo_tpu.data.imgnetvid import ImageNetVidDetection
        from videoyolo_tpu.data.mscoco import COCODetection
        from videoyolo_tpu.data.pascalvoc import VOCDetection

        subsets = [
            VOCDetection(
                root=os.path.join(FLAGS.dataset_root, "PascalVOC", "VOCdevkit"),
                splits=[(2007, "test")],
                inference=True,
            ),
            COCODetection(
                root=os.path.join(FLAGS.dataset_root, "MSCoco"),
                splits=["instances_val2017"],
                allow_empty=True,
                inference=True,
            ),
            ImageNetDetection(
                root=os.path.join(FLAGS.dataset_root, "ImageNetDET", "ILSVRC"),
                splits=["val"],
                allow_empty=True,
                inference=True,
            ),
            ImageNetVidDetection(
                root=os.path.join(FLAGS.dataset_root, "ImageNetVID", "ILSVRC"),
                splits=[(2017, "val")],
                every=int(FLAGS.every),
                inference=True,
            ),
        ]
        return CombinedDetection(
            subsets,
            class_tree=True,
            validation=True,
            inference=True,
            hier_level=FLAGS.hier_level,
        )
    # ad-hoc files: images / videos / lists
    files = dataset_name if isinstance(dataset_name, (list, tuple)) else [dataset_name]
    img_files = []
    for f in files:
        ext = os.path.splitext(f)[1].lower()
        if ext in (".jpg", ".jpeg", ".png"):
            img_files.append(f)
        elif ext in (".mp4", ".avi", ".mov"):
            from videoyolo_tpu.utils.video import video_to_frames

            frames_dir = video_to_frames(
                f, os.path.join(FLAGS.save_dir, "frames"), every=int(FLAGS.every)
            )
            img_files += [
                os.path.join(frames_dir, p) for p in sorted(os.listdir(frames_dir))
            ]
        elif ext == ".txt":
            with open(f) as fh:
                img_files += [line.strip() for line in fh if line.strip()]
        elif os.path.isdir(f):
            img_files += [
                os.path.join(f, p)
                for p in sorted(os.listdir(f))
                if os.path.splitext(p)[1].lower() in (".jpg", ".jpeg", ".png")
            ]
        else:
            raise ValueError(f"unrecognised dataset input: {f}")
    return DetectSet(img_files)


def get_net_and_params(num_classes):
    import jax
    import jax.numpy as jnp

    from videoyolo_tpu.models.factory import YoloConfig, build_model
    from videoyolo_tpu.train.checkpoint import load_detector_params

    window = [int(w) for w in FLAGS.window]
    k = window[0] if window[0] > 1 else None
    cfg = YoloConfig(
        num_classes=num_classes,
        k=k,
        k_join_type=FLAGS.k_join_type,
        k_join_pos=FLAGS.k_join_pos,
        block_conv_type=FLAGS.block_conv_type,
        rnn_pos=FLAGS.rnn_pos,
        corr_pos=FLAGS.corr_pos,
        # corr is enabled by corr_pos (and for the temp model too — the
        # reference's always-on corr_d default is a train/detect mismatch)
        corr_d=FLAGS.corr_d if FLAGS.corr_pos else None,
        motion_stream=FLAGS.motion_stream,
        add_type=FLAGS.stream_gating,
        agnostic=FLAGS.model_agnostic,
        new_model=FLAGS.new_model,
        hierarchical=tuple(int(h) for h in FLAGS.hier),
        h_join_type=FLAGS.h_join_type,
        temporal=FLAGS.temp,
        t_out=FLAGS.mult_out,
        conv_types=tuple(int(c) for c in FLAGS.conv_types),
        s2d_stem=FLAGS.s2d_stem,
        pad_stem=FLAGS.pad_stem,
    )
    model = build_model(cfg)
    shape = (
        (1, FLAGS.data_shape, FLAGS.data_shape, 3)
        if k is None
        else (1, k, FLAGS.data_shape, FLAGS.data_shape, 3)
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(shape, jnp.float32), train=False)
    if FLAGS.model_path and os.path.exists(FLAGS.model_path):
        if FLAGS.s2d_stem and getattr(model, "s2d_stem", False):
            # checkpoints are stored in the standard layout: load against a
            # standard-model template, then refold the stem kernels
            from videoyolo_tpu.models.s2d import refold_stem_s2d
            import dataclasses

            std = build_model(dataclasses.replace(cfg, s2d_stem=False))
            std_vars = std.init(
                jax.random.PRNGKey(0), jnp.zeros(shape, jnp.float32), train=False
            )
            variables = refold_stem_s2d(
                load_detector_params(FLAGS.model_path, dict(std_vars)), prefix="backbone"
            )
        elif FLAGS.pad_stem and getattr(model, "pad_stem", False):
            # same refold protocol: checkpoints are stored in the standard
            # (3-channel stem) layout
            from videoyolo_tpu.models.s2d import pad_stem_cin
            import dataclasses

            std = build_model(dataclasses.replace(cfg, pad_stem=False))
            std_vars = std.init(
                jax.random.PRNGKey(0), jnp.zeros(shape, jnp.float32), train=False
            )
            variables = pad_stem_cin(
                load_detector_params(FLAGS.model_path, dict(std_vars)), prefix="backbone"
            )
        else:
            variables = load_detector_params(FLAGS.model_path, dict(variables))
        logging.info("Loaded params from %s", FLAGS.model_path)
    elif FLAGS.model_path:
        raise FileNotFoundError(FLAGS.model_path)
    else:
        logging.warning("No model_path given — using randomly initialised params")
    return model, variables


def quantize_for_serving(model, variables, loader, calib_batches=None):
    """--quantize: convert the loaded f32 detector to the int8 serving path
    (ops/quantize.py).  'int8' picks the fastest eligible pipeline: the
    fused int8-end-to-end path for plain YOLOv3 (activations stay int8
    across cells/joins/concats), falling back to per-cell static scales for
    the temporal family; 'int8_static'/'int8_dynamic' force those modes.
    `calib_batches` overrides the default draw of the first two loader
    batches (--stream stacks frame batches into windows first)."""
    import itertools

    from videoyolo_tpu.models.yolo3 import YOLOv3
    from videoyolo_tpu.ops.quantize import (
        assert_quantizable,
        quantize_detector_variables,
        quantize_fused,
        quantize_static,
        replace_quant,
    )

    assert_quantizable(model)
    if FLAGS.quantize == "int8_dynamic":
        logging.info("Quantized to int8 (dynamic activation scales)")
        return replace_quant(model, True), quantize_detector_variables(variables)
    calib = (
        calib_batches
        if calib_batches is not None
        else [b["image"] for b in itertools.islice(iter(loader), 2)]
    )
    if FLAGS.quantize == "int8" and type(model) is YOLOv3:
        qmodel, qvars = quantize_fused(model, variables, calib)
        logging.info(
            "Quantized to int8 (fused end-to-end pipeline, %d calibration "
            "batches)", len(calib)
        )
        return qmodel, qvars
    qmodel, qvars = quantize_static(model, variables, calib)
    logging.info(
        "Quantized to int8 (static scales calibrated on %d batches)", len(calib)
    )
    return qmodel, qvars


def _collect_boxes(out_dict, file, ids_i, sc_i, bb_i, shape):
    """Device detections -> the normalized [[cls, score, x1..y2]] entry
    format load/save_predictions use (reference detect_yolo3.py:247-262)."""
    valid = np.where(ids_i.flat >= 0)[0]
    box = bb_i[valid, :] / shape  # normalise
    cls = ids_i.flat[valid].astype(int)
    score = sc_i.flat[valid]
    out_dict.setdefault(file, [])
    for c, s, b in zip(cls, score, box):
        out_dict[file].append([int(c), float(s)] + [float(v) for v in b])


def detect_stream(model, variables, dataset, loader, max_do=-1):
    """Streaming sliding-window detection: the loader yields SINGLE frames in
    dataset order; videoyolo_tpu/streaming.py caches per-frame backbone
    features in a device ring buffer so each frame pays one backbone pass
    instead of window-k (the reference's window loop re-runs the full window
    per detection, detect_yolo3.py:198-273 — no streaming equivalent).

    --stream_anchor trail  : each frame gets the window ENDING at it (zero
    latency; stream head left-padded with the first frame).
    --stream_anchor center : each frame gets the window CENTERED on it,
    clamped at clip bounds — bit-identical to the windowed detect path's
    per-frame predictions (the reference window sampler, imgnetvid.py:
    480-506) at 1/k the backbone cost; emission lags k//2 frames and the
    clip tail is flushed by re-feeding the last frame.

    Streams reset at video boundaries (frame parent directory).  Per-
    timestep (t_out / --mult_out) models emit the window's T offsets each
    step; what gets collected is the anchor frame's own offset (the last
    for 'trail', the middle for 'center')."""
    from videoyolo_tpu.data.prefetch import device_prefetch
    from videoyolo_tpu.streaming import StreamingDetector, stream_frames

    shape = FLAGS.data_shape
    stream = StreamingDetector(model, variables)
    t_off = -1 if FLAGS.stream_anchor == "trail" else stream.k // 2
    boxes_out = {}
    if max_do < 0:
        max_do = len(dataset)
    done = 0

    def path_frame_pairs():
        for batch in device_prefetch(iter(loader), size=2, keys=("image",)):
            assert batch["image"].shape[0] == 1, "streaming runs batch_size=1"
            yield dataset.sample_path(int(batch["idx"][0])), batch["image"]

    for _, group in itertools.groupby(
        path_frame_pairs(), key=lambda pf: os.path.dirname(pf[0])
    ):
        if done >= max_do:
            break
        paths = []

        def frames():
            for p, img in group:
                paths.append(p)
                yield img

        for m, (ids, sc, bb) in stream_frames(
            stream, frames(), anchor=FLAGS.stream_anchor
        ):
            if done >= max_do:
                break
            ids_i, sc_i, bb_i = (
                np.asarray(ids)[0], np.asarray(sc)[0], np.asarray(bb)[0]
            )
            if ids_i.ndim == 3:  # t_out (T, P, 1): the anchor frame's offset
                ids_i, sc_i, bb_i = ids_i[t_off], sc_i[t_off], bb_i[t_off]
            _collect_boxes(
                boxes_out, paths[m], ids_i, sc_i, bb_i.clip(0, shape), shape,
            )
            done += 1
    return boxes_out


def detect(model, variables, dataset, loader, max_do=-1):
    """Run the jitted device step over the loader; returns {img_path: [[cls,
    score, x1..y2 normalized]]}, or a list of 5 such dicts (one per window
    offset) when mult_out (reference detect_yolo3.py:198-273).

    Multi-chip: the batch axis is sharded over every device on the mesh —
    the TPU-native form of the reference's per-GPU `split_and_load` detect
    loop (reference detect_yolo3.py:211-222); tail batches are padded to a
    shardable multiple and the padding dropped on the host side (the
    reference's `even_split=False`).  --mesh_spatial k additionally shards
    the image H axis k-way (GSPMD spatial partitioning, parallel/mesh.py) —
    latency over throughput when chips outnumber the batch."""
    import jax

    from videoyolo_tpu.models.yolo3 import postprocess_tout
    from videoyolo_tpu.parallel.mesh import (
        assert_spatial_safe,
        make_2d_mesh,
        replicated_sharding,
        shard_batch,
    )

    shape = FLAGS.data_shape
    assert_spatial_safe(shape, FLAGS.mesh_spatial)
    mesh = make_2d_mesh(spatial=FLAGS.mesh_spatial)
    n_dev = len(mesh.devices.flat)
    n_data = n_dev // FLAGS.mesh_spatial
    if n_dev > 1:
        variables = jax.device_put(variables, replicated_sharding(mesh))

    @jax.jit
    def step(images):
        boxes, scores = model.apply(variables, images, train=False)
        # mult_out (B, T, N, ...) folds T into the batch for NMS and unfolds
        ids, sc, bb = postprocess_tout(
            boxes, scores, nms_thresh=0.45, nms_topk=400,
            approx_recall=FLAGS.approx_topk_recall or None,
        )
        return ids, sc, bb.clip(0, shape)

    def collect(out_dict, file, ids_i, sc_i, bb_i):
        _collect_boxes(out_dict, file, ids_i, sc_i, bb_i, shape)

    def _stage(batch):
        # pad the tail batch to a shardable multiple, shard, ship (runs in
        # the prefetch thread so transfers overlap the device step)
        imgs = batch["image"]
        n = imgs.shape[0]
        if n_dev > 1:
            pad = (-n) % n_data
            if pad:
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
            with mesh:
                imgs = shard_batch({"image": imgs}, mesh)["image"]
        else:
            imgs = jax.device_put(imgs)
        return imgs, n, batch["idx"]

    boxes_out = [dict() for _ in range(5)] if FLAGS.mult_out else {}
    if max_do < 0:
        max_do = len(dataset)
    done = 0
    # overlap the host->device image copy with the device step
    from videoyolo_tpu.data.prefetch import device_prefetch

    for images, n_real, batch_idx in device_prefetch(
        iter(loader), size=2, transfer=_stage
    ):
        ids, sc, bb = [np.asarray(x)[:n_real] for x in step(images)]
        for i in range(ids.shape[0]):
            if done >= max_do:
                break
            sidx = int(batch_idx[i])
            if FLAGS.mult_out:
                files = dataset.window_paths(sidx)
                for off, file in enumerate(files):
                    # skip clamped boundary duplicates (detect_yolo3.py:240-242)
                    if off != 2 and file == files[2]:
                        continue
                    collect(boxes_out[off], file, ids[i, off], sc[i, off], bb[i, off])
            else:
                collect(boxes_out, dataset.sample_path(sidx), ids[i], sc[i], bb[i])
            done += 1
        if done >= max_do:
            break
    return boxes_out


def _file_id(dataset, img_path, save_dir):
    if getattr(dataset, "name", "") == "vid":
        fid = os.path.join(img_path.split("/")[-2], os.path.basename(img_path)[:-5])
        os.makedirs(os.path.join(save_dir, img_path.split("/")[-2]), exist_ok=True)
        return fid
    return os.path.splitext(os.path.basename(img_path))[0]


def _mult_out_layout():
    """True when predictions use the 5-offset list-of-dicts layout (windowed
    mult_out detection, one pred_o{t} cache dir per offset).  --stream emits
    exactly one prediction per frame — the anchor frame's own offset — so
    its predictions/cache/eval use the flat single-dict layout even when the
    model is t_out (FLAGS.mult_out picks the model head, not the layout)."""
    return FLAGS.mult_out and not FLAGS.stream


def _pred_dirname(agnostic, offset=None):
    base = "pred_ag" if agnostic else "pred"
    if offset is not None:
        base += f"_o{offset}"
    return base


def save_predictions(save_dir, dataset, boxes, max_do=-1, agnostic=False, indices=None):
    """pred/*.txt cache, reference format (detect_yolo3.py:275-331); with
    mult_out, one pred_o{t} dir per window offset (:291-300).  `indices`
    restricts the write to those samples' files (a --skip_existing resume
    must not clobber finished samples' files with empty ones)."""
    if _mult_out_layout():
        for off, b in enumerate(boxes):
            _save_predictions_dict(
                os.path.join(save_dir, _pred_dirname(agnostic, off)), dataset, b, max_do,
                paths=lambda idx, off=off: dataset.window_paths(idx)[off],
                indices=indices,
            )
        return save_dir
    return _save_predictions_dict(
        os.path.join(save_dir, _pred_dirname(agnostic)), dataset, boxes, max_do,
        paths=dataset.sample_path,
        indices=indices,
    )


def _missing_indices(save_dir, dataset, max_do=-1, agnostic=False):
    """Sample indices whose pred cache files are incomplete — the
    --skip_existing resume set.  A sample counts as done only when EVERY
    file it would write exists (all five offset dirs for mult_out)."""
    if max_do < 0:
        max_do = len(dataset)
    missing = []
    for idx in range(min(len(dataset), max_do)):
        if _mult_out_layout():
            needed = [
                (os.path.join(save_dir, _pred_dirname(agnostic, off)),
                 dataset.window_paths(idx)[off])
                for off in range(5)
            ]
        else:
            needed = [
                (os.path.join(save_dir, _pred_dirname(agnostic)),
                 dataset.sample_path(idx))
            ]
        for d, img_path in needed:
            if not os.path.isdir(d) or not os.path.exists(
                os.path.join(d, _file_id(dataset, img_path, d) + ".txt")
            ):
                missing.append(idx)
                break
    return missing


def _save_predictions_dict(save_dir, dataset, boxes, max_do, paths, indices=None):
    os.makedirs(save_dir, exist_ok=True)
    if max_do < 0:
        max_do = len(dataset)
    for idx in indices if indices is not None else range(min(len(dataset), max_do)):
        img_path = paths(idx)
        fid = _file_id(dataset, img_path, save_dir)
        # atomic write (tmp + rename): a kill mid-write must leave either a
        # complete file or no file — cache resume treats a MISSING file as
        # "re-detect" but trusts any file that exists, so a truncated tail
        # file would silently drop that image's boxes on the resumed run
        final = os.path.join(save_dir, fid + ".txt")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            for box in boxes.get(img_path, []):
                f.write(
                    "{},{},{},{},{},{},{}\n".format(
                        img_path, box[0], box[1], box[2], box[3], box[4], box[5]
                    )
                )
        os.replace(tmp, final)
    return save_dir


def load_predictions(save_dir, dataset, max_do=-1, agnostic=False):
    """Reload the txt cache; None if any file missing
    (detect_yolo3.py:333-448)."""
    if _mult_out_layout():
        all_boxes = []
        for off in range(5):
            b = _load_predictions_dict(
                os.path.join(save_dir, _pred_dirname(agnostic, off)), dataset, max_do,
                paths=lambda idx, off=off: dataset.window_paths(idx)[off],
            )
            if b is None:
                return None
            all_boxes.append(b)
        return all_boxes
    return _load_predictions_dict(
        os.path.join(save_dir, _pred_dirname(agnostic)), dataset, max_do,
        paths=dataset.sample_path,
    )


def _load_predictions_dict(save_dir, dataset, max_do, paths):
    if not os.path.exists(save_dir):
        return None
    if max_do < 0:
        max_do = len(dataset)
    boxes = {}
    for idx in range(min(len(dataset), max_do)):
        img_path = paths(idx)
        fid = _file_id(dataset, img_path, save_dir)
        path = os.path.join(save_dir, fid + ".txt")
        if not os.path.exists(path):
            logging.error("Prediction file does not exist %s", path)
            return None
        with open(path) as f:
            for line in f:
                parts = line.rstrip().split(",")
                if len(parts) < 7:
                    continue
                boxes.setdefault(parts[0], []).append(
                    [int(parts[1])] + [float(p) for p in parts[2:7]]
                )
    return boxes


def get_class_map(trained_on, eval_on):
    """Map eval-set class ids to trained-on ids via wn ids (-1 = untrained)
    (detect_yolo3.py:698-709)."""
    toc = list(trained_on.wn_classes)
    return [toc.index(c) if c in toc else -1 for c in eval_on.wn_classes]


def hierarchical_nms(predictions, dataset, ov_thresh=0.5, conf_thresh=0.0, level_thresh=10):
    """Merge boxes along the same WordNet sub-branch, maxing confidences
    leaf -> root (detect_yolo3.py:736-789).  Host-side: runs on the tiny
    post-NMS cached predictions, not on device."""
    from videoyolo_tpu.ops.bbox import np_bbox_iou

    def np_box_iou_single(a, b):
        return float(
            np_bbox_iou(
                np.asarray(a, np.float64)[None, :4],
                np.asarray(b, np.float64)[None, :4],
                offset=1,  # the reference's +1 pixel convention (detect_yolo3.py:712-733)
            )[0, 0]
        )

    levels = dataset.get_levels()
    parents = dataset.parents
    wn = list(dataset.wn_classes)
    n = len(wn)
    on_branch = [[dataset.on_branch(i, j) for j in range(n)] for i in range(n)]
    level_thresh = max(0, level_thresh)

    out = {}
    for img_path, boxes in predictions.items():
        kept = []
        # highest (most leafy) class ids first (detect_yolo3.py:757)
        for box in sorted(boxes, key=lambda x: x[0], reverse=True):
            cls, conf, coords = int(box[0]), box[1], box[2:]
            if conf < conf_thresh:
                continue
            while levels[cls] > level_thresh:
                cls = wn.index(parents[wn[cls]])
            best_ov, best_idx = 0.0, -1
            for i, kb in enumerate(kept):
                ov = np_box_iou_single(coords, kb[2:])
                if ov > ov_thresh and ov > best_ov:
                    best_ov, best_idx = ov, i
            if best_idx == -1:
                kept.append([cls, conf] + list(coords))
            elif not on_branch[cls][kept[best_idx][0]]:
                kept.append([cls, conf] + list(coords))
            elif cls == kept[best_idx][0]:
                kept[best_idx][1] = max(kept[best_idx][1], conf)
            # else: a descendant already covers this box — drop it
        out[img_path] = kept
    return out


def add_metrics_to_predictions(save_dir, dataset, metric, predictions):
    """Annotate each prediction file with its per-frame score and write the
    worst-clip summary.txt (detect_yolo3.py:451-534)."""
    load_dir = os.path.join(save_dir, _pred_dirname(FLAGS.model_agnostic))
    summary = {}
    for idx in range(len(dataset)):
        img_path = dataset.sample_path(idx)
        if isinstance(img_path, list):
            img_path = img_path[FLAGS.offset + 2]
        img, y, _ = dataset[idx]
        if _mult_out_layout():
            img, y = img[FLAGS.offset + 2], y[FLAGS.offset + 2]
        h, w = img.shape[0], img.shape[1]
        preds = np.asarray(
            predictions.get(img_path, np.zeros((0, 6))), dtype=np.float64
        ).reshape(-1, 6)
        metric.reset()
        metric.update(
            preds[None, :, 2:6] * np.array([w, h, w, h]),
            preds[None, :, 0:1],
            preds[None, :, 1:2],
            y[None, :, :4],
            y[None, :, 4:5],
            y[None, :, 5:6] if y.shape[-1] > 5 else None,
        )
        _, scores = metric.get()
        score = scores[-1] if isinstance(scores, (list, np.ndarray)) else scores
        if getattr(dataset, "name", "") == "vid":
            summary.setdefault(img_path.split("/")[-2], []).append(score)
        else:
            summary[img_path] = score
        fid = _file_id(dataset, img_path, os.path.join(load_dir, "metric"))
        os.makedirs(os.path.dirname(os.path.join(load_dir, "metric", fid + ".txt")), exist_ok=True)
        with open(os.path.join(load_dir, "metric", fid + ".txt"), "w") as f:
            for box in predictions.get(img_path, []):
                f.write(
                    "{},{},{},{},{},{},{},{}\n".format(img_path, *box[:6], score)
                )

    # rank worst first; clips sort by (mean AP, -frames) (detect_yolo3.py:524-529)
    items = []
    for k, v in summary.items():
        if isinstance(v, list):
            items.append((k, sum(v) / len(v), len(v)))
        else:
            items.append((k, v, 1))
    items.sort(key=lambda kv: (kv[1], -kv[2]))
    os.makedirs(os.path.join(load_dir, "metric"), exist_ok=True)
    summary_path = os.path.join(load_dir, "metric", "summary.txt")
    with open(summary_path, "w") as f:
        for k, score, _ in items:
            f.write(f"{k}\t{score}\n")
    return summary_path


def video_of_worst(video_path, frames_dir, summary_file, fps=4):
    """Render the worst clips (by summary.txt ranking) into one review video
    (detect_yolo3.py:584-656)."""
    import glob as _glob

    import cv2

    if not video_path.endswith(".mp4"):
        video_path += ".mp4"
    with open(summary_file) as f:
        entries = [line.split() for line in f if line.strip()]
    height, width = 1080, 1920
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (width, height)
    )
    for vid_id, score in entries:
        frames = sorted(
            _glob.glob(os.path.join(frames_dir, vid_id, "**", "*.*"), recursive=True)
        )
        for fn in frames:
            img = cv2.imread(fn)
            if img is None:
                continue
            canvas = np.zeros((height, width, 3), np.uint8)
            h, w = img.shape[:2]
            r = min(height / h, width / w)
            hs, ws = int(h * r), int(w * r)
            img = cv2.resize(img, (ws, hs), interpolation=cv2.INTER_AREA)
            y0, x0 = (height - hs) // 2, (width - ws) // 2
            canvas[y0 : y0 + hs, x0 : x0 + ws] = img
            cv2.putText(
                canvas, f"Clip AP: {float(score):.2f}", (1650, 1060),
                cv2.FONT_HERSHEY_SIMPLEX, 1, (255, 255, 255), 2,
            )
            cv2.putText(
                canvas, fn, (10, 1060), cv2.FONT_HERSHEY_SIMPLEX, 1, (255, 255, 255), 2
            )
            for _ in range(int(25 / fps)):
                writer.write(canvas)
    writer.release()
    return video_path


def visualise_predictions(save_dir, dataset, trained_on_classes, predictions):
    """Render detections (and optionally gt) onto images
    (detect_yolo3.py:537-582)."""
    import cv2

    from videoyolo_tpu.data.base import read_image
    from videoyolo_tpu.utils.image import cv_plot_bbox

    out_dir = os.path.join(save_dir, "vis")
    os.makedirs(out_dir, exist_ok=True)
    for idx in range(len(dataset)):
        img_path = dataset.sample_path(idx)
        if isinstance(img_path, list):  # windowed mult_out: visualise the
            img_path = img_path[FLAGS.offset + 2]  # evaluated offset's frame
        img = read_image(img_path)
        preds = np.asarray(predictions.get(img_path, np.zeros((0, 6))))
        if len(preds):
            img = cv_plot_bbox(
                img,
                preds[:, 2:6],
                scores=preds[:, 1],
                labels=preds[:, 0],
                thresh=FLAGS.detection_threshold,
                class_names=trained_on_classes,
                absolute_coordinates=False,
            )
        if FLAGS.display_gt and hasattr(dataset, "_load_label"):
            gt = dataset._load_label(idx)
            if isinstance(gt, list):  # mult_out: per-frame label list
                gt = gt[FLAGS.offset + 2]
            gt = np.asarray(gt)
            gt = gt[gt[:, 4] >= 0] if gt.size else gt
            if len(gt):
                img = cv_plot_bbox(
                    img, gt[:, :4], labels=gt[:, 4],
                    class_names=getattr(dataset, "classes", None) or None,
                )
        # keep the clip subdir for video datasets (same id scheme as the
        # pred cache): basenames collide across clips, and video_of_worst
        # globs vis/<clip>/** to assemble each clip's frames
        fid = _file_id(dataset, img_path, out_dir)
        cv2.imwrite(os.path.join(out_dir, fid + ".jpg"), img[:, :, ::-1])
    return out_dir


def get_metric(dataset, metric_name, data_shape, class_map=None):
    """Reference get_metric (detect_yolo3.py:181-196)."""
    from videoyolo_tpu.metrics import VOCMApMetric

    if metric_name == "voc":
        return VOCMApMetric(
            iou_thresh=0.5, class_names=dataset.classes, class_map=class_map
        )
    if metric_name == "coco":
        from videoyolo_tpu.metrics.mscoco import COCODetectionMetric

        return COCODetectionMetric(
            dataset,
            os.path.join(FLAGS.save_dir, FLAGS.save_prefix, "coco_eval"),
            cleanup=True,
        )
    if metric_name == "vid":
        from videoyolo_tpu.metrics.imgnetvid import VIDDetectionMetric

        return VIDDetectionMetric(
            dataset,
            class_map=class_map,
            agnostic=FLAGS.metric_agnostic,
            offset=FLAGS.offset if FLAGS.mult_out else None,
        )
    raise NotImplementedError(
        f"metric '{metric_name}' not yet built (reference metrics/)"
    )


def evaluate(metrics, dataset, predictions):
    """Update metrics from normalized cached predictions
    (detect_yolo3.py:659-696)."""
    from videoyolo_tpu.data.base import read_image

    sample_ids = (
        dataset.get_sample_ids() if hasattr(dataset, "get_sample_ids") else dataset.sample_ids
    ) if hasattr(dataset, "sample_ids") else list(range(len(dataset)))
    for idx in range(len(dataset)):
        img_path = dataset.sample_path(idx)
        sid = sample_ids[idx]
        if _mult_out_layout():  # windowed mult_out; --stream is per-frame flat
            sid = sid[FLAGS.offset + 2]
            img_path = img_path[FLAGS.offset + 2]
        img, y, _ = dataset[idx]
        if _mult_out_layout():
            img = img[FLAGS.offset + 2]
            y = y[FLAGS.offset + 2]
        h, w = img.shape[0], img.shape[1]
        preds = np.asarray(
            predictions.get(img_path, np.zeros((0, 6))), dtype=np.float64
        ).reshape(-1, 6)
        det_bboxes = preds[None, :, 2:6] * np.array([w, h, w, h])
        det_ids = preds[None, :, 0:1]
        det_scores = preds[None, :, 1:2]
        gt_bboxes = y[None, :, :4]
        gt_ids = y[None, :, 4:5]
        gt_difficults = y[None, :, 5:6] if y.shape[-1] > 5 else None
        for metric in metrics:
            metric.update(
                det_bboxes, det_ids, det_scores, gt_bboxes, gt_ids, gt_difficults, sid=sid
            )
    return [m.get() for m in metrics]


def main(_argv):
    from videoyolo_tpu.data.loader import DetectionLoader
    from videoyolo_tpu.data.transforms import YOLO3DefaultInferenceTransform

    window = [int(w) for w in FLAGS.window]
    assert window[0] == 1 or FLAGS.dataset[0] in ("vid", "yt") or FLAGS.stream, (
        "window > 1 requires a video dataset (reference detect_yolo3.py:805-806) "
        "or --stream (frame-ordered ad-hoc inputs)"
    )
    if FLAGS.stream:
        assert window[0] > 1, "--stream needs a temporal window (--window k,1)"
        assert window[1] == 1, (
            "--stream runs stride-1 windows (--window k,1); strided windows "
            "skip frames the ring buffer would need"
        )

    dataset = get_dataset(FLAGS.dataset)
    trained_on = get_dataset([FLAGS.trained_on]) if FLAGS.trained_on else dataset
    classes = trained_on.classes if trained_on.classes else ["object"]
    class_map = (
        get_class_map(trained_on, dataset) if FLAGS.trained_on else None
    )

    save_dir = os.path.join(FLAGS.save_dir, FLAGS.save_prefix)
    os.makedirs(save_dir, exist_ok=True)

    if FLAGS.export_model:
        predictions = None  # force the model-build path; skip the cache scan
    else:
        predictions = load_predictions(
            save_dir, dataset, FLAGS.max_do, FLAGS.model_agnostic
        )
    if predictions is None:
        from videoyolo_tpu.data.transforms import YOLO3VideoInferenceTransform

        native_hw = None
        if window[0] > 1 and not FLAGS.stream:
            dataset._transform = YOLO3VideoInferenceTransform(
                FLAGS.data_shape, FLAGS.data_shape
            )
        else:
            dataset._transform = YOLO3DefaultInferenceTransform(
                FLAGS.data_shape, FLAGS.data_shape
            )
            # single-frame JPEG datasets take the C++ decode fast path
            # (videoyolo_tpu/native); labels are re-read at eval time anyway
            probe = [dataset.sample_path(i) for i in range(min(len(dataset), 8))]
            if all(
                isinstance(p, str) and p.lower().endswith((".jpg", ".jpeg"))
                for p in probe
            ):
                native_hw = (FLAGS.data_shape, FLAGS.data_shape)
        detect_indices = None  # None = full sweep
        if FLAGS.skip_existing and not FLAGS.export_model:
            assert not FLAGS.stream, (
                "--skip_existing cannot compose with --stream: the ring "
                "buffer needs consecutive frames"
            )
            n_all = min(
                len(dataset), FLAGS.max_do if FLAGS.max_do >= 0 else len(dataset)
            )
            detect_indices = _missing_indices(
                save_dir, dataset, FLAGS.max_do, FLAGS.model_agnostic
            )
            logging.info(
                "Resuming detect: %d/%d samples still to run",
                len(detect_indices), n_all,
            )
            if not detect_indices:
                # only reachable if the earlier full-cache load raced a
                # concurrent writer; a full sweep is always correct
                detect_indices = None
        loader = DetectionLoader(
            dataset,
            batch_size=1 if FLAGS.stream else FLAGS.batch_size,
            num_workers=FLAGS.num_workers,
            native_decode=native_hw,
            sampler=(
                (lambda epoch, idxs=tuple(detect_indices): np.asarray(idxs, np.int64))
                if detect_indices is not None
                else None
            ),
            num_samples=len(detect_indices) if detect_indices is not None else None,
        )
        model, variables = get_net_and_params(len(classes))
        if FLAGS.quantize:
            calib = None
            if FLAGS.stream:
                # stream loaders yield single frames; the temporal model
                # calibrates on sliding windows built from the first frames
                import itertools

                import jax.numpy as jnp

                k = window[0]
                fr = [
                    b["image"]
                    for b in itertools.islice(iter(loader), 2 * k)
                ]
                calib = [
                    jnp.concatenate([f[:, None] for f in fr[i : i + k]], axis=1)
                    for i in range(0, max(len(fr) - k + 1, 1), k)
                ]
            model, variables = quantize_for_serving(
                model, variables, loader, calib_batches=calib
            )
        if FLAGS.export_model:
            if FLAGS.stream:
                from videoyolo_tpu.streaming import export_streaming_detector

                export_streaming_detector(
                    model, variables, FLAGS.export_model,
                    batch_size=1, size=FLAGS.data_shape,
                )
            else:
                from videoyolo_tpu.serving import export_detector

                export_detector(
                    model,
                    variables,
                    FLAGS.export_model,
                    batch_size=FLAGS.batch_size,
                    size=FLAGS.data_shape,
                    window=window[0] if window[0] > 1 else None,
                )
            logging.info("Wrote serving artifact to %s", FLAGS.export_model)
            return
        if FLAGS.stream:
            boxes = detect_stream(model, variables, dataset, loader, FLAGS.max_do)
        else:
            boxes = detect(model, variables, dataset, loader, FLAGS.max_do)
        save_predictions(
            save_dir, dataset, boxes, FLAGS.max_do, FLAGS.model_agnostic,
            indices=detect_indices,
        )
        dataset._transform = None
        if detect_indices is not None:
            # partial resume: `boxes` holds only the just-detected samples;
            # the cache is now complete — reload the full prediction set
            predictions = load_predictions(
                save_dir, dataset, FLAGS.max_do, FLAGS.model_agnostic
            )
            assert predictions is not None, "resumed cache still incomplete"
        else:
            predictions = boxes

    if _mult_out_layout():
        eval_predictions = predictions[FLAGS.offset + 2]
    else:
        eval_predictions = predictions

    # WordNet-tree post-processing for the combined dataset
    # (reference detect_yolo3.py:899)
    if getattr(dataset, "name", "") == "comb" and getattr(dataset, "parents", None):
        eval_predictions = hierarchical_nms(
            eval_predictions, dataset, level_thresh=FLAGS.hier_level
        )

    if FLAGS.per_frame_metric and dataset.classes:
        metric = get_metric(dataset, FLAGS.metrics[0], FLAGS.data_shape, class_map)
        summary_path = add_metrics_to_predictions(
            save_dir, dataset, metric, eval_predictions
        )
        if FLAGS.worst_video_path:
            # the worst-clips video renders the ANNOTATED frames from the
            # vis dir (reference detect_yolo3.py:906 passes save_dir/vis);
            # build them if --visualise didn't already
            vis_dir = os.path.join(save_dir, "vis")
            if not os.path.isdir(vis_dir):
                vis_dir = visualise_predictions(
                    save_dir, dataset, classes, eval_predictions
                )
            video_of_worst(FLAGS.worst_video_path, vis_dir, summary_path)

    if FLAGS.visualise:
        visualise_predictions(save_dir, dataset, classes, eval_predictions)

    if dataset.classes:  # labelled dataset -> evaluate
        metrics = [
            get_metric(dataset, m, FLAGS.data_shape, class_map) for m in FLAGS.metrics
        ]
        results = evaluate(metrics, dataset, eval_predictions)
        for metric_name, (names, values) in zip(FLAGS.metrics, results):
            path = os.path.join(save_dir, f"{metric_name}.txt")
            with open(path, "w") as f:
                if isinstance(names, list):
                    for n, v in zip(names, values):
                        f.write(f"{n}: {v}\n")
                        logging.info("%s: %s", n, v)
                else:
                    f.write(f"{names}: {values}\n")
                    logging.info("%s: %s", names, values)
            logging.info("wrote %s", path)
    else:
        logging.info("No labels — wrote predictions for %d images", len(predictions))


if __name__ == "__main__":
    app.run(main)
