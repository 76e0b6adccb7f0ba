"""Training CLI.

Capability parity with `/root/reference/train_yolov3.py` (flags :45-164;
pipeline get_dataset :167 -> get_dataloader :234 -> get_net :332 ->
train :492 with validate :434, save_params :289, resume :312), re-built
TPU-native:

  * the per-batch device program is ONE pjit-compiled train step over the
    whole mesh (forward + on-device target gen + loss + backward + SGD);
    gradients/BN stats all-reduce over ICI — replacing split_and_load +
    kvstore='local' + SyncBatchNorm (:527-530, :596-636);
  * random-shape training (:265-271) uses fixed shape buckets
    {320,352,...,608}; each bucket compiles once and is cached;
  * checkpoints keep the reference's best/interval/negative-GC policies.
"""
from __future__ import annotations

import logging
import os
import time

import numpy as np
from absl import app, flags

logging.basicConfig(level=logging.INFO)

FLAGS = flags.FLAGS

flags.DEFINE_string("network", "darknet53", "Base network name: darknet53")
flags.DEFINE_list("dataset", ["voc"], "Datasets to train on.")
flags.DEFINE_list("dataset_val", [], "Datasets to test on.")
flags.DEFINE_string("dataset_root", "datasets", "Root directory holding the datasets")
flags.DEFINE_string("trained_on", "", "For finetuning: dataset the original model was trained on.")
flags.DEFINE_string("save_prefix", "0001", "Model save prefix.")
flags.DEFINE_integer("log_interval", 100, "Logging mini-batch interval.")
flags.DEFINE_integer("save_interval", -10, "Saving parameters epoch interval; negative = save every epoch, GC to every |N|th.")
flags.DEFINE_integer("val_interval", 1, "Epoch interval for validation.")
flags.DEFINE_string("resume", "", "Resume from previously saved parameters if not ''.")
flags.DEFINE_integer("batch_size", 64, "Global batch size (sharded over the mesh).")
flags.DEFINE_integer(
    "max_boxes", 56,
    "Fixed ground-truth rows per image in device batches (the jit shape "
    "contract; the reference pads dynamically to the batch max). Raise for "
    "crowded datasets (COCO images carry up to ~93 objects); the loader "
    "doubles it automatically under --mixup and warns once on truncation.",
)
flags.DEFINE_integer("epochs", 200, "How many training epochs to complete")
flags.DEFINE_integer("start_epoch", 0, "Starting epoch (resume); -1 = auto-find latest.")
flags.DEFINE_integer("data_shape", 416, "Eval shape; training uses random shapes 320-608 unless --no_random_shape.")
flags.DEFINE_float("lr", 0.001, "Learning rate.")
flags.DEFINE_string("lr_mode", "step", "LR schedule mode: step, poly, cosine.")
flags.DEFINE_float("lr_decay", 0.1, "Decay rate of learning rate.")
flags.DEFINE_integer("lr_decay_period", 0, "Interval for periodic learning rate decays.")
flags.DEFINE_list("lr_decay_epoch", [160, 180], "Epochs at which learning rate decays.")
flags.DEFINE_integer("warmup_epochs", 0, "Number of warmup epochs.")
flags.DEFINE_float("momentum", 0.9, "SGD momentum.")
flags.DEFINE_float("wd", 0.0005, "Weight decay.")
flags.DEFINE_boolean("pretrained_cnn", True, "Use an imagenet pretrained cnn as base network.")
flags.DEFINE_string(
    "pretrained_base_path", "",
    "Explicit path to gluoncv darknet53 .params for --pretrained_cnn; empty "
    "= search $MXNET_HOME/models, ~/.mxnet/models and <dataset_root>/weights "
    "(the gluoncv model-zoo cache locations the reference resolves from).",
)
flags.DEFINE_boolean("syncbn", False, "Kept for CLI parity; BN stats are always global-batch under pjit.")
flags.DEFINE_boolean("no_random_shape", False, "Use fixed data_shape throughout training.")
flags.DEFINE_boolean("no_wd", False, "Remove weight decay on bias/beta/gamma of BN layers.")
flags.DEFINE_boolean(
    "remat", False,
    "Rematerialise backbone activations in the train step (fit batch >32 "
    "per chip at 416px for ~15% recompute).",
)
flags.DEFINE_string(
    "dtype", "bf16",
    "Model compute dtype: bf16 (MXU-native) or f32.",
)
flags.DEFINE_boolean(
    "s2d_stem", False,
    "Evaluate the darknet stem on the space-to-depth grid (bit-equivalent, "
    "better MXU utilisation); pretrained bases are refolded on load, and "
    "checkpoints save in the s2d layout (detect with --s2d_stem too).",
)
flags.DEFINE_integer(
    "accum_steps", 1,
    "Gradient-accumulation micro-steps per optimizer update (effective "
    "batches past the per-chip HBM limit).",
)
flags.DEFINE_boolean(
    "nd_only", False,
    "Run the train step eagerly instead of jit-compiled (debugging; the "
    "reference's no-hybridize escape hatch, train_yolov3.py:64-65).",
)
flags.DEFINE_boolean(
    "host_color", False,
    "Apply photometric augmentation + normalization on host instead of "
    "on-device (debugging; default ships uint8 + per-image color matrices "
    "and lets the TPU do the float color math).",
)
flags.DEFINE_boolean("mixup", False, "Enable mixup?")
flags.DEFINE_integer("no_mixup_epochs", 20, "Disable mixup in the last N epochs.")
flags.DEFINE_boolean("label_smooth", False, "Use label smoothing?")
flags.DEFINE_boolean("freeze_base", False, "Freeze the base network?")
flags.DEFINE_boolean("allow_empty", True, "Allow samples with 0 boxes.")
flags.DEFINE_boolean("mult_out", False, "One or multiple outs for timeseries data")
flags.DEFINE_boolean("temp", False, "Use new temporal model")
flags.DEFINE_list("gpus", [0], "Kept for reference CLI parity; devices come from JAX.")
flags.DEFINE_integer("num_workers", -1, "Data loading workers; -1 auto.")
flags.DEFINE_boolean("new_model", False, "Use features Yolo (new) or stages Yolo (old)?")
flags.DEFINE_integer("num_samples", -1, "Training images; -1 auto.")
flags.DEFINE_float("every", 25, "do every this many frames")
flags.DEFINE_list("window", [1, 1], "Temporal window size and stride.")
flags.DEFINE_integer("seed", 233, "Random seed.")
flags.DEFINE_string("features_dir", None, "Use pre-saved backbone features as input (no-backbone head).")
flags.DEFINE_string("k_join_type", None, "way to fuse k: max, mean, cat.")
flags.DEFINE_string("k_join_pos", None, "position of k fuse: early or late.")
flags.DEFINE_string("block_conv_type", "2", "conv type for YOLO blocks: 2, 3, 21.")
flags.DEFINE_string("rnn_pos", None, "position of RNN: late or out")
flags.DEFINE_string("corr_pos", None, "position of correlation features: early or late")
flags.DEFINE_integer("corr_d", 0, "The d value for the correlation filter.")
flags.DEFINE_string("motion_stream", None, "Motion stream: flownet or r21d.")
flags.DEFINE_string("stream_gating", None, "Gating on appearance stream: add or mul.")
flags.DEFINE_list("conv_types", [2, 2, 2, 2, 2, 2], "Darknet conv types per layer.")
flags.DEFINE_string("h_join_type", None, "Hierarchical darknet join: max or conv.")
flags.DEFINE_list("hier", [1, 1, 1, 1, 1], "Hierarchical factors.")
flags.DEFINE_integer("max_epoch_time", -1, "Max minutes an epoch can run before cutoff.")
flags.DEFINE_string("experiment_root", os.path.join("models", "experiments"), "Experiment directory root.")
flags.DEFINE_string(
    "profile_dir", "",
    "If set, capture a JAX device profile of train steps 10-20 of the first "
    "epoch to this directory (the TPU-native upgrade of the reference's "
    "wall-clock samples/sec logging, SURVEY.md §5).",
)


def _get_single_dataset(name, val=False):
    """One dataset by name (reference get_dataset :167-233)."""
    from videoyolo_tpu.data import VOCDetection

    window = [int(w) for w in FLAGS.window]
    if name == "voc":
        if val:
            return VOCDetection(
                root=os.path.join(FLAGS.dataset_root, "PascalVOC", "VOCdevkit"),
                splits=[(2007, "test")],
                inference=True,
                features_dir=FLAGS.features_dir,
            )
        return VOCDetection(
            root=os.path.join(FLAGS.dataset_root, "PascalVOC", "VOCdevkit"),
            splits=[(2007, "trainval"), (2012, "trainval")],
            features_dir=FLAGS.features_dir,
        )
    if name == "coco":
        from videoyolo_tpu.data.mscoco import COCODetection

        split = "instances_val2017" if val else "instances_train2017"
        return COCODetection(
            root=os.path.join(FLAGS.dataset_root, "MSCoco"),
            splits=[split],
            allow_empty=val,
            inference=val,
        )
    if name == "det":
        from videoyolo_tpu.data.imgnetdet import ImageNetDetection

        return ImageNetDetection(
            root=os.path.join(FLAGS.dataset_root, "ImageNetDET", "ILSVRC"),
            splits=["val" if val else "train"],
            allow_empty=FLAGS.allow_empty or val,
            inference=val,
        )
    if name == "vid":
        from videoyolo_tpu.data.imgnetvid import ImageNetVidDetection

        return ImageNetVidDetection(
            root=os.path.join(FLAGS.dataset_root, "ImageNetVID", "ILSVRC"),
            splits=[(2017, "val" if val else "train")],
            allow_empty=FLAGS.allow_empty or val,
            every=int(FLAGS.every),
            window=window,
            mult_out=FLAGS.mult_out,
            inference=val,
            features_dir=FLAGS.features_dir,
        )
    if name == "yt":
        from videoyolo_tpu.data.youtubebb import YouTubeBBDetection

        return YouTubeBBDetection(
            root=os.path.join(FLAGS.dataset_root, "YouTubeBB"),
            splits=["val" if val else "train"],
            frames=FLAGS.every,
            window=window,
            inference=val,
        )
    raise NotImplementedError(
        f"dataset '{name}' not yet built in the TPU port (reference datasets/)"
    )


def get_dataset(names, val=False):
    """Dataset flags -> dataset; multiple names combine via the class tree
    (reference get_dataset :167-233, CombinedDetection at :227-229)."""
    from videoyolo_tpu.data.transforms import MixupDetection

    names = list(names) if isinstance(names, (list, tuple)) else [names]
    if len(names) > 1 or names[0] == "comb":
        from videoyolo_tpu.data.combined import CombinedDetection

        if names[0] == "comb":
            names = ["voc", "coco", "det", "vid"]
        subsets = [_get_single_dataset(n, val) for n in names]
        ds = CombinedDetection(
            subsets, class_tree=True, validation=val, inference=val
        )
    else:
        ds = _get_single_dataset(names[0], val)
    if not val and FLAGS.mixup:
        ds = MixupDetection(ds)
    return ds


def get_dataloaders(train_dataset, val_dataset):
    from videoyolo_tpu.data.loader import DetectionLoader
    from videoyolo_tpu.data.transforms import (
        YOLO3DefaultInferenceTransform,
        YOLO3DefaultTrainTransform,
        YOLO3VideoInferenceTransform,
        YOLO3VideoTrainTransform,
    )

    window = [int(w) for w in FLAGS.window]
    k = window[0]
    num_workers = FLAGS.num_workers if FLAGS.num_workers > 0 else (os.cpu_count() or 4)

    # multi-host pods: each process decodes only its share of the global
    # batch; a seeded permutation keeps processes disjoint + coordinated and
    # the loader's (same-seeded) bucket schedule keeps shapes in lockstep
    # across processes (parallel/multihost.py)
    import jax

    from videoyolo_tpu.parallel.multihost import local_batch_size, process_epoch_indices

    pc = jax.process_count()
    train_bs = local_batch_size(FLAGS.batch_size, pc)
    sampler = None
    num_samples = None
    if pc > 1:
        n_train = len(train_dataset)
        sampler = lambda epoch: process_epoch_indices(n_train, epoch, seed=FLAGS.seed)
        num_samples = n_train // pc
    if FLAGS.features_dir:
        # no-backbone head: features are fixed-scale, no random shapes
        from videoyolo_tpu.data.loader import collate_features
        from videoyolo_tpu.data.transforms import (
            YOLO3NBInferenceTransform,
            YOLO3NBTrainTransform,
        )

        s = FLAGS.data_shape
        train_dataset._transform = YOLO3NBTrainTransform(s, s)
        train_loader = DetectionLoader(
            train_dataset,
            batch_size=train_bs,
            shuffle=True,
            last_batch="discard",
            num_workers=num_workers,
            seed=FLAGS.seed,
            collate=collate_features,
            sampler=sampler,
            num_samples=num_samples,
        )
        val_loader = None
        if val_dataset is not None:
            val_dataset._transform = YOLO3NBInferenceTransform(s, s)
            val_loader = DetectionLoader(
                val_dataset,
                batch_size=FLAGS.batch_size,
                num_workers=num_workers,
                collate=collate_features,
            )
        return train_loader, val_loader
    if FLAGS.no_random_shape:
        sizes = [FLAGS.data_shape]
    else:
        sizes = [320 + 32 * i for i in range(10)]  # x*32 for x in 10..19 (:265-271)
    device_color = not FLAGS.host_color
    if k > 1:
        tf = lambda w, h: YOLO3VideoTrainTransform(
            k, w, h, mixup=FLAGS.mixup, device_color=device_color
        )
    else:
        tf = lambda w, h: YOLO3DefaultTrainTransform(
            w, h, mixup=FLAGS.mixup, device_color=device_color
        )
    # combined class-tree training ships multi-hot ancestor labels
    multihot = (
        train_dataset.num_class
        if getattr(train_dataset, "name", "") == "comb"
        and getattr(train_dataset, "parents", None)
        else 0
    )
    train_loader = DetectionLoader(
        train_dataset,
        batch_size=train_bs,
        shuffle=True,
        last_batch="discard",
        max_boxes=FLAGS.max_boxes,
        num_workers=num_workers,
        mixup=FLAGS.mixup,
        seed=FLAGS.seed,
        transform_factory=tf,
        shape_sizes=sizes,
        shape_interval=10,
        multihot=multihot,
        sampler=sampler,
        num_samples=num_samples,
    )
    val_loader = None
    if val_dataset is not None:
        if k > 1:
            val_dataset._transform = YOLO3VideoInferenceTransform(
                FLAGS.data_shape, FLAGS.data_shape
            )
        else:
            val_dataset._transform = YOLO3DefaultInferenceTransform(
                FLAGS.data_shape, FLAGS.data_shape
            )
        # multi-host: every process evaluates the FULL val set independently
        # (identical mAP everywhere, no cross-host metric reduction needed —
        # redundant decode is accepted; validation is a sliver of epoch
        # time), but in LOCAL-size device batches so eval never exceeds the
        # per-host memory footprint training was sized for
        val_loader = DetectionLoader(
            val_dataset, batch_size=local_batch_size(FLAGS.batch_size, pc),
            max_boxes=FLAGS.max_boxes, num_workers=num_workers,
        )
    return train_loader, val_loader


def get_val_metric(val_dataset, save_prefix):
    """Validation metric per the reference's get_dataset selection
    (train_yolov3.py:178-226): COCO val -> COCODetectionMetric, vid val with
    mult_out -> per-timestep VOCMApMetricTemporal, everything else (incl.
    the combined class tree) -> VOCMApMetric at IoU 0.5 — always built over
    the VAL dataset's classes (a --dataset_val differing from --dataset
    evaluates in the val class space, reference :181,:197,:211)."""
    from videoyolo_tpu.metrics import VOCMApMetric
    from videoyolo_tpu.metrics.mscoco import COCODetectionMetric
    from videoyolo_tpu.metrics.pascalvoc import VOCMApMetricTemporal

    val_names = list(FLAGS.dataset_val or FLAGS.dataset)
    combined = len(val_names) > 1 or val_names[0] == "comb"
    if not combined and val_names[0] == "coco":
        import jax

        # multi-host: every process evaluates the full val set (see
        # get_dataloader), and this metric WRITES a results json — give each
        # process its own file so a pod-shared save dir doesn't race
        suffix = f"_eval_p{jax.process_index()}" if jax.process_count() > 1 else "_eval"
        return COCODetectionMetric(
            val_dataset, save_prefix + suffix, cleanup=True,
            data_shape=(FLAGS.data_shape, FLAGS.data_shape),
        )
    if not combined and val_names[0] == "vid" and FLAGS.mult_out:
        return VOCMApMetricTemporal(
            t=int(FLAGS.window[0]), iou_thresh=0.5,
            class_names=list(val_dataset.classes),
        )
    return VOCMApMetric(iou_thresh=0.5, class_names=list(val_dataset.classes))


def validate(model, state, val_loader, val_dataset, metric, eval_step):
    """Reference validate() (:434-490): eval step on device, metric on host.

    `eval_step` is the pre-jitted step (train() builds it once per run via
    `jax.jit(make_eval_step(model))`) and is required: a fresh jit closure
    per call would miss the jit cache and recompile the full model at every
    validation epoch, so there is deliberately no fallback path."""
    metric.reset()
    temporal_metric = hasattr(metric, "update_t")
    for batch in val_loader:
        x = tuple(batch["features"]) if "features" in batch else batch["image"]
        ids, scores, bboxes = eval_step(state.params, state.batch_stats, x)
        ids, scores, bboxes = np.asarray(ids), np.asarray(scores), np.asarray(bboxes)
        label = batch["label"]
        size = (
            batch["image"].shape[-2]
            if "image" in batch
            else batch["features"][0].shape[-2] * 8
        )
        if ids.ndim == 4:  # t_out: (B, T, ...) per-frame outputs
            if temporal_metric:
                # per-offset streams (reference VOCMApMetricTemporal)
                metric.update(
                    [bboxes[:, t].clip(0, size) for t in range(ids.shape[1])],
                    [ids[:, t] for t in range(ids.shape[1])],
                    [scores[:, t] for t in range(ids.shape[1])],
                    [label[:, t, :, :4] for t in range(ids.shape[1])],
                    [label[:, t, :, 4:5] for t in range(ids.shape[1])],
                    [label[:, t, :, 5:6] for t in range(ids.shape[1])]
                    if label.shape[-1] > 5 else None,
                )
                continue
            bt = ids.shape[0] * ids.shape[1]
            ids, scores, bboxes = (
                a.reshape((bt,) + a.shape[2:]) for a in (ids, scores, bboxes)
            )
            label = label.reshape((bt,) + label.shape[2:])
        metric.update(
            bboxes.clip(0, size), ids, scores,
            label[..., :4], label[..., 4:5],
            label[..., 5:6] if label.shape[-1] > 5 else None,
        )
    return metric.get()


def train(model, variables, train_dataset, train_loader, val_loader, val_dataset, save_prefix, start_epoch):
    import jax

    from videoyolo_tpu.parallel.mesh import make_mesh, replicated_sharding
    from videoyolo_tpu.parallel.multihost import put_global_batch
    from videoyolo_tpu.train.checkpoint import save_params
    from videoyolo_tpu.train.lr import lr_schedule
    from videoyolo_tpu.train.step import create_train_state, make_train_step, make_optimizer
    from videoyolo_tpu.train.step import TrainState

    num_classes = train_dataset.num_class
    steps_per_epoch = max(len(train_loader), 1)

    lr_decay_epoch = [int(e) for e in FLAGS.lr_decay_epoch]
    if FLAGS.lr_decay_period > 0:
        lr_decay_epoch = list(
            range(FLAGS.lr_decay_period, FLAGS.epochs, FLAGS.lr_decay_period)
        )
    lr_decay_epoch = [e - FLAGS.warmup_epochs for e in lr_decay_epoch]
    lr_fn = lr_schedule(
        FLAGS.lr_mode,
        FLAGS.lr,
        steps_per_epoch=steps_per_epoch,
        epochs=FLAGS.epochs,
        warmup_epochs=FLAGS.warmup_epochs,
        lr_decay=FLAGS.lr_decay,
        lr_decay_epochs=lr_decay_epoch,
    )
    tx = make_optimizer(
        lr_fn, FLAGS.momentum, FLAGS.wd,
        no_wd_bn=FLAGS.no_wd,
        freeze_base=FLAGS.freeze_base,
    )
    import jax.numpy as jnp
    from flax.core import FrozenDict

    opt_state = tx.init(variables["params"])
    if start_epoch > 0:
        # resume: the schedule must continue from the global step, not
        # replay warmup/decay from 0 (reference re-derives its scheduler,
        # train_yolov3.py:507-514)
        from videoyolo_tpu.train.step import fast_forward_schedule

        opt_state = fast_forward_schedule(opt_state, start_epoch * steps_per_epoch)
    state = TrainState(
        step=jnp.asarray(start_epoch * steps_per_epoch, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=opt_state,
        tx=tx,
    )

    mesh = make_mesh()
    state = jax.device_put(state, replicated_sharding(mesh))
    train_step = make_train_step(
        model,
        num_classes=num_classes,
        label_smooth=FLAGS.label_smooth,
        mixup=FLAGS.mixup,
        accum_steps=FLAGS.accum_steps,
    )
    if not FLAGS.nd_only:
        train_step = jax.jit(train_step, donate_argnums=(0,))
    # one jitted eval step per run — compiled at the first validation epoch,
    # cache-hit thereafter (round-1 rebuilt the closure per validate() call)
    from videoyolo_tpu.train.step import make_eval_step

    eval_step = jax.jit(make_eval_step(model))

    # multi-host pods: host-side artifacts (TB events, _train.log,
    # checkpoints, _best_map.log) are written by the coordinator only —
    # concurrent writers to a pod-shared save dir corrupt each other
    # (parallel/multihost.is_coordinator; the reference is single-process
    # and writes unconditionally, train_yolov3.py:289-309)
    from videoyolo_tpu.parallel.multihost import is_coordinator, sync_any, sync_flag

    coord = is_coordinator()
    writer = None
    if coord:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(log_dir=os.path.dirname(save_prefix))
        except Exception:
            pass

    logger = logging.getLogger()
    if coord:
        fh = logging.FileHandler(save_prefix + "_train.log")
        logger.addHandler(fh)

    best_map = 0.0
    best_log = save_prefix + "_best_map.log"
    # restore best only when RESUMING (reference gates on FLAGS.resume,
    # :559-564): a fresh run over a leftover best_map.log (e.g. the "0000"
    # scratch prefix that bypasses the overwrite guard) must not inherit a
    # stale bar that suppresses _best.params saves
    resuming = bool(FLAGS.resume) or FLAGS.start_epoch != 0
    if resuming and os.path.exists(best_log):  # restore best (reference :559-564)
        with open(best_log) as f:
            lines = [l for l in f if l.strip()]
            if lines:
                best_map = float(lines[-1].split("\t")[-1])

    metric = get_val_metric(val_dataset, save_prefix)
    global_step = start_epoch * steps_per_epoch

    # graceful preemption: spot/preemptible TPU pods get SIGTERM with a
    # short grace window.  Finish the in-flight step, checkpoint under the
    # standard epoch naming (so `--start_epoch -1` auto-resumes from it),
    # and exit 0 instead of dying mid-write.  The checkpoint holds the
    # mid-epoch state (strictly more progress than any interval save);
    # resume continues at the NEXT epoch — the interrupted epoch's
    # remaining batches are not replayed, the standard epoch-granular
    # tradeoff for this checkpoint format.
    import signal

    preempt = {"flag": False}

    def _on_sigterm(signum, frame):
        preempt["flag"] = True
        logging.warning("SIGTERM: will checkpoint at the next step boundary and exit")

    try:
        prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # not on the main thread (embedded/test harness use)
        prev_sigterm = None

    for epoch in range(start_epoch, FLAGS.epochs):
        if FLAGS.mixup and hasattr(train_dataset, "set_mixup"):
            # disable mixup for the final epochs (reference :574-580)
            train_dataset.set_mixup(epoch < FLAGS.epochs - FLAGS.no_mixup_epochs)
        tic = time.time()
        btic = time.time()
        seen = 0
        profiling = False
        # running-mean loss meters since epoch start, matching the
        # reference's mx.metric.Loss semantics (train_yolov3.py:537-540,
        # 647-650).  Accumulated as lazy device scalars so no step forces a
        # host sync; converted to floats only at log time.
        loss_sums = None
        loss_count = 0
        with mesh:
            def _stage(batch):
                # single-host: sharded device_put; multi-host pods: each
                # process contributes its local slice of the global batch
                dev = {
                    k: v
                    for k, v in batch.items()
                    if k in ("image", "features", "gt_boxes", "gt_ids", "gt_mix", "color")
                }
                return put_global_batch(dev, mesh), batch["label"].shape[0]

            # keep 2 batches in flight on the device: the host->device copy
            # overlaps both the device step and the host pipeline
            # (data/prefetch.py; reference got this from split_and_load +
            # MXNet's async engine, train_yolov3.py:596-606)
            from videoyolo_tpu.data.prefetch import device_prefetch

            for i, (dev_batch, batch_n) in enumerate(
                device_prefetch(iter(train_loader), size=2, transfer=_stage)
            ):
                if FLAGS.profile_dir and epoch == start_epoch:
                    if i == min(10, len(train_loader) - 1):
                        jax.profiler.start_trace(FLAGS.profile_dir)
                        profiling = True
                    elif i == min(20, len(train_loader)) and profiling:
                        jax.profiler.stop_trace()
                        profiling = False
                        logging.info("Wrote device profile to %s", FLAGS.profile_dir)
                state, metrics = train_step(state, dev_batch)
                loss_sums = (
                    metrics
                    if loss_sums is None
                    else {k: loss_sums[k] + v for k, v in metrics.items()}
                )
                loss_count += 1
                seen += batch_n
                global_step += 1
                if FLAGS.log_interval and (i + 1) % FLAGS.log_interval == 0:
                    m = {k: float(v) / loss_count for k, v in loss_sums.items()}
                    rate = FLAGS.log_interval * batch_n / (time.time() - btic)
                    logging.info(
                        "[Epoch %d][Batch %d], LR: %.2E, Speed: %.3f samples/sec, "
                        "ObjLoss=%.3f, BoxCenterLoss=%.3f, BoxScaleLoss=%.3f, ClassLoss=%.3f",
                        epoch, i, float(lr_fn(global_step)), rate,
                        m["obj"], m["center"], m["scale"], m["cls"],
                    )
                    if writer:
                        for k in ("obj", "center", "scale", "cls"):
                            writer.add_scalar(f"loss/{k}", m[k], global_step)
                    btic = time.time()
                if FLAGS.max_epoch_time > 0:
                    cut = (time.time() - tic) / 60 > FLAGS.max_epoch_time
                    if jax.process_count() > 1:
                        # all processes must agree before ANY stops issuing
                        # pjit steps — wall clocks cross the threshold at
                        # different batch indices, and a lone early exit
                        # deadlocks the peers inside the gradient
                        # all-reduce.  Agree on the coordinator's clock at
                        # log-interval boundaries only (same batch index on
                        # every process by the lockstep schedule), keeping
                        # the agreement collective off the steady-state path.
                        check = FLAGS.log_interval or 100
                        cut = (i + 1) % check == 0 and sync_flag(cut)
                    if cut:
                        logging.info("Epoch %d cut off at max_epoch_time", epoch)
                        break
                stop = preempt["flag"]
                if jax.process_count() > 1:
                    # the signal can land on ANY subset of hosts; agree at
                    # log-interval boundaries (same call-site discipline —
                    # and relative order vs the max_epoch_time collective —
                    # on every process) before anyone stops issuing steps
                    stop = (i + 1) % (FLAGS.log_interval or 100) == 0 and sync_any(
                        preempt["flag"]
                    )
                if stop:
                    preempt["stop"] = True
                    break
        if profiling:  # epoch shorter than the capture window
            jax.profiler.stop_trace()
        logging.info(
            "[Epoch %d] done in %.1fs, %.3f samples/sec",
            epoch, time.time() - tic, seen / max(time.time() - tic, 1e-9),
        )

        if preempt.get("stop"):
            from videoyolo_tpu.train.checkpoint import save_variables

            if coord:
                save_variables(
                    f"{save_prefix}_{epoch:04d}.params",
                    {"params": state.params, "batch_stats": state.batch_stats},
                )
            logging.warning(
                "Preempted: wrote %s_%04d.params; resume with --start_epoch -1",
                save_prefix, epoch,
            )
            break

        current_map = 0.0
        if val_loader is not None and FLAGS.val_interval and (epoch + 1) % FLAGS.val_interval == 0:
            names, values = validate(
                model, state, val_loader, val_dataset, metric, eval_step=eval_step
            )
            logging.info(
                "[Epoch %d] Validation: \n%s", epoch,
                "\n".join(f"{n}={v}" for n, v in zip(names, values)),
            )
            current_map = float(values[-1])
            if writer:
                writer.add_scalar("val/mAP", current_map, epoch)

        if coord:
            ckpt_vars = {"params": state.params, "batch_stats": state.batch_stats}
            best_map = save_params(
                save_prefix, ckpt_vars, current_map, best_map, epoch, FLAGS.save_interval
            )
        else:
            best_map = max(best_map, current_map)
    if prev_sigterm is not None:
        signal.signal(signal.SIGTERM, prev_sigterm)
    return state


def _find_pretrained_base():
    """Resolve the ImageNet-pretrained darknet53 .params file, mirroring the
    gluoncv model-zoo cache the reference loads from (darknet.py:101)."""
    import glob

    if FLAGS.pretrained_base_path:
        if not os.path.exists(FLAGS.pretrained_base_path):
            raise FileNotFoundError(FLAGS.pretrained_base_path)
        return FLAGS.pretrained_base_path
    roots = [
        os.path.join(os.environ.get("MXNET_HOME", os.path.expanduser("~/.mxnet")), "models"),
        os.path.join(FLAGS.dataset_root, "weights"),
    ]
    for root in roots:
        found = sorted(glob.glob(os.path.join(root, "darknet53*.params")))
        if found:
            return found[0]
    return None


def _load_pretrained_base(variables, conv_types, example, seed):
    """Load (or 2D->3D inflate) ImageNet darknet53 weights into `variables`.

    Fails loudly when weights are unavailable: silently training from a
    random base (the round-1 behaviour) diverges drastically from the
    reference's pretrained-base default (train_yolov3.py:351,
    darknet.py:101).  Pass --nopretrained_cnn to opt out.
    """
    from videoyolo_tpu.utils.gluon_import import load_gluon_darknet53

    path = _find_pretrained_base()
    if path is None:
        raise RuntimeError(
            "--pretrained_cnn (default) needs ImageNet darknet53 weights but "
            "none were found. Provide --pretrained_base_path, place "
            "darknet53*.params under ~/.mxnet/models or "
            f"{FLAGS.dataset_root}/weights, or pass --nopretrained_cnn to "
            "train the base from scratch."
        )
    if "backbone" not in variables["params"]:
        raise RuntimeError(
            "--pretrained_cnn is not wired for models without a 'backbone' "
            "scope (YOLOv3Temporal builds its base inline); pass "
            "--nopretrained_cnn or warm-start via --resume."
        )
    if FLAGS.s2d_stem or any(int(c) != 2 for c in conv_types):
        # non-standard backbone layout: load the 2D weights into a scratch
        # standard Darknet53 tree, transform (s2d stem refold — models/
        # s2d.py — or 2D->3D inflation, reference three_darknet.py:274-318),
        # then install the transformed subtree
        import jax
        import jax.numpy as jnp

        from videoyolo_tpu.models.darknet import Darknet53

        hw = tuple(example.shape[-3:-1])
        v2 = Darknet53().init(
            jax.random.PRNGKey(seed), jnp.zeros((1,) + hw + (3,), jnp.float32), False
        )
        v2 = load_gluon_darknet53(dict(v2), path, prefix="")
        if FLAGS.s2d_stem:
            from videoyolo_tpu.models.s2d import refold_stem_s2d

            sub = refold_stem_s2d(v2)
        else:
            from videoyolo_tpu.models.inflate import inflate_darknet53_to_3d

            sub = inflate_darknet53_to_3d(
                v2,
                {
                    "params": variables["params"]["backbone"],
                    "batch_stats": variables["batch_stats"]["backbone"],
                },
                tuple(int(c) for c in conv_types),
            )
        variables = {
            k: dict(v) if hasattr(v, "items") else v for k, v in variables.items()
        }
        variables["params"] = dict(variables["params"])
        variables["batch_stats"] = dict(variables["batch_stats"])
        variables["params"]["backbone"] = sub["params"]
        variables["batch_stats"]["backbone"] = sub["batch_stats"]
    else:
        variables = load_gluon_darknet53(variables, path, prefix="backbone")
    logging.info("Loaded ImageNet-pretrained darknet53 base from %s", path)
    return variables


def main(_argv):
    import jax

    window = [int(w) for w in FLAGS.window]
    assert window[0] == 1 or FLAGS.dataset[0] in ("vid", "yt"), (
        "window > 1 requires a video dataset (reference train_yolov3.py:688-689)"
    )
    np.random.seed(FLAGS.seed)

    train_dataset = get_dataset(FLAGS.dataset)
    val_dataset = get_dataset(FLAGS.dataset_val or FLAGS.dataset, val=True)

    # experiment dir convention (reference :714-723)
    save_prefix = os.path.join(
        FLAGS.experiment_root,
        FLAGS.save_prefix,
        f"yolo3_{FLAGS.network}_{'_'.join(FLAGS.dataset)}",
    )
    exp_dir = os.path.dirname(save_prefix)
    if os.path.exists(exp_dir) and not FLAGS.resume and FLAGS.start_epoch == 0 and FLAGS.save_prefix != "0000":
        existing = [f for f in os.listdir(exp_dir) if f.endswith(".params")]
        if existing:
            raise RuntimeError(
                f"Experiment dir {exp_dir} has checkpoints; pass --resume or a new --save_prefix "
                "(reference train_yolov3.py:714-718)"
            )
    os.makedirs(exp_dir, exist_ok=True)

    from videoyolo_tpu.models.factory import yolo3_darknet53, yolo3_no_backbone
    from videoyolo_tpu.train.checkpoint import resume_params

    import jax.numpy as jnp

    classes = train_dataset.classes
    k = window[0] if window[0] > 1 else None
    if FLAGS.features_dir:
        # head-only training over pre-extracted features
        # (reference yolo3_no_backbone, train_yolov3.py:335-343)
        model = yolo3_no_backbone(list(classes))
        s = FLAGS.data_shape
        example = (
            jnp.zeros((1, s // 8, s // 8, 256), jnp.float32),
            jnp.zeros((1, s // 16, s // 16, 512), jnp.float32),
            jnp.zeros((1, s // 32, s // 32, 1024), jnp.float32),
        )
    else:
        import jax.numpy as _jnp

        dtype = _jnp.bfloat16 if FLAGS.dtype == "bf16" else None
        model = yolo3_darknet53(
            list(classes),
            dtype=dtype,
            remat=FLAGS.remat,
            s2d_stem=FLAGS.s2d_stem,
            k=k,
            k_join_type=FLAGS.k_join_type,
            k_join_pos=FLAGS.k_join_pos,
            block_conv_type=FLAGS.block_conv_type,
            rnn_pos=FLAGS.rnn_pos,
            corr_pos=FLAGS.corr_pos,
            corr_d=FLAGS.corr_d or None,
            motion_stream=FLAGS.motion_stream,
            add_type=FLAGS.stream_gating,
            new_model=FLAGS.new_model,
            hierarchical=tuple(int(h) for h in FLAGS.hier),
            h_join_type=FLAGS.h_join_type,
            conv_types=tuple(int(c) for c in FLAGS.conv_types),
            temporal=FLAGS.temp,
            t_out=FLAGS.mult_out,
        )
        shape = (
            (1, FLAGS.data_shape, FLAGS.data_shape, 3)
            if k is None
            else (1, k, FLAGS.data_shape, FLAGS.data_shape, 3)
        )
        example = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(FLAGS.seed), example, train=False)
    if FLAGS.trained_on and FLAGS.resume:
        # finetune path (reference train_yolov3.py:725-729): load params from
        # a model trained on another class set, then weight-surgery the
        # prediction heads onto this dataset's classes, reusing shared names
        from videoyolo_tpu.models.surgery import reset_class

        old_classes = list(get_dataset([FLAGS.trained_on], val=True).classes)
        old_model = yolo3_darknet53(old_classes)
        old_vars = old_model.init(jax.random.PRNGKey(FLAGS.seed), example, train=False)
        restored, start_epoch = resume_params(
            FLAGS.resume, FLAGS.start_epoch, exp_dir, dict(old_vars)
        )
        if restored is None:
            raise FileNotFoundError(FLAGS.resume)
        shared = [c for c in classes if c in old_classes]
        variables = reset_class(restored, old_classes, list(classes), reuse_weights=shared)
        logging.info(
            "Finetuning from %s (%d classes) onto %d classes, %d reused",
            FLAGS.trained_on, len(old_classes), len(classes), len(shared),
        )
    else:
        restored, start_epoch = resume_params(
            FLAGS.resume, FLAGS.start_epoch, exp_dir, dict(variables)
        )
        if restored is not None:
            variables = restored
            logging.info("Resumed params (start_epoch=%d)", start_epoch)
        elif FLAGS.pretrained_cnn and not FLAGS.features_dir:
            # fresh run: warm-start the base network from ImageNet weights
            # (reference default, train_yolov3.py:351 pretrained_base=True)
            variables = _load_pretrained_base(
                variables, FLAGS.conv_types, example, FLAGS.seed
            )

    train_loader, val_loader = get_dataloaders(train_dataset, val_dataset)
    logging.info(
        "Training %s on %s: %d samples, %d steps/epoch, %d device(s)",
        FLAGS.network, FLAGS.dataset, len(train_dataset), len(train_loader), jax.device_count(),
    )
    train(
        model, variables, train_dataset, train_loader, val_loader, val_dataset,
        save_prefix, start_epoch,
    )


if __name__ == "__main__":
    app.run(main)
