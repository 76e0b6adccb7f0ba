"""Detection / evaluation CLI.

Capability parity with `/root/reference/detect_yolo3.py` (flag surface
:41-118, pipeline: detect :198 -> save_predictions :275 -> load_predictions
:333 -> visualise :537 -> evaluate :659), re-built on the TPU-native stack:
the device program is one jitted forward+decode+NMS step; predictions are
cached to the same `pred/*.txt` format (`img_path,cls,score,x1,y1,x2,y2`,
boxes normalized by data_shape) so cached runs skip the device entirely.
"""
from __future__ import annotations

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
flags.DEFINE_boolean("metric_agnostic", False, "make the metric class agnostic?")
flags.DEFINE_list("gpus", [0], "Kept for reference CLI parity; devices come from JAX.")
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
    if ds in ("vid", "yt", "comb"):
        raise NotImplementedError(
            f"dataset '{ds}' loader not yet built in the TPU port "
            "(reference datasets/{imgnetvid,youtubebb,combined}.py)"
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

    from videoyolo_tpu.models.factory import yolo3_darknet53
    from videoyolo_tpu.train.checkpoint import load_variables

    model = yolo3_darknet53(num_classes, agnostic=FLAGS.model_agnostic)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, FLAGS.data_shape, FLAGS.data_shape, 3), jnp.float32),
        train=False,
    )
    if FLAGS.model_path and os.path.exists(FLAGS.model_path):
        variables = load_variables(FLAGS.model_path, dict(variables))
        logging.info("Loaded params from %s", FLAGS.model_path)
    elif FLAGS.model_path:
        raise FileNotFoundError(FLAGS.model_path)
    else:
        logging.warning("No model_path given — using randomly initialised params")
    return model, variables


def detect(model, variables, dataset, loader, max_do=-1):
    """Run the jitted device step over the loader; returns {img_path: [[cls,
    score, x1..y2 normalized]]} (reference detect_yolo3.py:198-273)."""
    import jax

    from videoyolo_tpu.models.yolo3 import postprocess

    shape = FLAGS.data_shape

    @jax.jit
    def step(images):
        boxes, scores = model.apply(variables, images, train=False)
        ids, sc, bb = postprocess(boxes, scores, nms_thresh=0.45, nms_topk=400)
        bb = bb.clip(0, shape)
        return ids, sc, bb

    boxes_out = {}
    if max_do < 0:
        max_do = len(dataset)
    done = 0
    for batch in loader:
        ids, sc, bb = [np.asarray(x) for x in step(batch["image"])]
        for i in range(ids.shape[0]):
            if done >= max_do:
                break
            sidx = int(batch["idx"][i])
            file = dataset.sample_path(sidx)
            valid = np.where(ids[i].flat >= 0)[0]
            box = bb[i][valid, :] / shape  # normalise
            cls = ids[i].flat[valid].astype(int)
            score = sc[i].flat[valid]
            boxes_out.setdefault(file, [])
            for c, s, b in zip(cls, score, box):
                boxes_out[file].append([int(c), float(s)] + [float(v) for v in b])
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


def save_predictions(save_dir, dataset, boxes, max_do=-1, agnostic=False):
    """pred/*.txt cache, reference format (detect_yolo3.py:275-331)."""
    save_dir = os.path.join(save_dir, "pred_ag" if agnostic else "pred")
    os.makedirs(save_dir, exist_ok=True)
    if max_do < 0:
        max_do = len(dataset)
    for idx in range(min(len(dataset), max_do)):
        img_path = dataset.sample_path(idx)
        fid = _file_id(dataset, img_path, save_dir)
        with open(os.path.join(save_dir, fid + ".txt"), "w") as f:
            for box in boxes.get(img_path, []):
                f.write(
                    "{},{},{},{},{},{},{}\n".format(
                        img_path, box[0], box[1], box[2], box[3], box[4], box[5]
                    )
                )
    return save_dir


def load_predictions(save_dir, dataset, max_do=-1, agnostic=False):
    """Reload the txt cache; None if any file missing
    (detect_yolo3.py:333-448)."""
    save_dir = os.path.join(save_dir, "pred_ag" if agnostic else "pred")
    if not os.path.exists(save_dir):
        return None
    if max_do < 0:
        max_do = len(dataset)
    boxes = {}
    for idx in range(min(len(dataset), max_do)):
        img_path = dataset.sample_path(idx)
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
            gt = gt[gt[:, 4] >= 0] if gt.size else gt
            if len(gt):
                img = cv_plot_bbox(
                    img, gt[:, :4], labels=gt[:, 4],
                    class_names=getattr(dataset, "classes", None) or None,
                )
        cv2.imwrite(
            os.path.join(out_dir, os.path.basename(img_path)), img[:, :, ::-1]
        )
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
    raise NotImplementedError(
        f"metric '{metric_name}' not yet built (reference metrics/)"
    )


def evaluate(metrics, dataset, predictions):
    """Update metrics from normalized cached predictions
    (detect_yolo3.py:659-696)."""
    from videoyolo_tpu.data.base import read_image

    for idx in range(len(dataset)):
        img_path = dataset.sample_path(idx)
        img, y, _ = dataset[idx]
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
            metric.update(det_bboxes, det_ids, det_scores, gt_bboxes, gt_ids, gt_difficults)
    return [m.get() for m in metrics]


def main(_argv):
    from videoyolo_tpu.data.loader import DetectionLoader
    from videoyolo_tpu.data.transforms import YOLO3DefaultInferenceTransform

    window = [int(w) for w in FLAGS.window]
    assert window[0] == 1 or FLAGS.dataset[0] in ("vid", "yt"), (
        "window > 1 requires a video dataset (reference detect_yolo3.py:805-806)"
    )

    dataset = get_dataset(FLAGS.dataset)
    trained_on = get_dataset([FLAGS.trained_on]) if FLAGS.trained_on else dataset
    classes = trained_on.classes if trained_on.classes else ["object"]

    save_dir = os.path.join(FLAGS.save_dir, FLAGS.save_prefix)
    os.makedirs(save_dir, exist_ok=True)

    predictions = load_predictions(save_dir, dataset, FLAGS.max_do, FLAGS.model_agnostic)
    if predictions is None:
        dataset._transform = YOLO3DefaultInferenceTransform(FLAGS.data_shape, FLAGS.data_shape)
        loader = DetectionLoader(
            dataset, batch_size=FLAGS.batch_size, num_workers=FLAGS.num_workers
        )
        model, variables = get_net_and_params(len(classes))
        boxes = detect(model, variables, dataset, loader, FLAGS.max_do)
        save_predictions(save_dir, dataset, boxes, FLAGS.max_do, FLAGS.model_agnostic)
        dataset._transform = None
        predictions = boxes

    if FLAGS.visualise:
        visualise_predictions(save_dir, dataset, classes, predictions)

    if dataset.classes:  # labelled dataset -> evaluate
        metrics = [get_metric(dataset, m, FLAGS.data_shape) for m in FLAGS.metrics]
        results = evaluate(metrics, dataset, predictions)
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
