"""Offline backbone feature extraction CLI.

Capability parity with `/root/reference/extract_base_features.py` (flags
:34-54, extract loop :115-159): runs the DarkNet-53 backbone over a dataset
and saves the three FPN feature maps per frame as `<id>_F1/_F2/_F3.npy`,
consumed by the no-backbone head (`--features_dir`) and feature-mode datasets.

TPU-native: the three stage slices (`features[:15]/[15:24]/[24:]`,
:131-137) are exactly the Darknet53 module's route outputs; the sweep is one
jitted forward sharded over the device mesh (BASELINE "sharded pmap over
clips").  Features are saved channel-last (H, W, C).
"""
from __future__ import annotations

import glob
import logging
import os

import numpy as np
from absl import app, flags

logging.basicConfig(level=logging.INFO)

FLAGS = flags.FLAGS

flags.DEFINE_string("network", "darknet53", "Base network name: darknet53 or mobilenet1.0 (reference extract_base_features.py:187-188).")
flags.DEFINE_string("dataset", "voc", "Dataset or .jpg image or .mp4 video or .txt list.")
flags.DEFINE_string("dataset_root", "datasets", "Root directory holding the datasets")
flags.DEFINE_string("model_path", "", "Optional params file to load backbone weights from.")
flags.DEFINE_string("save_dir", "features", "Save directory for feature files.")
flags.DEFINE_integer("batch_size", 1, "Batch size for extraction.")
flags.DEFINE_integer("data_shape", 416, "Input data shape.")
flags.DEFINE_float(
    "frames", 0.04,
    "Per video frame subsampling: <1 fraction (every 1/frames th), >1 count, =1 all.",
)
flags.DEFINE_list("gpus", [0], "Kept for reference CLI parity; devices come from JAX.")
flags.DEFINE_integer("num_workers", 8, "Data loading workers.")
flags.DEFINE_bool(
    "skip_existing", False,
    "Resume an interrupted sweep: samples whose _F1/_F2/_F3.npy files all "
    "exist are neither decoded nor re-extracted (beyond the reference, "
    "which always restarts from scratch).",
)


def get_dataset(dataset_name):
    from videoyolo_tpu.data import DetectSet, VOCDetection

    # lowercase only for KEYWORD/extension dispatch; filesystem paths must
    # keep their case (Frame001.JPG, /data/Lists/videos.txt)
    name = dataset_name
    lowered = dataset_name.lower() if isinstance(dataset_name, str) else dataset_name
    if lowered == "voc":
        return VOCDetection(
            root=os.path.join(FLAGS.dataset_root, "PascalVOC", "VOCdevkit"),
            splits=[(2007, "trainval"), (2012, "trainval")],
            inference=True,
        )
    if lowered == "coco":
        from videoyolo_tpu.data.mscoco import COCODetection

        return COCODetection(
            root=os.path.join(FLAGS.dataset_root, "MSCoco"),
            splits=["instances_train2017"],
            use_crowd=False,
            inference=True,
        )
    if lowered == "det":
        from videoyolo_tpu.data.imgnetdet import ImageNetDetection

        return ImageNetDetection(
            root=os.path.join(FLAGS.dataset_root, "ImageNetDET", "ILSVRC"),
            splits=["train"],
            allow_empty=True,
            inference=True,
        )
    if lowered == "vid":
        from videoyolo_tpu.data.imgnetvid import ImageNetVidDetection

        # reference frames semantics (extract_base_features.py:44-47):
        # <1 = fraction (every 1/frames'th frame), >1 = COUNT per video
        every = max(1, int(round(1.0 / FLAGS.frames))) if 0 < FLAGS.frames < 1 else 1
        fpv = int(FLAGS.frames) if FLAGS.frames > 1 else 0
        return ImageNetVidDetection(
            root=os.path.join(FLAGS.dataset_root, "ImageNetVID", "ILSVRC"),
            splits=[(2017, "train")],
            allow_empty=True,
            every=every,
            frames_per_video=fpv,
            inference=True,
        )
    if lowered.endswith(".txt"):
        with open(name) as f:
            files = [l.rstrip() for l in f if l.strip()]
        if files and files[0].endswith(".mp4"):
            from videoyolo_tpu.utils.video import video_to_frames

            img_list = []
            for file in files:
                frames_dir = video_to_frames(file, os.path.join("data", "tmp"))
                img_list += glob.glob(frames_dir + "/**/*.jpg", recursive=True)
            return DetectSet(img_list)
        return DetectSet(files)
    if lowered.endswith((".jpg", ".jpeg", ".png")):
        return DetectSet([name])
    if lowered.endswith(".mp4"):
        from videoyolo_tpu.utils.video import video_to_frames

        frames_dir = video_to_frames(name, os.path.join("data", "tmp"))
        return DetectSet(sorted(glob.glob(frames_dir + "/**/*.jpg", recursive=True)))
    raise NotImplementedError(f"Dataset: {dataset_name} not implemented.")


def extract(save_dir, dataset, loader):
    import jax
    import jax.numpy as jnp

    from videoyolo_tpu.train.checkpoint import load_variables

    if FLAGS.network.startswith("mobilenet"):
        from videoyolo_tpu.models.mobilenet import get_mobilenet

        mult = float(FLAGS.network.replace("mobilenet", "") or 1.0)
        model = get_mobilenet(version=1, multiplier=mult, return_features=True)
    else:
        from videoyolo_tpu.models.darknet import Darknet53

        model = Darknet53()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, FLAGS.data_shape, FLAGS.data_shape, 3), jnp.float32),
        train=False,
    )
    if FLAGS.model_path:
        loaded = load_variables(FLAGS.model_path)
        # accept either a bare backbone checkpoint or a full-model one
        if "params" in loaded and "backbone" in loaded["params"]:
            variables = {
                "params": loaded["params"]["backbone"],
                "batch_stats": loaded.get("batch_stats", {}).get("backbone", {}),
            }
        else:
            variables = loaded
        logging.info("Loaded backbone weights from %s", FLAGS.model_path)

    # sharded sweep: batch axis split over every chip on the mesh
    # (the BASELINE's "sharded pmap over clips"; one program, psum-free)
    from videoyolo_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch

    mesh = make_mesh()
    variables = jax.device_put(variables, replicated_sharding(mesh))

    @jax.jit
    def step(images):
        return model.apply(variables, images, train=False)

    os.makedirs(save_dir, exist_ok=True)
    n_dev = len(mesh.devices.flat)

    def _stage(batch):
        # pad the tail batch to a shardable multiple, shard, and ship —
        # runs in the prefetch thread so transfers overlap the .npy writes
        imgs = batch["image"]
        n = imgs.shape[0]
        pad = (-n) % n_dev
        if pad:
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
        with mesh:
            images = shard_batch({"image": imgs}, mesh)["image"]
        return images, n, batch["idx"]

    from videoyolo_tpu.data.prefetch import device_prefetch

    for images, n, batch_idx in device_prefetch(iter(loader), size=2, transfer=_stage):
        with mesh:
            f1, f2, f3 = [np.asarray(f)[:n] for f in step(images)]
        for i in range(f1.shape[0]):
            idx = int(batch_idx[i])
            img_path = dataset.sample_path(idx)
            # splitext, not a fixed [:-4] slice: .JPEG/.jpeg inputs would
            # otherwise save as "<name>.J_F1.npy" and never be found by the
            # features_dir loaders (pascalvoc.py / imgnetvid.py strip
            # extensions properly)
            p1, p2, p3 = _feature_paths(save_dir, img_path)
            if FLAGS.dataset == "vid":
                os.makedirs(os.path.dirname(p1), exist_ok=True)
            _atomic_save(p1, f1[i])
            _atomic_save(p2, f2[i])
            _atomic_save(p3, f3[i])


def _feature_paths(save_dir, img_path):
    """The three .npy paths a sample saves to (and `--skip_existing` probes).
    VID keeps the clip directory so frame ids stay unique across clips."""
    file_id = os.path.splitext(os.path.basename(img_path))[0]
    if FLAGS.dataset == "vid":
        file_id = os.path.join(img_path.split(os.sep)[-2], file_id)
    return tuple(os.path.join(save_dir, file_id + s) for s in ("_F1.npy", "_F2.npy", "_F3.npy"))


def _atomic_save(path, arr):
    """np.save via tmp + rename: a kill mid-write must leave no truncated
    .npy — the features_dir loaders trust any file that exists, so a partial
    file would poison the downstream no-backbone training run."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, arr)
    os.replace(tmp, path)


def main(_argv):
    from videoyolo_tpu.data.loader import DetectionLoader
    from videoyolo_tpu.data.transforms import YOLO3DefaultInferenceTransform

    dataset = get_dataset(FLAGS.dataset)
    dataset._transform = YOLO3DefaultInferenceTransform(FLAGS.data_shape, FLAGS.data_shape)
    # the sweep is resize+normalize only: route whole batches through the C++
    # decode core when every sample is a JPEG (videoyolo_tpu/native)
    probe = [dataset.sample_path(i) for i in range(min(len(dataset), 8))]
    all_jpeg = all(p.lower().endswith((".jpg", ".jpeg")) for p in probe)
    sampler = None
    num_samples = None
    if FLAGS.skip_existing:
        # resume: filter BEFORE the loader so finished samples are never
        # decoded, not just never re-saved
        missing = [
            i
            for i in range(len(dataset))
            if not all(
                os.path.exists(p)
                for p in _feature_paths(FLAGS.save_dir, dataset.sample_path(i))
            )
        ]
        if not missing:
            logging.info("All %d samples already extracted in %s", len(dataset), FLAGS.save_dir)
            return
        logging.info(
            "Resuming: %d/%d samples still to extract", len(missing), len(dataset)
        )
        sampler = lambda epoch: np.asarray(missing)  # noqa: E731
        num_samples = len(missing)
    loader = DetectionLoader(
        dataset,
        batch_size=FLAGS.batch_size,
        num_workers=FLAGS.num_workers,
        native_decode=(FLAGS.data_shape, FLAGS.data_shape) if all_jpeg else None,
        sampler=sampler,
        num_samples=num_samples,
    )
    extract(FLAGS.save_dir, dataset, loader)
    logging.info("Saved features for %d samples to %s", len(dataset), FLAGS.save_dir)


if __name__ == "__main__":
    app.run(main)
