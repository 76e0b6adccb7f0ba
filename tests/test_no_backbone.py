"""No-backbone (pre-extracted feature) training path: NB transforms,
feature collate, train/eval steps over (f1,f2,f3) routes
(reference yolo3_no_backbone + YOLO3NBVideo* transforms + features_dir)."""
import jax
import jax.numpy as jnp
import numpy as np

from videoyolo_tpu.data.loader import collate_features
from videoyolo_tpu.data.transforms import (
    YOLO3NBInferenceTransform,
    YOLO3NBTrainTransform,
)
from videoyolo_tpu.models.factory import yolo3_no_backbone
from videoyolo_tpu.train.lr import lr_schedule
from videoyolo_tpu.train.step import create_train_state, make_eval_step, make_train_step

S = 64


def _feats(rs, b=1):
    return (
        rs.rand(b, S // 8, S // 8, 256).astype(np.float32),
        rs.rand(b, S // 16, S // 16, 512).astype(np.float32),
        rs.rand(b, S // 32, S // 32, 1024).astype(np.float32),
    )


def test_nb_transforms_rescale_boxes_only():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (100, 200, 3), np.uint8)
    f1, f2, f3 = (f[0] for f in _feats(rs))
    bbox = np.array([[20.0, 10.0, 100.0, 50.0, 2.0]])
    o1, o2, o3, out = YOLO3NBTrainTransform(S, S)(img, f1, f2, f3, bbox)
    np.testing.assert_array_equal(o1, f1)  # features untouched
    np.testing.assert_allclose(out[0, :4], [20 * S / 200, 10 * S / 100, 100 * S / 200, 50 * S / 100])
    *_, out2, idx = YOLO3NBInferenceTransform(S, S)(img, f1, f2, f3, bbox, 7)
    assert idx == 7
    np.testing.assert_allclose(out2[:, :4], out[:, :4])


def test_collate_features():
    rs = np.random.RandomState(1)
    samples = [
        (*(f[0] for f in _feats(rs)), np.array([[1, 2, 30, 40, 0]]), i)
        for i in range(3)
    ]
    batch = collate_features(samples, max_boxes=8)
    assert batch["features"][0].shape == (3, S // 8, S // 8, 256)
    assert batch["gt_boxes"].shape == (3, 8, 4)
    assert batch["idx"].tolist() == [0, 1, 2]


def test_nb_train_and_eval_step():
    rs = np.random.RandomState(2)
    model = yolo3_no_backbone(4)
    feats = tuple(jnp.asarray(f) for f in _feats(rs, b=2))
    v = model.init(jax.random.PRNGKey(0), feats, train=False)
    state = create_train_state(
        model, v, lr_schedule("step", 1e-3, steps_per_epoch=2, epochs=1)
    )
    step = make_train_step(model, num_classes=4)
    gt_boxes = np.full((2, 4, 4), -1.0, np.float32)
    gt_ids = np.full((2, 4, 1), -1.0, np.float32)
    gt_boxes[:, 0] = [5, 5, 30, 30]
    gt_ids[:, 0] = 1
    batch = {"features": feats, "gt_boxes": gt_boxes, "gt_ids": gt_ids}
    state, metrics = jax.jit(step)(state, batch)
    assert all(np.isfinite(float(x)) for x in metrics.values())

    eval_step = make_eval_step(model)
    ids, scores, boxes = eval_step(state.params, state.batch_stats, feats)
    assert boxes.shape == (2, 100, 4)


def test_grad_accumulation_close_to_plain():
    """accum_steps=2 over the same data approximates the single-step update;
    exact equality is impossible with BatchNorm (micro-batch statistics),
    so assert closeness and finiteness."""
    rs = np.random.RandomState(3)
    feats = tuple(
        jnp.asarray(rs.rand(4, s, s, c), jnp.float32)
        for s, c in ((S // 8, 256), (S // 16, 512), (S // 32, 1024))
    )
    model = yolo3_no_backbone(4)
    v = model.init(jax.random.PRNGKey(0), tuple(f[:1] for f in feats), train=False)
    gt_boxes = np.full((4, 4, 4), -1.0, np.float32)
    gt_ids = np.full((4, 4, 1), -1.0, np.float32)
    gt_boxes[:, 0] = [5, 5, 30, 30]
    gt_ids[:, 0] = 1
    batch = {"features": feats, "gt_boxes": gt_boxes, "gt_ids": gt_ids}
    lr = lr_schedule("step", 1e-3, steps_per_epoch=2, epochs=1)
    s1 = create_train_state(model, v, lr)
    s2 = create_train_state(model, v, lr)
    s1, m1 = jax.jit(make_train_step(model, num_classes=4))(s1, batch)
    s2, m2 = jax.jit(make_train_step(model, num_classes=4, accum_steps=2))(s2, batch)
    assert all(np.isfinite(float(x)) for x in m2.values())
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 0.05
    assert int(s2.step) == 1  # one optimizer update despite two micro-steps
