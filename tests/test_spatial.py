"""Spatial partitioning (sp) and tensor parallelism (tp) on the virtual
8-device mesh.

The reference's only parallelism is a per-GPU batch split
(train_yolov3.py:596-606).  On TPU the same flax apply also runs with the
image H axis sharded (GSPMD spatial partitioning with automatic halo
exchange — the recipe for scaling ONE high-res image across chips) and
with channels sharded (tensor-parallel serving, parallel/tp.py).  These
tests lock the invariant that makes that safe: sharding is placement only
— outputs must match the replicated apply bitwise-or-close regardless of
the mesh layout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
from videoyolo_tpu.parallel.mesh import (
    assert_spatial_safe,
    make_2d_mesh,
    make_mesh,
    shard_batch,
)
from videoyolo_tpu.parallel.tp import shard_variables_tp, tp_shardings

S = 64       # tp tests: any size works (channels sharded, space untouched)
S_SP = 96    # dp×sp tests: the smallest spatially-safe size (96/32 = 3 rows
             # at the deepest map fit the 3x3 window — assert_spatial_safe)


@pytest.fixture(scope="module")
def small_model():
    model = YOLOv3(num_classes=3)
    x = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def _forward(model, variables):
    """Raw (boxes, scores) — the equivalence surface.  NMS ordering on an
    UNTRAINED model is tie-heavy (scores all near chance), so the reduction-
    order noise a different sharding legitimately introduces (float adds
    reassociate across shards) flips argmax ties; production-relevant
    equality is the pre-NMS tensors, checked to tolerance."""
    return jax.jit(lambda im: model.apply(variables, im, train=False))


def test_make_2d_mesh_layout():
    mesh = make_2d_mesh(8, spatial=4)
    assert mesh.shape == {"data": 2, "space": 4}
    assert make_2d_mesh(8, spatial=1).shape == {"data": 8, "space": 1}
    with pytest.raises(AssertionError):
        make_2d_mesh(8, spatial=3)


def test_spatial_safe_guard():
    """The dp×sp envelope guard: deepest map must fit the conv window (the
    observed XLA CPU SPMD wrong-collective case is documented on the
    helper's docstring)."""
    assert_spatial_safe(96, 2)       # 96/32 = 3 >= 3
    assert_spatial_safe(416, 4)
    assert_spatial_safe(64, 1)       # sp=1 is always fine
    with pytest.raises(AssertionError):
        assert_spatial_safe(64, 2)   # 64/32 = 2 < 3


def test_shard_batch_spatial_layout():
    mesh = make_2d_mesh(8, spatial=2)
    batch = {
        "image": np.zeros((4, S, S, 3), np.float32),
        "gt_boxes": np.zeros((4, 8, 4), np.float32),
    }
    out = shard_batch(batch, mesh)
    # image: B over data(4), H over space(2); gt: B only
    assert out["image"].addressable_shards[0].data.shape == (1, S // 2, S, 3)
    assert out["gt_boxes"].addressable_shards[0].data.shape == (1, 8, 4)


def test_shard_batch_spatial_temporal_shards_h_not_k():
    """Temporal (B,K,H,W,C) batches spatially shard H (dim 2), never the
    window axis K — an odd K=3 window under 2-way spatial must still
    device_put cleanly with H halved per shard."""
    mesh = make_2d_mesh(8, spatial=2)
    batch = {"image": np.zeros((4, 3, S, S, 3), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["image"].addressable_shards[0].data.shape == (1, 3, S // 2, S, 3)


def test_detect_spatial_matches_replicated():
    """Forward + decode with the image H axis sharded 2-way (and B 4-way)
    must equal the single-sharding result: GSPMD's conv halo exchange is
    semantically invisible (inside the assert_spatial_safe envelope)."""
    model = YOLOv3(num_classes=3)
    x = jnp.asarray(np.random.RandomState(0).rand(4, S_SP, S_SP, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    step = _forward(model, variables)
    want = jax.device_get(step(x))

    mesh = make_2d_mesh(8, spatial=2)  # dp=4 × sp=2
    vrep = jax.device_put(variables, NamedSharding(mesh, P()))
    xs = shard_batch({"image": np.asarray(x)}, mesh)["image"]
    got = jax.device_get(_forward(model, vrep)(xs))
    for g, w in zip(got, want):
        # box decode runs raw scales through exp(), amplifying the legit
        # reduction-order noise of resharded conv sums — 1e-3 rel is float
        # reassociation, not a halo bug (the bug mode was an exact xN scale)
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=1e-4)
    # the full serving step (decode+NMS) still runs sharded end-to-end
    ids, sc, bb = jax.jit(
        lambda im: postprocess(*model.apply(vrep, im, train=False))
    )(xs)
    assert ids.shape[0] == 4 and bb.shape[-1] == 4


def test_train_step_spatial_matches_dp():
    """One full training step (targets + loss + backward + SGD + global BN)
    under dp×sp sharding matches the pure-dp metrics — the dryrun contract's
    2D-mesh path, locked numerically."""
    from videoyolo_tpu.train.lr import lr_schedule
    from videoyolo_tpu.train.step import create_train_state, make_train_step

    model = YOLOv3(num_classes=3)
    lr_fn = lr_schedule("cosine", 1e-3, steps_per_epoch=4, epochs=1)
    rng = np.random.RandomState(1)
    gt_boxes = np.full((4, 8, 4), -1.0, np.float32)
    gt_ids = np.full((4, 8, 1), -1.0, np.float32)
    for b in range(4):
        x1, y1 = rng.uniform(0, S_SP // 2, 2)
        gt_boxes[b, 0] = [x1, y1, x1 + 12, y1 + 9]
        gt_ids[b, 0, 0] = rng.randint(0, 3)
    host = {
        "image": rng.rand(4, S_SP, S_SP, 3).astype(np.float32),
        "gt_boxes": gt_boxes,
        "gt_ids": gt_ids,
    }
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S_SP, S_SP, 3)), train=False
    )
    step = jax.jit(make_train_step(model, num_classes=3))

    metrics = {}
    for tag, mesh in (
        ("dp", make_mesh(4)),                  # batch 4 over 4 chips
        ("dpsp", make_2d_mesh(8, spatial=2)),  # same dp=4, + H sharded 2-way
    ):
        state = jax.device_put(
            create_train_state(model, variables, lr_fn),
            NamedSharding(mesh, P()),
        )
        _, m = step(state, shard_batch(host, mesh))
        metrics[tag] = {k: float(v) for k, v in m.items()}
    for k, v in metrics["dp"].items():
        assert np.isfinite(v)
        np.testing.assert_allclose(metrics["dpsp"][k], v, rtol=1e-4), k


def test_tp_shardings_rule(small_model):
    """Conv kernels shard on out-channels; kernels whose out-channels don't
    divide fall back to input-channel (reduce-parallel) sharding — the YOLO
    prediction convs; channel vectors shard on dim 0; everything with no
    divisible dim replicates."""
    _, variables = small_model
    mesh = make_mesh(8, axis_names=("model",))
    sh = tp_shardings(variables, mesh)
    kernels = [
        (p, x)
        for p, x in jax.tree_util.tree_leaves_with_path(variables["params"])
        if x.ndim >= 3
    ]
    specs = dict(jax.tree_util.tree_leaves_with_path(sh["params"]))
    assert kernels
    for p, x in kernels:
        if x.shape[-1] % 8 == 0:
            assert specs[p].spec == P(*((None,) * (x.ndim - 1) + ("model",))), p
    # a (1,1,cin,cout) prediction-style kernel with cout=75 (3*(5+20), the
    # VOC head — not divisible by 8) and divisible cin must shard on cin
    odd = {
        "params": {
            "v": jnp.zeros((7,)),
            "pred": jnp.zeros((1, 1, 64, 75)),
            "k": jnp.zeros((3, 3, 4, 12)),
        }
    }
    so = tp_shardings(odd, mesh)
    assert so["params"]["v"].spec == P()  # 7 % 8 != 0 -> replicated
    assert so["params"]["pred"].spec == P(None, None, "model", None)
    assert so["params"]["k"].spec == P()  # neither 12 nor 4 divides 8


def test_detect_tp_matches_replicated(small_model):
    """Tensor-parallel serving: variables channel-sharded over an 8-way
    "model" axis, inputs/outputs replicated — results must match the
    replicated apply (XLA inserts the per-conv collectives)."""
    model, variables = small_model
    step = _forward(model, variables)
    x = jnp.asarray(np.random.RandomState(2).rand(1, S, S, 3), jnp.float32)
    want = jax.device_get(step(x))

    mesh = make_mesh(8, axis_names=("model",))
    tpv = shard_variables_tp(variables, mesh)
    got = jax.device_get(_forward(model, tpv)(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)


def test_detect_tp_odd_head_matches_replicated():
    """The reduce-parallel fallback numerically: num_classes=2 makes the
    prediction convs 3*(5+2)=21 wide (not divisible by 8), so they shard on
    their input channels and GSPMD closes each level with a psum — results
    must still match the replicated apply."""
    model = YOLOv3(num_classes=2)
    x0 = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x0, train=False)
    mesh = make_mesh(8, axis_names=("model",))
    sh = tp_shardings(variables, mesh)
    # the three prediction kernels must have taken the cin fallback
    kernel_specs = [
        s.spec
        for p, s in jax.tree_util.tree_leaves_with_path(sh["params"])
        if "prediction" in str(p) and "kernel" in str(p)
    ]
    assert kernel_specs and all(
        sp == P(None, None, "model", None) for sp in kernel_specs
    ), kernel_specs

    x = jnp.asarray(np.random.RandomState(5).rand(1, S, S, 3), jnp.float32)
    want = jax.device_get(_forward(model, variables)(x))
    got = jax.device_get(_forward(model, shard_variables_tp(variables, mesh))(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)


def test_tp_int8_matches_replicated(small_model):
    """The int8 serving path tensor-parallelizes by the same rule (qkernel/
    wscale channel-sharded); scores must match the replicated int8 apply."""
    from videoyolo_tpu.ops.quantize import quantize_static

    model, variables = small_model
    x = jnp.asarray(np.random.RandomState(3).rand(1, S, S, 3), jnp.float32)
    qmodel, qvars = quantize_static(model, variables, [x])
    step = _forward(qmodel, qvars)
    want = jax.device_get(step(x))

    mesh = make_mesh(8, axis_names=("model",))
    got = jax.device_get(_forward(qmodel, shard_variables_tp(qvars, mesh))(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)
