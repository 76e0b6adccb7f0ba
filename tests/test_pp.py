"""Pipeline-parallel serving (parallel/pp.py): the backbone|head split at
the route boundary is placement-only — pipelined detections must match the
single-device apply, f32 and int8, and the two stages must really live on
different devices.  The reference has no pipeline mode (its multi-GPU path
replicates the whole model, train_yolov3.py:596-606)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
from videoyolo_tpu.parallel.pp import PipelinedDetector, split_backbone_variables

S = 64


@pytest.fixture(scope="module")
def model_and_vars():
    model = YOLOv3(num_classes=3)
    x = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_split_partitions_all_collections(model_and_vars):
    model, variables = model_and_vars
    bvars, hvars = split_backbone_variables(variables)
    assert "conv0" in bvars["params"]          # darknet child names, unprefixed
    assert "backbone" not in hvars["params"]
    n = lambda t: sum(x.size for x in jax.tree_util.tree_leaves(t))
    assert n(bvars) + n(hvars) == n(variables)  # nothing dropped or doubled


def test_pipelined_matches_single_device(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(0).rand(2, S, S, 3), jnp.float32)
    want = jax.device_get(
        jax.jit(lambda im: postprocess(*model.apply(variables, im, train=False)))(x)
    )
    pipe = PipelinedDetector(model, variables)
    got = jax.device_get(pipe.step(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)
    # the stages really live on the two devices
    assert pipe.devices[0] != pipe.devices[1]


def test_pipelined_iterator_order(model_and_vars):
    model, variables = model_and_vars
    rs = np.random.RandomState(1)
    batches = [jnp.asarray(rs.rand(1, S, S, 3), jnp.float32) for _ in range(3)]
    pipe = PipelinedDetector(model, variables)
    outs = list(pipe.detect(iter(batches)))
    assert len(outs) == 3
    for b, (ids, sc, bb) in zip(batches, outs):
        want = pipe.step(b)
        for g, w in zip((ids, sc, bb), want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w))


def test_pipelined_int8(model_and_vars):
    from videoyolo_tpu.ops.quantize import quantize_static

    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(2).rand(1, S, S, 3), jnp.float32)
    qmodel, qvars = quantize_static(model, variables, [x])
    want = jax.device_get(
        jax.jit(lambda im: postprocess(*qmodel.apply(qvars, im, train=False)))(x)
    )
    got = jax.device_get(PipelinedDetector(qmodel, qvars).step(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)
