"""serving.py: export -> reload -> identical detections, f32 and int8."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
from videoyolo_tpu.serving import export_detector, load_detector


@pytest.fixture(scope="module")
def small_model():
    model = YOLOv3(num_classes=3)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_export_reload_matches_direct(small_model, tmp_path):
    model, variables = small_model
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 96, 96, 3).astype(np.float32))

    path = export_detector(
        model, variables, str(tmp_path / "det.stablehlo"), batch_size=2, size=96
    )
    serve = load_detector(path)
    ids, scores, boxes = serve(x)

    want = postprocess(*model.apply(variables, x, train=False))
    np.testing.assert_allclose(np.asarray(ids), np.asarray(want[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(want[1]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(want[2]), rtol=1e-4, atol=1e-3)


def test_export_int8_static(small_model, tmp_path):
    import dataclasses

    from videoyolo_tpu.ops.quantize import (
        calibrate_detector_variables,
        quantize_detector_variables,
    )

    model, variables = small_model
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(1, 96, 96, 3).astype(np.float32))
    qvars = quantize_detector_variables(variables)
    qvars = calibrate_detector_variables(
        dataclasses.replace(model, quant=True), qvars, [x]
    )
    qmodel = dataclasses.replace(model, quant="static")

    path = export_detector(
        qmodel, qvars, str(tmp_path / "det_int8.stablehlo"), batch_size=1, size=96
    )
    ids, scores, boxes = load_detector(path)(x)
    want = postprocess(*qmodel.apply(qvars, x, train=False))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(want[1]), rtol=1e-5, atol=1e-6)


def test_export_temporal_window(tmp_path):
    """Temporal export (reference has no serving export at all): a YOLOv3T
    k=3 graph exports with window=3 — the artifact takes (B, 3, S, S, 3)
    and matches the direct apply through NMS."""
    from videoyolo_tpu.models.yolo3_temporal import YOLOv3T

    model = YOLOv3T(num_classes=3, k=3, k_join_type="max", k_join_pos="late")
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(1, 3, 96, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    path = export_detector(
        model, variables, str(tmp_path / "det_k3.stablehlo"),
        batch_size=1, size=96, window=3,
    )
    ids, scores, boxes = load_detector(path)(x)
    want = postprocess(*model.apply(variables, x, train=False))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(want[1]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(want[2]), rtol=1e-4, atol=1e-3)


def test_export_temporal_t_out_folds_batch(tmp_path):
    """t_out export: YOLOv3Temporal per-frame outputs come back offset-major
    with leading dim B*t, matching detect()'s own T-folding."""
    from videoyolo_tpu.models.yolo3_temporal import YOLOv3Temporal

    model = YOLOv3Temporal(num_classes=3, t=5, corr_d=2, t_out=True)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(1, 5, 96, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    path = export_detector(
        model, variables, str(tmp_path / "det_t5.stablehlo"),
        batch_size=1, size=96, window=5,
    )
    ids, scores, boxes = load_detector(path)(x)
    assert ids.shape[0] == 5  # B*t

    b, s = model.apply(variables, x, train=False)
    bt = b.shape[0] * b.shape[1]
    want = postprocess(b.reshape((bt,) + b.shape[2:]), s.reshape((bt,) + s.shape[2:]))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(want[1]), rtol=1e-5, atol=1e-6)


def test_bucketed_detector_matches_direct(small_model):
    """BucketedDetector pads requests to fixed bucket shapes and slices the
    pad back off: any request size must return exactly the direct apply's
    detections (pad rows can't leak — NMS is per image)."""
    from videoyolo_tpu.serving import BucketedDetector

    model, variables = small_model
    det = BucketedDetector(model, variables, buckets=(1, 2, 4))
    rs = np.random.RandomState(1)
    for n in (1, 3, 4):
        x = jnp.asarray(rs.rand(n, 96, 96, 3).astype(np.float32))
        got = det.detect(x)
        want = postprocess(*model.apply(variables, x, train=False))
        assert got[0].shape[0] == n
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-4)


def test_bucketed_detector_chunks_large_requests(small_model):
    """Requests beyond the largest bucket split into chunks and concatenate
    back in order."""
    from videoyolo_tpu.serving import BucketedDetector

    model, variables = small_model
    det = BucketedDetector(model, variables, buckets=(1, 2))
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(5, 96, 96, 3).astype(np.float32))
    got = det.detect(x)
    want = postprocess(*model.apply(variables, x, train=False))
    assert got[0].shape[0] == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-4)
