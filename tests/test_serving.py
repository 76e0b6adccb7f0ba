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
