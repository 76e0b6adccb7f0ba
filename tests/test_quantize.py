"""int8 post-training quantization (ops/quantize.py + ConvBNLeaky quant mode).

The reference has no quantised path; these tests pin the serving feature:
BN folding is exact, and the int8 detector tracks the f32 one closely on
random weights (the compounding dynamic-quant error over 52+ conv cells
stays small because activations are BN-normalised).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoyolo_tpu.models.layers import ConvBNLeaky, leaky
from videoyolo_tpu.ops.quantize import (
    fold_bn_cell,
    quantize_cell,
    quantize_detector_variables,
)


def _random_cell_vars(rs, cin=4, cout=8, k=3):
    cell = ConvBNLeaky(cout, kernel=k)
    x = jnp.asarray(rs.rand(2, 8, 8, cin).astype(np.float32))
    variables = cell.init(jax.random.PRNGKey(0), x, train=False)
    variables = jax.tree_util.tree_map(lambda a: a, dict(variables))
    # non-trivial BN stats/params
    p = {k2: dict(v) for k2, v in variables["params"].items()}
    s = {k2: dict(v) for k2, v in variables["batch_stats"].items()}
    p["BatchNorm_0"] = {
        "scale": jnp.asarray(rs.uniform(0.5, 2.0, cout).astype(np.float32)),
        "bias": jnp.asarray(rs.uniform(-1, 1, cout).astype(np.float32)),
    }
    s["BatchNorm_0"] = {
        "mean": jnp.asarray(rs.uniform(-1, 1, cout).astype(np.float32)),
        "var": jnp.asarray(rs.uniform(0.1, 3.0, cout).astype(np.float32)),
    }
    p["Conv_0"] = {"kernel": jnp.asarray(rs.randn(k, k, cin, cout).astype(np.float32))}
    return cell, {"params": p, "batch_stats": s}, x


def test_fold_bn_cell_exact():
    """Folded conv+bias reproduces conv->BN exactly (pre-activation)."""
    rs = np.random.RandomState(0)
    cell, variables, x = _random_cell_vars(rs)
    want = cell.apply(variables, x, train=False)

    w, b = fold_bn_cell(
        variables["params"]["Conv_0"]["kernel"],
        variables["params"]["BatchNorm_0"]["scale"],
        variables["params"]["BatchNorm_0"]["bias"],
        variables["batch_stats"]["BatchNorm_0"]["mean"],
        variables["batch_stats"]["BatchNorm_0"]["var"],
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
    ) + jnp.asarray(b)
    got = leaky(y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_quantize_cell_int8_close():
    """One int8 cell stays within ~1% of the f32 cell."""
    rs = np.random.RandomState(1)
    cell, variables, x = _random_cell_vars(rs, cin=16, cout=32)
    want = np.asarray(cell.apply(variables, x, train=False))

    qcell = ConvBNLeaky(32, kernel=3, quant=True)
    q = quantize_cell(
        variables["params"]["Conv_0"]["kernel"],
        variables["params"]["BatchNorm_0"]["scale"],
        variables["params"]["BatchNorm_0"]["bias"],
        variables["batch_stats"]["BatchNorm_0"]["mean"],
        variables["batch_stats"]["BatchNorm_0"]["var"],
    )
    assert q["qkernel"].dtype == np.int8
    got = np.asarray(qcell.apply({"params": q}, x, train=False))
    err = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert err < 0.02, err


def test_quant_cell_is_eval_only():
    qcell = ConvBNLeaky(8, quant=True)
    with pytest.raises(AssertionError):
        qcell.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), train=True)


@pytest.fixture(scope="module")
def full_model():
    """One 62M-param init shared by the full-model tests (init is ~20s on
    this 1-core host)."""
    from videoyolo_tpu.models.yolo3 import YOLOv3

    model = YOLOv3(num_classes=3)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_quantized_detector_tracks_f32(full_model):
    """Full YOLOv3: int8 variables from quantize_detector_variables drive the
    quant=True model; scores stay highly correlated with f32."""
    from videoyolo_tpu.models.yolo3 import YOLOv3

    model, variables = full_model
    qmodel = YOLOv3(num_classes=3, quant=True)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 96, 96, 3).astype(np.float32))
    qvars = quantize_detector_variables(variables)

    boxes, scores = model.apply(variables, x, train=False)
    qboxes, qscores = qmodel.apply(qvars, x, train=False)
    assert np.isfinite(np.asarray(qboxes)).all()
    assert np.isfinite(np.asarray(qscores)).all()
    corr = np.corrcoef(np.asarray(scores).ravel(), np.asarray(qscores).ravel())[0, 1]
    assert corr > 0.99, corr
    box_err = np.mean(
        np.abs(np.asarray(boxes) - np.asarray(qboxes)) / (np.abs(np.asarray(boxes)) + 1.0)
    )
    assert box_err < 0.05, box_err


def test_static_calibrated_matches_dynamic(full_model):
    """Calibrated static-scale int8 tracks f32 as well as the dynamic mode on
    the calibration distribution."""
    from videoyolo_tpu.models.yolo3 import YOLOv3
    from videoyolo_tpu.ops.quantize import calibrate_detector_variables

    model, variables = full_model
    qdyn = YOLOv3(num_classes=3, quant=True)
    qstat = YOLOv3(num_classes=3, quant="static")
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(2, 96, 96, 3).astype(np.float32))
    qvars = quantize_detector_variables(variables)
    qvars_static = calibrate_detector_variables(qdyn, qvars, [x])

    # every cell gained an xscale; prediction convs untouched
    assert "xscale" in qvars_static["params"]["backbone"]["conv0"]
    assert "kernel" in qvars_static["params"]["output0"]["prediction"]

    boxes, scores = model.apply(variables, x, train=False)
    sboxes, sscores = qstat.apply(qvars_static, x, train=False)
    corr = np.corrcoef(np.asarray(scores).ravel(), np.asarray(sscores).ravel())[0, 1]
    assert corr > 0.99, corr
    assert np.isfinite(np.asarray(sboxes)).all()


def test_detect_cli_quantize_for_serving_wiring(full_model):
    """detect_yolo3 --quantize: converts + calibrates off loader batches;
    'int8' picks the fused end-to-end pipeline for plain YOLOv3,
    'int8_static'/'int8_dynamic' force those modes."""
    import detect_yolo3 as cli

    cli.FLAGS(["t", "--quantize=int8"])
    model, variables = full_model
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.rand(2, 96, 96, 3).astype(np.float32))

    qmodel, qvars = cli.quantize_for_serving(model, variables, [{"image": x}])
    assert qmodel.quant == "fused"
    assert "oscale" in qvars["params"]["backbone"]["conv0"]
    boxes, scores = qmodel.apply(qvars, x, train=False)
    assert np.isfinite(np.asarray(scores)).all()

    cli.FLAGS(["t", "--quantize=int8_static"])
    qmodel3, qvars3 = cli.quantize_for_serving(model, variables, [{"image": x}])
    assert qmodel3.quant == "static"
    assert "xscale" in qvars3["params"]["backbone"]["conv0"]

    cli.FLAGS(["t", "--quantize=int8_dynamic"])
    qmodel2, qvars2 = cli.quantize_for_serving(model, variables, [{"image": x}])
    assert qmodel2.quant is True
    assert "xscale" not in qvars2["params"]["backbone"]["conv0"]


def test_fused_int8_matches_static(full_model):
    """Golden gate for the fused pipeline: the int8-end-to-end model tracks
    both f32 and the per-cell static path closely (same calibrated scales;
    the only numerical divergence is the residual skip carrying quantised
    instead of full-precision sums, bounded by half a quantum per join)."""
    from videoyolo_tpu.ops.quantize import quantize_fused, quantize_static

    model, variables = full_model
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, 96, 96, 3).astype(np.float32))

    smodel, svars = quantize_static(model, variables, [x])
    fmodel, fvars = quantize_fused(model, variables, [x])
    _, sscores = smodel.apply(svars, x, train=False)
    _, fscores = fmodel.apply(fvars, x, train=False)
    _, scores = model.apply(variables, x, train=False)
    ss, fs, s = map(np.asarray, (sscores, fscores, scores))

    assert np.corrcoef(s.ravel(), fs.ravel())[0, 1] > 0.99
    assert np.corrcoef(ss.ravel(), fs.ravel())[0, 1] > 0.995
    assert np.abs(ss - fs).max() < 0.05

    # residual joins gained calibrated scales; only the (real-valued-input)
    # stem carries xscale; tip cells stay real-valued (no oscale)
    p = fvars["params"]
    assert "xscale" in p["backbone"]["stage3"]["DarknetBasicBlock_0"]["QuantResidual_0"]
    assert "xscale" in p["backbone"]["conv0"] and "oscale" in p["backbone"]["conv0"]
    assert "oscale" not in p["block0"]["ConvBNLeaky_5"]
    assert "xscale" not in p["block0"]["ConvBNLeaky_0"]  # int8-fed cell


def test_quantized_s2d_stem_tracks_f32():
    """int8 + space-to-depth stem: the phase-pooled stem BN folds with tiled
    per-channel scales; the quant model needs no phase reshape."""
    from videoyolo_tpu.models.yolo3 import YOLOv3

    model = YOLOv3(num_classes=3, s2d_stem=True)
    qmodel = YOLOv3(num_classes=3, s2d_stem=True, quant=True)
    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.rand(1, 96, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    qvars = quantize_detector_variables(variables)
    assert qvars["params"]["backbone"]["conv0"]["qkernel"].shape == (3, 3, 12, 128)

    boxes, scores = model.apply(variables, x, train=False)
    qboxes, qscores = qmodel.apply(qvars, x, train=False)
    corr = np.corrcoef(np.asarray(scores).ravel(), np.asarray(qscores).ravel())[0, 1]
    assert corr > 0.99, corr


def test_quantized_temporal_k3_tracks_f32():
    """int8 for the temporal family: YOLOv3T (k=3, late max join, 2D blocks)
    converts with the same walk and tracks its f32 outputs."""
    import dataclasses

    from videoyolo_tpu.models.yolo3_temporal import YOLOv3T
    from videoyolo_tpu.ops.quantize import calibrate_detector_variables

    model = YOLOv3T(num_classes=3, k=3, k_join_type="max", k_join_pos="late")
    rs = np.random.RandomState(8)
    x = jnp.asarray(rs.rand(1, 3, 96, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    qvars = quantize_detector_variables(variables)
    qdyn = dataclasses.replace(model, quant=True)

    boxes, scores = model.apply(variables, x, train=False)
    qboxes, qscores = qdyn.apply(qvars, x, train=False)
    corr = np.corrcoef(np.asarray(scores).ravel(), np.asarray(qscores).ravel())[0, 1]
    assert corr > 0.99, corr

    # static calibration path
    qvars_s = calibrate_detector_variables(qdyn, qvars, [x])
    qstat = dataclasses.replace(model, quant="static")
    sboxes, sscores = qstat.apply(qvars_s, x, train=False)
    assert np.isfinite(np.asarray(sboxes)).all()
    corr_s = np.corrcoef(np.asarray(scores).ravel(), np.asarray(sscores).ravel())[0, 1]
    assert corr_s > 0.99, corr_s


@pytest.mark.parametrize("conv_type", ["3", "21"])
def test_quantized_temporal_3d_blocks_track_f32(conv_type):
    """int8 for the 3D/2+1D temporal blocks: the conv3d quant cell + the
    same conversion walk (5D kernels fold per output channel) keep the
    quantised model tracking f32, dynamic and calibrated-static."""
    import dataclasses

    from videoyolo_tpu.models.yolo3_temporal import YOLOv3T
    from videoyolo_tpu.ops.quantize import (
        calibrate_detector_variables,
        quantize_detector_variables,
    )

    model = YOLOv3T(
        num_classes=3, k=3, k_join_type="max", k_join_pos="late",
        block_conv_type=conv_type,
    )
    rs = np.random.RandomState(9)
    x = jnp.asarray(rs.rand(1, 3, 96, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    qvars = quantize_detector_variables(variables)
    qdyn = dataclasses.replace(model, quant=True)

    boxes, scores = model.apply(variables, x, train=False)
    qboxes, qscores = qdyn.apply(qvars, x, train=False)
    corr = np.corrcoef(np.asarray(scores).ravel(), np.asarray(qscores).ravel())[0, 1]
    assert corr > 0.99, corr

    qvars_s = calibrate_detector_variables(qdyn, qvars, [x])
    qstat = dataclasses.replace(model, quant="static")
    sboxes, sscores = qstat.apply(qvars_s, x, train=False)
    assert np.isfinite(np.asarray(sboxes)).all()
    corr_s = np.corrcoef(np.asarray(scores).ravel(), np.asarray(sscores).ravel())[0, 1]
    assert corr_s > 0.99, corr_s


@pytest.mark.parametrize("rnn_pos", ["late", "out"])
def test_quantized_rnn_configs_track_f32_mixed_precision(rnn_pos):
    """int8 for the conv-RNN temporal configs (reference yolo3.py:1016-1019
    rnn tips): MIXED precision — the structural walk quantises every
    ConvBNLeaky cell (stages, blocks, transitions) while the ConvRNN
    tips/outputs pass through real-valued (no BN to fold; requantising the
    recurrent carry would compound rounding over the k-step scan).  Same
    split the two-stream family uses for its BN-less motion stream."""
    import dataclasses

    from videoyolo_tpu.models.yolo3_temporal import YOLOv3T
    from videoyolo_tpu.ops.quantize import calibrate_detector_variables

    model = YOLOv3T(
        num_classes=3, k=3, k_join_type="max", k_join_pos="late",
        rnn_pos=rnn_pos,
    )
    rs = np.random.RandomState(12)
    x = jnp.asarray(rs.rand(1, 3, 96, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    qvars = quantize_detector_variables(variables)
    # the RNN cells' params must survive the walk untouched (they are not
    # Conv_0+BatchNorm_0 shaped)
    flat_q = jax.tree_util.tree_flatten_with_path(qvars)[0]
    assert any("rnn" in jax.tree_util.keystr(p) or "fwd" in jax.tree_util.keystr(p)
               for p, _ in flat_q)
    qdyn = dataclasses.replace(model, quant=True)

    boxes, scores = model.apply(variables, x, train=False)
    qboxes, qscores = qdyn.apply(qvars, x, train=False)
    corr = np.corrcoef(np.asarray(scores).ravel(), np.asarray(qscores).ravel())[0, 1]
    assert corr > 0.99, corr

    qvars_s = calibrate_detector_variables(qdyn, qvars, [x])
    qstat = dataclasses.replace(model, quant="static")
    sboxes, sscores = qstat.apply(qvars_s, x, train=False)
    assert np.isfinite(np.asarray(sboxes)).all()
    corr_s = np.corrcoef(np.asarray(scores).ravel(), np.asarray(sscores).ravel())[0, 1]
    assert corr_s > 0.99, corr_s


@pytest.mark.parametrize("gated", [False, True])
def test_quantized_two_stream_tracks_f32(gated):
    """Mixed-precision int8 for the two-stream family (reference
    ts_darknet.py:13 DarknetFlownet): the darknet-side ConvBNLeaky cells
    quantise via the structural walk, the flownet motion stream (convs
    without BN) passes through real-valued, and quantize_static/replace_quant
    thread the mode into the backbone submodule."""
    from videoyolo_tpu.models.factory import YoloConfig, build_model
    from videoyolo_tpu.ops.quantize import quantize_static, replace_quant

    model = build_model(
        YoloConfig(
            num_classes=3, motion_stream="flownet", k=3,
            add_type="add" if gated else None,
        )
    )
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.rand(1, 3, 128, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    qmodel, qvars = quantize_static(model, variables, [x])
    assert qmodel.quant == "static" and qmodel.backbone.quant == "static"

    boxes, scores = model.apply(variables, x, train=False)
    qboxes, qscores = qmodel.apply(qvars, x, train=False)
    assert np.isfinite(np.asarray(qboxes)).all()
    corr = np.corrcoef(np.asarray(scores).ravel(), np.asarray(qscores).ravel())[0, 1]
    assert corr > 0.99, corr

    # dynamic mode needs the same threading (detect CLI int8_dynamic path)
    qdyn = replace_quant(model, True)
    dvars = quantize_detector_variables(variables)
    dboxes, dscores = qdyn.apply(dvars, x, train=False)
    corr_d = np.corrcoef(np.asarray(scores).ravel(), np.asarray(dscores).ravel())[0, 1]
    assert corr_d > 0.99, corr_d


def test_quant_backbone_mode_mismatch_rejected():
    """YOLOv3T asserts the backbone carries the same quant mode — a bare
    dataclasses.replace on the head alone must fail loudly, steering callers
    to ops/quantize.replace_quant."""
    import dataclasses

    from videoyolo_tpu.models.factory import YoloConfig, build_model

    model = build_model(YoloConfig(num_classes=3, motion_stream="flownet", k=3))
    bad = dataclasses.replace(model, quant=True)
    with pytest.raises(AssertionError):
        bad.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64, 3)), train=False)


@pytest.mark.parametrize("t_out", [True, False])
def test_quantized_yolov3temporal_tracks_f32(t_out):
    """int8 for YOLOv3Temporal (reference yolo3_temporal.py:242): the corr-
    pyramid t_out path (2D cells + parameterless cost volumes) and the
    5->3->1 funnel path (2+1D ConvBNLeaky3D fusion cells) both quantise via
    the structural walk and track their f32 outputs."""
    import dataclasses

    from videoyolo_tpu.models.yolo3_temporal import YOLOv3Temporal
    from videoyolo_tpu.ops.quantize import quantize_static

    model = YOLOv3Temporal(num_classes=3, t=5, corr_d=2 if t_out else 0, t_out=t_out)
    rs = np.random.RandomState(13)
    x = jnp.asarray(rs.rand(1, 5, 96, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    qmodel, qvars = quantize_static(model, variables, [x])
    assert qmodel.quant == "static"

    boxes, scores = model.apply(variables, x, train=False)
    qboxes, qscores = qmodel.apply(qvars, x, train=False)
    assert np.isfinite(np.asarray(qboxes)).all()
    corr = np.corrcoef(np.asarray(scores).ravel(), np.asarray(qscores).ravel())[0, 1]
    assert corr > 0.99, corr
