"""Byte-format and (when fixtures exist) weight-level parity with Gluon.

Two tiers:
  1. Format-level: the mxnet `.params` reader parsed against bytes authored
     HERE with raw struct.pack per the documented container layout — an
     independent authoring path from utils/gluon_import.write_mxnet_params,
     so reader and writer cannot share a mistaken assumption.
  2. Golden parity: if tools/dump_fixtures.py has been run under a real
     mxnet/gluoncv environment and its outputs copied to tests/fixtures/,
     the pretrained darknet53 forward is checked against the reference's
     activations (reference darknet/darknet.py:101).  Skipped otherwise —
     this environment has no mxnet and no network egress.
"""
import os
import struct

import numpy as np
import pytest

from videoyolo_tpu.utils.gluon_import import read_mxnet_params

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _pack_ndarray_v1(arr: np.ndarray) -> bytes:
    """Legacy V1 NDArray: uint32 magic, uint32 ndim, uint32 dims,
    int32 dev_type, int32 dev_id, int32 type_flag, raw data."""
    out = struct.pack("<I", 0xF993FAC8)
    out += struct.pack("<I", arr.ndim)
    out += struct.pack(f"<{arr.ndim}I", *arr.shape)
    out += struct.pack("<iii", 1, 0, {np.float32: 0, np.float64: 1, np.int32: 4}[arr.dtype.type])
    return out + arr.tobytes()


def _pack_ndarray_v2(arr: np.ndarray, magic=0xF993FAC9) -> bytes:
    """V2/V3 NDArray: uint32 magic, int32 stype(0=dense), uint32 ndim,
    int64 dims, dev, dtype flag, data."""
    out = struct.pack("<Ii", magic, 0)
    out += struct.pack("<I", arr.ndim)
    out += struct.pack(f"<{arr.ndim}q", *arr.shape)
    out += struct.pack("<iii", 1, 0, {np.float32: 0, np.float16: 2, np.int64: 6}[arr.dtype.type])
    return out + arr.tobytes()


def _pack_container(entries) -> bytes:
    """mx.nd.save container: u64 magic 0x112, u64 reserved, u64 n, NDArrays,
    u64 m, m x (u64 len, name bytes)."""
    parts = [struct.pack("<QQQ", 0x112, 0, len(entries))]
    parts += [blob for _, blob in entries]
    parts.append(struct.pack("<Q", len(entries)))
    for name, _ in entries:
        b = name.encode()
        parts.append(struct.pack("<Q", len(b)) + b)
    return b"".join(parts)


def test_reader_parses_handwritten_v1_bytes(tmp_path):
    rs = np.random.RandomState(0)
    w = rs.rand(4, 3, 3, 3).astype(np.float32)
    g = rs.rand(8).astype(np.float64)
    blob = _pack_container(
        [("arg:conv0_weight", _pack_ndarray_v1(w)), ("aux:bn0_gamma", _pack_ndarray_v1(g))]
    )
    p = tmp_path / "v1.params"
    p.write_bytes(blob)
    got = read_mxnet_params(str(p))
    # arg:/aux: prefixes stripped, arrays byte-exact
    np.testing.assert_array_equal(got["conv0_weight"], w)
    np.testing.assert_array_equal(got["bn0_gamma"], g)


def test_reader_parses_handwritten_v2_and_v3_bytes(tmp_path):
    rs = np.random.RandomState(1)
    a = rs.rand(2, 5).astype(np.float32)
    b = rs.rand(7).astype(np.float16)
    c = np.arange(6, dtype=np.int64).reshape(3, 2)
    blob = _pack_container(
        [
            ("x", _pack_ndarray_v2(a, 0xF993FAC9)),
            ("y", _pack_ndarray_v2(b, 0xF993FACA)),  # V3 magic
            ("z", _pack_ndarray_v2(c, 0xF993FAC9)),
        ]
    )
    p = tmp_path / "v2.params"
    p.write_bytes(blob)
    got = read_mxnet_params(str(p))
    np.testing.assert_array_equal(got["x"], a)
    np.testing.assert_array_equal(got["y"], b)
    np.testing.assert_array_equal(got["z"], c)
    assert got["y"].dtype == np.float16


def test_reader_rejects_garbage(tmp_path):
    p = tmp_path / "bad.params"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(AssertionError):
        read_mxnet_params(str(p))


# ---------------------------------------------------------------------------
# Tier 2: real-weight golden parity (requires tools/dump_fixtures.py output)
# ---------------------------------------------------------------------------

needs_fixture = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURES, "darknet53.params")),
    reason="needs tests/fixtures/darknet53.params + darknet53_activations.npz: "
    "run tools/dump_fixtures.py under mxnet/gluoncv and copy its output "
    "into tests/fixtures/ (no mxnet/egress in this environment)",
)


@needs_fixture
def test_pretrained_darknet53_forward_matches_reference():
    import jax
    import jax.numpy as jnp

    from videoyolo_tpu.models.darknet import Darknet53
    from videoyolo_tpu.utils.gluon_import import load_gluon_darknet53

    z = np.load(os.path.join(FIXTURES, "darknet53_activations.npz"))
    model = Darknet53()
    x = jnp.asarray(np.transpose(z["x"], (0, 2, 3, 1)))  # NCHW -> NHWC
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = load_gluon_darknet53(
        dict(variables), os.path.join(FIXTURES, "darknet53.params"), prefix=""
    )
    f1, f2, f3 = model.apply(variables, x, train=False)
    for got, want in ((f1, z["f1"]), (f2, z["f2"]), (f3, z["f3"])):
        want = np.transpose(want, (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Full yolo3_darknet53 head mapping (utils/gluon_import.load_gluon_yolo3)
# ---------------------------------------------------------------------------
#
# The structured-name fixture below is authored HERE, independently of
# gluon_import's own helpers: names are generated from gluon's documented
# `_collect_params_with_prefix` scheme (dot paths keyed by HybridSequential
# position), shapes from the reference graph (yolo3.py:410-426: stages
# features[:15]/[15:24]/[24:], filters [512,256,128], anchors reversed
# deep-first).  When tools/dump_fixtures.py output lands in tests/fixtures/,
# test_pretrained_yolo3_decode_matches_reference upgrades this to true
# golden parity against bytes gluon itself wrote.


def _gluon_yolo3_voc_names():
    """Every (name, shape) of a reference yolo3_darknet53 checkpoint with
    `num_classes` foreground classes — written out longhand from the graph,
    not from gluon_import's mapping tables."""
    names = []

    def conv_cell(prefix, cin, cout, k):
        names.append((f"{prefix}.0.weight", (cout, cin, k, k)))
        for leaf in ("gamma", "beta", "running_mean", "running_var"):
            names.append((f"{prefix}.1.{leaf}", (cout,)))

    def basic_block(prefix, channels):
        conv_cell(f"{prefix}.body.0", channels, channels // 2, 1)
        conv_cell(f"{prefix}.body.1", channels // 2, channels, 3)

    # darknet53 features, split [:15] / [15:24] / [24:] across stages.{0,1,2}
    conv_cell("stages.0.0", 3, 32, 3)
    child, cin = 1, 32
    splits, stage, local = (15, 24), 0, 1
    for n_blocks, cout in zip((1, 2, 8, 8, 4), (64, 128, 256, 512, 1024)):
        for kind in ["conv"] + ["block"] * n_blocks:
            if stage < 2 and child == splits[stage]:
                stage, local = stage + 1, 0
            base = f"stages.{stage}.{local}"
            if kind == "conv":
                conv_cell(base, cin, cout, 3)
                cin = cout
            else:
                basic_block(base, cout)
            child += 1
            local += 1

    num_classes = 20
    num_pred = 3 * (5 + num_classes)
    head_in = {0: 1024, 1: 768, 2: 384}  # concat(route_ch, upsampled_ch)
    for i, ch in enumerate((512, 256, 128)):
        cin = head_in[i]
        for j in range(5):
            cout = ch if j % 2 == 0 else ch * 2
            conv_cell(f"yolo_blocks.{i}.body.{j}", cin, cout, 1 if j % 2 == 0 else 3)
            cin = cout
        conv_cell(f"yolo_blocks.{i}.tip", ch, ch * 2, 3)
        names.append((f"yolo_outputs.{i}.prediction.weight", (num_pred, ch * 2, 1, 1)))
        names.append((f"yolo_outputs.{i}.prediction.bias", (num_pred,)))
        names.append((f"yolo_outputs.{i}.anchor_{i}", (1, 1, 3, 2)))
        names.append((f"yolo_outputs.{i}.offset_{i}", (1, 1, 128, 128, 2)))
        if i < 2:
            conv_cell(f"transitions.{i}", ch, ch // 2, 1)
    return names


def test_full_yolo3_gluon_roundtrip(tmp_path):
    """load_gluon_yolo3 ingests an independently-authored structured-name
    file; export_gluon_yolo3 reproduces the exact reference name set."""
    import jax
    import jax.numpy as jnp

    from videoyolo_tpu.models.yolo3 import YOLOv3
    from videoyolo_tpu.utils.gluon_import import (
        export_gluon_yolo3,
        load_gluon_yolo3,
    )

    rs = np.random.RandomState(7)
    spec = _gluon_yolo3_voc_names()
    arrays = {n: rs.uniform(-1, 1, s).astype(np.float32) for n, s in spec}
    # running_var must be positive
    for n in arrays:
        if n.endswith("running_var"):
            arrays[n] = np.abs(arrays[n]) + 0.5
    blob = _pack_container([(n, _pack_ndarray_v2(arrays[n])) for n, _ in spec])
    src = tmp_path / "yolo3_darknet53_voc.params"
    src.write_bytes(blob)

    model = YOLOv3(num_classes=20)
    x = np.zeros((1, 64, 64, 3), np.float32)
    # only the tree structure/shapes matter here: eval_shape skips the
    # 62M-param RNG init (~2 min on this 1-core host)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    )
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )
    loaded = load_gluon_yolo3(dict(variables), str(src))

    # spot-check: deep tip conv kernel is the OIHW->HWIO transpose of the file
    got = np.asarray(loaded["params"]["block0"]["ConvBNLeaky_5"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(
        got, np.transpose(arrays["yolo_blocks.0.tip.0.weight"], (2, 3, 1, 0))
    )
    got_bn = np.asarray(
        loaded["batch_stats"]["transition1"]["BatchNorm_0"]["mean"]
    )
    np.testing.assert_array_equal(got_bn, arrays["transitions.1.1.running_mean"])
    got_bias = np.asarray(loaded["params"]["output2"]["prediction"]["bias"])
    np.testing.assert_array_equal(got_bias, arrays["yolo_outputs.2.prediction.bias"])

    # export must emit exactly the reference name set (so gluon
    # load_parameters finds every parameter, constants included) with every
    # learnable tensor byte-identical to what was loaded
    dst = tmp_path / "export.params"
    export_gluon_yolo3(loaded, str(dst))
    back = read_mxnet_params(str(dst))
    assert set(back) == {n for n, _ in spec}
    for n, _ in spec:
        if "anchor_" in n or "offset_" in n:
            continue  # synthesised constants: shape-checked below
        np.testing.assert_array_equal(back[n], arrays[n], err_msg=n)
    for n, s in spec:
        assert back[n].shape == s, (n, back[n].shape, s)


needs_decode_fixture = pytest.mark.skipif(
    not (
        os.path.exists(os.path.join(FIXTURES, "yolo3_darknet53_voc.params"))
        and os.path.exists(os.path.join(FIXTURES, "yolo3_voc_decode.npz"))
    ),
    reason="needs tests/fixtures/yolo3_darknet53_voc.params + "
    "yolo3_voc_decode.npz: run tools/dump_fixtures.py under mxnet/gluoncv "
    "and copy its output into tests/fixtures/",
)


@needs_decode_fixture
def test_pretrained_yolo3_decode_matches_reference():
    """Bit-comparability target (yolo3.py:172-177, :525-530): pretrained
    reference weights -> our forward + decode + NMS reproduces the
    reference's (ids, scores, bboxes)."""
    import jax
    import jax.numpy as jnp

    from videoyolo_tpu.models.yolo3 import YOLOv3, postprocess
    from videoyolo_tpu.utils.gluon_import import load_gluon_yolo3

    z = np.load(os.path.join(FIXTURES, "yolo3_voc_decode.npz"))
    model = YOLOv3(num_classes=20)
    x = jnp.asarray(np.transpose(z["x"], (0, 2, 3, 1)))  # NCHW -> NHWC
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = load_gluon_yolo3(
        dict(variables), os.path.join(FIXTURES, "yolo3_darknet53_voc.params")
    )
    boxes, scores = model.apply(variables, x, train=False)
    ids, conf, bboxes = postprocess(boxes, scores)
    # compare the valid (score > 0) prefix; padding rows are -1 both sides
    want_scores = z["scores"][0, :, 0]
    valid = want_scores > 0
    np.testing.assert_allclose(np.asarray(conf)[0, valid, 0], want_scores[valid], rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ids)[0, valid, 0], z["ids"][0, valid, 0])
    np.testing.assert_allclose(np.asarray(bboxes)[0, valid], z["bboxes"][0, valid], rtol=1e-3, atol=0.5)


def test_fixture_protocol_stays_hot():
    """The two @needs_fixture golden skips must stay ACTIONABLE: the dump
    script (tools/dump_fixtures.py, runs only under a real mxnet/gluoncv
    env) must still parse and must write exactly the filenames the golden
    tests above look for, so copying its output into tests/fixtures/
    activates them with no further changes (VERDICT r3 "keep the
    weight-parity machinery hot")."""
    import ast

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "dump_fixtures.py",
    )
    with open(path) as f:
        src = f.read()
    ast.parse(src)  # the env has no mxnet; syntax is the verifiable tier
    for name in (
        "darknet53.params",
        "darknet53_activations.npz",
        "yolo3_darknet53_voc.params",
        "yolo3_voc_decode.npz",
    ):
        assert name in src, f"dump_fixtures.py no longer writes {name}"
