"""Pallas int8 s2d downsample conv (ops/pallas_conv.py): equivalence with
the direct strided int8 conv + fused epilogue (the quant_conv_cell "fused"
semantics for a 3x3/stride-2 cell) in interpret mode.

The kernel is the TPU fast path for the darknet downsample cells
(`/root/reference/models/definitions/darknet/darknet.py:45-95`) in the
fused-int8 serving pipeline; these tests pin its numerics so the TPU
measurement runs can trust a green interpret pass.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoyolo_tpu.ops.pallas_conv import (
    pack_downsample_weights,
    pallas_quant_downsample,
    space_to_depth_i8,
    xla_s2d_downsample,
)

LEAKY = 0.1


def _reference(q_in, qkernel, scale, bias, oscale):
    """Direct int8 3x3/s2/pad1 conv with int32 accumulation + the exact
    epilogue the kernel applies (reciprocal-multiply requant, so the
    comparison is bit-exact rather than 1-ulp flaky)."""
    dn = jax.lax.conv_dimension_numbers(
        q_in.shape, qkernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        q_in, qkernel, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    yf = y.astype(jnp.float32) * scale[None, None, None, :] + bias
    yf = jnp.where(yf > 0, yf, LEAKY * yf)
    q = jnp.clip(jnp.round(yf * (1.0 / jnp.float32(oscale))), -127, 127)
    return q.astype(jnp.int8)


def _case(b, h, c, f, seed):
    rs = np.random.RandomState(seed)
    q_in = rs.randint(-127, 128, (b, h, h, c)).astype(np.int8)
    qk = rs.randint(-127, 128, (3, 3, c, f)).astype(np.int8)
    scale = (rs.rand(f).astype(np.float32) + 0.5) * 1e-3
    bias = rs.randn(f).astype(np.float32) * 0.1
    oscale = np.float32(0.05)
    return jnp.asarray(q_in), jnp.asarray(qk), jnp.asarray(scale), jnp.asarray(bias), oscale


@pytest.mark.parametrize(
    "b,h,c,f,rb",
    [
        (2, 32, 8, 16, 8),   # H' = 16 = 2 row blocks
        (1, 52, 16, 32, 8),  # H' = 26: ragged last row block (26 = 3*8 + 2)
        (2, 16, 8, 16, 16),  # H' = 8 < row_block: single padded block
    ],
)
def test_pallas_downsample_matches_direct_conv(b, h, c, f, rb):
    q_in, qk, scale, bias, oscale = _case(b, h, c, f, seed=h + c)
    got = pallas_quant_downsample(
        q_in, qk, scale, bias, oscale, row_block=rb, interpret=True
    )
    want = _reference(q_in, qk, scale, bias, oscale)
    assert got.shape == (b, h // 2, h // 2, f)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _reference_div(q_in, qkernel, scale, bias, oscale):
    """Same as _reference but with the `/ oscale` division epilogue the
    fused cells use (quant_conv_cell), which xla_s2d_downsample matches."""
    dn = jax.lax.conv_dimension_numbers(
        q_in.shape, qkernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        q_in, qkernel, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    yf = y.astype(jnp.float32) * scale[None, None, None, :] + bias
    yf = jnp.where(yf > 0, yf, LEAKY * yf)
    return jnp.clip(jnp.round(yf / oscale), -127, 127).astype(jnp.int8)


@pytest.mark.parametrize(
    "b,h,c,f",
    [(2, 32, 8, 16), (1, 52, 16, 32), (2, 16, 8, 16), (1, 26, 32, 64)],
)
def test_xla_s2d_downsample_matches_direct_conv(b, h, c, f):
    """The XLA s2d reformulation (dense 2x2 packed-tap conv) is bit-exact
    vs the strided original: int32 accumulation is order-independent and
    the epilogues are the same elementwise program."""
    q_in, qk, scale, bias, oscale = _case(b, h, c, f, seed=h + c + 1)
    got = jax.jit(xla_s2d_downsample)(q_in, qk, scale, bias, oscale)
    want = _reference_div(q_in, qk, scale, bias, oscale)
    assert got.shape == (b, h // 2, h // 2, f)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_model_s2d_ds_conv_bit_exact():
    """quantize_fused + ds_conv='s2d' produces byte-identical detect outputs
    to the default direct emitter (the whole int8 chain sees identical
    QTensors, so everything downstream is unchanged)."""
    import dataclasses

    from videoyolo_tpu.models.yolo3 import YOLOv3
    from videoyolo_tpu.ops.quantize import quantize_fused

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    model = YOLOv3(num_classes=4, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    qmodel, qvars = quantize_fused(model, variables, [x])
    want = jax.jit(lambda im: qmodel.apply(qvars, im, train=False))(x)
    s2d = dataclasses.replace(qmodel, ds_conv="s2d")
    got = jax.jit(lambda im: s2d.apply(qvars, im, train=False))(x)
    for g, w in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_pack_downsample_weights_layout():
    """Tap-matrix packing: multiplying a one-hot s2d cell against W2 must
    reproduce the corresponding original kernel taps."""
    rs = np.random.RandomState(0)
    c, f = 4, 8
    qk = rs.randint(-127, 128, (3, 3, c, f)).astype(np.int8)
    w2 = np.asarray(pack_downsample_weights(jnp.asarray(qk)))
    assert w2.shape == (4, 4 * c, f)
    # cell (dh, dw)=(1, 1), phase (pr, pc)=(0, 0) -> kernel tap (1, 1)
    np.testing.assert_array_equal(w2[3, 0:c], qk[1, 1])
    # cell (0, 0) covers only phase (1, 1) -> tap (0, 0); other phases zero
    np.testing.assert_array_equal(w2[0, 3 * c : 4 * c], qk[0, 0])
    assert (w2[0, 0 : 3 * c] == 0).all()


def test_space_to_depth_i8_phase_major():
    x = np.arange(2 * 4 * 4 * 3, dtype=np.int8).reshape(2, 4, 4, 3)
    y = np.asarray(space_to_depth_i8(jnp.asarray(x)))
    assert y.shape == (2, 2, 2, 12)
    # cell (0, 0) holds phases (0,0),(0,1),(1,0),(1,1) in order
    np.testing.assert_array_equal(y[0, 0, 0, 0:3], x[0, 0, 0])
    np.testing.assert_array_equal(y[0, 0, 0, 3:6], x[0, 0, 1])
    np.testing.assert_array_equal(y[0, 0, 0, 6:9], x[0, 1, 0])
    np.testing.assert_array_equal(y[0, 0, 0, 9:12], x[0, 1, 1])
