"""Primitive layers (flax/linen, NHWC, TPU-first).

Capability parity with `/root/reference/models/definitions/layers.py` (the
`_conv1d/_conv2d/_conv3d/_conv21d` conv-BN-LeakyReLU cells, `_upsample`,
`TemporalPooling`, `TimeDistributed`, `Corr`, `RNN`), re-designed for TPU:

* NHWC / NTHWC layouts (channel-last feeds the MXU without transposes);
* BatchNorm uses eps=1e-5, momentum=0.9 exactly like the reference cells
  (layers.py:57-88).  Under `pjit` the batch axis is globally sharded, so
  batch statistics are *global-batch* statistics by construction — this is
  the TPU-native equivalent of the reference's NCCL SyncBatchNorm
  (train_yolov3.py:338,352).
* `TimeDistributed` is a reshape (B,T,...)->(B*T,...) around the wrapped
  module — the fold/unfold trick of layers.py:208-264, which on TPU is free
  (pure layout metadata) and keeps convs large and batched for the MXU.
* Temporal padding/pooling are static-shape jnp ops (layers.py:23-46,161-205).
* The conv-RNN (layers.py:267-306) becomes a ConvGRU / ConvLSTM unrolled as
  a Python loop over the small static window k (optional bidirectionality,
  averaged directions) — at k<=9 an unrolled trace compiles to the same XLA
  program a scan would, without the carried-state layout constraints.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

BN_EPS = 1e-5
BN_MOMENTUM = 0.9
LEAKY_SLOPE = 0.1


class QTensor(NamedTuple):
    """An int8-quantised activation travelling between fused-int8 cells:
    `q` (int8 data) with its symmetric scale `s` (scalar f32; value = q * s).

    NamedTuple => automatically a pytree, so it flows through flax module
    calls and jit boundaries unchanged."""

    q: jnp.ndarray
    s: jnp.ndarray


def dequantize(x, dtype=None):
    """QTensor -> real-valued array (f32, or `dtype`); passes non-QTensors
    through (so call sites stay polymorphic over quant modes)."""
    if isinstance(x, QTensor):
        out = x.q.astype(jnp.float32) * x.s
        return out.astype(dtype) if dtype is not None else out
    return x


def leaky(x):
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def upsample2x(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample by pixel repetition (layers.py:11-20).

    x: (..., H, W, C) channel-last.
    """
    x = jnp.repeat(x, stride, axis=-3)
    x = jnp.repeat(x, stride, axis=-2)
    return x


def temporal_pad(x: jnp.ndarray, padding: int = 1, zeros: bool = True) -> jnp.ndarray:
    """Pad (B, T, ...) along T by edge-repeat or zeros (layers.py:23-46)."""
    first = x[:, :1]
    last = x[:, -1:]
    if zeros:
        first = jnp.zeros_like(first)
        last = jnp.zeros_like(last)
    if padding > 1:
        first = jnp.repeat(first, padding, axis=1)
        last = jnp.repeat(last, padding, axis=1)
    return jnp.concatenate([first, x, last], axis=1)


class ConvBNLeaky(nn.Module):
    """The conv-BN-LeakyReLU(0.1) cell used everywhere (layers.py:63-70).

    NHWC; no conv bias; BN eps 1e-5 / momentum 0.9.

    `quant` switches to the int8 serving path: the BN is folded into
    per-output-channel weight scales offline (ops/quantize.py converts a
    trained f32 checkpoint) and the conv contracts int8 x int8 -> int32 on
    the MXU (~1.7x bf16 conv throughput measured on v5e).  Params in this
    mode are `qkernel` (int8), `wscale` (f32, folded BN scale x weight
    quant step), `bias` (f32, folded BN shift) — never `init()` a quant
    model, always convert.  Two activation-quantisation modes:

      quant=True / "dynamic": symmetric per-image max, computed on the fly.
        Robust (no calibration) but the max pass costs an extra read of
        every activation — measured 2007 fps detect at B=128/416.
      quant="static": per-cell `xscale` params from a calibration pass
        (ops/quantize.calibrate + requantize).  2795 fps on the same
        config — the production mode.  Dynamic cells sow their observed
        amax under the "quant_calib" collection to feed calibration.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | str = "auto"
    quant: Any = False  # False | True | "dynamic" | "static" | "fused" | "fused_calib"
    qout: bool = True  # fused modes: emit a QTensor (False: real-valued, for
    #                    cells feeding f32 consumers like the prediction convs)
    # fused mode: how eligible 3x3/stride-2 cells emit their conv —
    #   "direct": XLA's strided int8 conv emitter (shipped; fastest e2e)
    #   "s2d":    space-to-depth + dense 2x2 conv, packed taps (XLA) —
    #             measured 0.90x e2e, kept for the record
    #   "pallas": the ops/pallas_conv kernel (measured 0.54x — kept for the
    #             record; see its docstring)
    ds_conv: str = "direct"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if pad == "auto":
            pad = self.kernel // 2
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        if self.quant:
            assert not train, "int8 cells are eval-only (convert after training)"
            return self._quant_call(x, pad)
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )(x)
        return leaky(x)

    def _quant_call(self, x, pad):
        eligible = (
            self.ds_conv != "direct"
            and self.quant == "fused"
            and self.kernel == 3
            and self.stride == 2
            and isinstance(x, QTensor)
            and self.qout
            and x.q.shape[1] % 2 == 0
            # pallas: at stage1 scale (416 input) the resident block
            # exceeds VMEM; s2d has no such cap
            and (self.ds_conv == "s2d" or x.q.shape[1] <= 208)
        )
        if eligible:
            from ..ops.pallas_conv import pallas_quant_downsample, xla_s2d_downsample

            qkernel = self.param(
                "qkernel",
                nn.initializers.zeros,
                (3, 3, x.q.shape[-1], self.features),
                jnp.int8,
            )
            wscale = self.param("wscale", nn.initializers.ones, (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            oscale = self.param("oscale", nn.initializers.ones, (), jnp.float32)
            if self.ds_conv == "s2d":
                out = xla_s2d_downsample(x.q, qkernel, x.s * wscale, bias, oscale)
            else:  # "pallas" — measured 0.54x e2e, kept for the record
                out = pallas_quant_downsample(
                    x.q, qkernel, x.s * wscale, bias, oscale,
                    row_block=16 if x.q.shape[1] >= 208 else 8,
                )
            return QTensor(out, oscale)
        return quant_conv_cell(
            self, x, self.kernel, self.stride, pad, self.features,
            mode=self.quant, qout=self.qout, dtype=self.dtype,
        )


def quant_conv_cell(module, x, kernel, stride, pad, features, mode, dtype, qout=True):
    """Shared int8 cell body (ConvBNLeaky quant mode + the s2d stem cell):
    quantise activations, int8 conv with int32 accumulation, dequant +
    folded-BN bias + leaky.  Params live on `module`'s own scope, matching
    what ops/quantize.quantize_detector_variables produces.

    Modes:
      True/"dynamic": per-image activation scales computed on the fly; sows
        the observed amax (collection "quant_calib") for calibration.
      "static": per-cell `xscale` param from calibration; real-valued I/O.
      "fused": int8 flows end-to-end — accepts a QTensor input (skipping the
        activation-quantise pass entirely; the dequant factor uses the
        incoming scale) and, when `qout`, requantises its own output with a
        calibrated `oscale` param, returning a QTensor.  XLA output-fuses
        the whole epilogue into the conv, so only int8 crosses cells.
      "fused_calib": the calibration twin of "fused" — same wiring (QTensor
        in/out) with dynamic scales, sowing input amax ("amax", real-valued
        inputs only) and output amax ("oamax") to derive the fused params.
    """
    fused = mode in ("fused", "fused_calib")
    calib = mode in (True, "dynamic", "fused_calib")
    cin = (x.q if isinstance(x, QTensor) else x).shape[-1]
    shape = (kernel, kernel, cin, features)
    qkernel = module.param("qkernel", nn.initializers.zeros, shape, jnp.int8)
    wscale = module.param("wscale", nn.initializers.ones, (features,), jnp.float32)
    bias = module.param("bias", nn.initializers.zeros, (features,), jnp.float32)

    if isinstance(x, QTensor):
        assert fused, "QTensor inputs are a fused-mode contract"
        q, s_x = x.q, x.s
    else:
        xf = x.astype(jnp.float32)
        if mode == "static" or mode == "fused":
            s_x = module.param("xscale", nn.initializers.ones, (), jnp.float32)
        else:
            # dynamic symmetric per-image activation scale; sow the batch
            # amax so a calibration pass can derive the static xscale
            amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
            module.sow("quant_calib", "amax", jnp.max(amax))
            s_x = jnp.maximum(amax / 127.0, 1e-12)
        q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(q.shape, shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        q,
        qkernel,
        (stride, stride),
        pad,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    yf = y.astype(jnp.float32) * (s_x * wscale) + bias
    out = leaky(yf)
    if fused and qout:
        if mode == "fused":
            s_o = module.param("oscale", nn.initializers.ones, (), jnp.float32)
        else:
            oamax = jnp.max(jnp.abs(out))
            module.sow("quant_calib", "oamax", oamax)
            s_o = jnp.maximum(oamax / 127.0, 1e-12)
        return QTensor(jnp.clip(jnp.round(out / s_o), -127, 127).astype(jnp.int8), s_o)
    return out.astype(dtype) if dtype is not None else out


class QuantResidual(nn.Module):
    """Residual join for the fused-int8 pipeline: dequantise both int8
    branches, add in f32, requantise with a calibrated scale — so the join
    emits int8 instead of materialising a bf16/f32 sum (the residual-path
    cost the ROADMAP measured at ~4 ms of the 46 ms static-int8 step).

    calib=True (the "fused_calib" pass) uses a dynamic scale and sows the
    observed amax; ops/quantize._insert_fused_scales turns it into the
    `xscale` param read here in fused mode."""

    calib: bool = False

    @nn.compact
    def __call__(self, a: QTensor, b: QTensor) -> QTensor:
        f = a.q.astype(jnp.float32) * a.s + b.q.astype(jnp.float32) * b.s
        if self.calib:
            amax = jnp.max(jnp.abs(f))
            self.sow("quant_calib", "amax", amax)
            s = jnp.maximum(amax / 127.0, 1e-12)
        else:
            s = self.param("xscale", nn.initializers.ones, (), jnp.float32)
        return QTensor(jnp.clip(jnp.round(f / s), -127, 127).astype(jnp.int8), s)


def quant_concat(parts, axis=-1):
    """Concatenate QTensors on the channel axis without leaving int8: rescale
    every part onto the max of the incoming scales (int8 -> int8, elementwise,
    bounded by |q| <= 127 since scales only grow), then concat the int8 data.
    Mixed/real-valued inputs fall back to a real-valued concat."""
    if not all(isinstance(p, QTensor) for p in parts):
        return jnp.concatenate([dequantize(p) for p in parts], axis=axis)
    s = parts[0].s
    for p in parts[1:]:
        s = jnp.maximum(s, p.s)
    qs = [
        jnp.clip(jnp.round(p.q.astype(jnp.float32) * (p.s / s)), -127, 127).astype(jnp.int8)
        for p in parts
    ]
    return QTensor(jnp.concatenate(qs, axis=axis), s)


class ConvBNLeaky3D(nn.Module):
    """3D conv-BN-leaky cell over (B, T, H, W, C) (layers.py:73-80).

    `quant` mirrors ConvBNLeaky's int8 serving path for the temporal
    family: BN folded offline (ops/quantize.py — the same walk converts
    5D kernels), int8 x int8 -> int32 conv3d on the MXU, dynamic or
    calibrated-static activation scales."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Optional[Tuple[int, int, int]] = None
    quant: Any = False  # False | True/"dynamic" | "static"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kt, kh, kw = self.kernel
        pad = self.padding
        if pad is None:
            pad = (kt // 2, kh // 2, kw // 2)
        pads = [(p, p) for p in pad]
        if self.quant:
            assert not train, "int8 cells are eval-only (convert after training)"
            return quant_conv3d_cell(
                self, x, self.kernel, self.stride, pads, self.features,
                mode=self.quant, dtype=self.dtype,
            )
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.stride,
            padding=pads,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )(x)
        return leaky(x)


def quant_conv3d_cell(module, x, kernel, stride, pads, features, mode, dtype):
    """int8 serving body for the 3D cells (ConvBNLeaky3D, and Conv21D's two
    halves): symmetric per-clip activation quantisation, int8 conv3d with
    int32 accumulation on the MXU, folded-BN dequant + leaky.  Same param
    contract as the 2D cell (qkernel/wscale/bias [+ xscale static])."""
    cin = x.shape[-1]
    shape = tuple(kernel) + (cin, features)
    qkernel = module.param("qkernel", nn.initializers.zeros, shape, jnp.int8)
    wscale = module.param("wscale", nn.initializers.ones, (features,), jnp.float32)
    bias = module.param("bias", nn.initializers.zeros, (features,), jnp.float32)

    xf = x.astype(jnp.float32)
    if mode == "static":
        s_x = module.param("xscale", nn.initializers.ones, (), jnp.float32)
    else:
        amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3, 4), keepdims=True)
        module.sow("quant_calib", "amax", jnp.max(amax))
        s_x = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(q.shape, shape, ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(
        q,
        qkernel,
        tuple(stride),
        pads,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    yf = y.astype(jnp.float32) * (s_x * wscale) + bias
    out = leaky(yf)
    return out.astype(dtype) if dtype is not None else out


class Conv21D(nn.Module):
    """R(2+1)D factored conv: (1,d,d) spatial then (t,1,1) temporal
    (layers.py:83-89); each half is its own conv-BN-leaky cell (and each
    quantises independently in int8 serving mode)."""

    features: int
    kernel: int = 3  # used for both t and d, as in layers.py Conv dispatcher
    mid: Optional[int] = None
    padding: int = 1
    stride: int = 1
    quant: Any = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = self.mid if self.mid is not None else self.features
        x = ConvBNLeaky3D(
            m,
            kernel=(1, self.kernel, self.kernel),
            stride=(1, self.stride, self.stride),
            padding=(0, self.padding, self.padding),
            quant=self.quant,
            dtype=self.dtype,
        )(x, train)
        x = ConvBNLeaky3D(
            self.features,
            kernel=(self.kernel, 1, 1),
            stride=(self.stride, 1, 1),
            padding=(self.padding, 0, 0),
            quant=self.quant,
            dtype=self.dtype,
        )(x, train)
        return x


class Conv1DTemporal(nn.Module):
    """Grouped temporal conv (k,1,1) + BN + leaky, zero-init weights
    (layers.py:50-60): a depthwise conv over the time axis used to merge
    temporal groups."""

    features: int
    kernel: int = 3
    padding: int = 0
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, H, W, C) with C == features; depthwise over time.
        x = nn.Conv(
            self.features,
            (self.kernel, 1, 1),
            strides=(self.stride, 1, 1),
            padding=[(self.padding, self.padding), (0, 0), (0, 0)],
            feature_group_count=self.features,
            use_bias=False,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )(x)
        return leaky(x)


class TemporalPooling(nn.Module):
    """Max/mean pool over the time axis of (B, T, ...) (layers.py:161-205).

    `pool_size`/`strides` give the windowed 'layer' style; default collapses
    the whole window ('direct' style).
    """

    type: str = "max"
    pool_size: Optional[int] = None
    strides: Optional[int] = None
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        assert self.type in ("max", "mean")
        if self.pool_size is None:
            if self.type == "max":
                return jnp.max(x, axis=1)
            return jnp.mean(x, axis=1)
        # windowed pooling over time, keeping remaining dims
        window = self.pool_size
        stride = self.strides or window
        reducer = jax.lax.max if self.type == "max" else jax.lax.add
        init = -jnp.inf if self.type == "max" else 0.0
        dims = (1, window) + (1,) * (x.ndim - 2)
        strides = (1, stride) + (1,) * (x.ndim - 2)
        pads = ((0, 0), (self.padding, self.padding)) + ((0, 0),) * (x.ndim - 2)
        out = jax.lax.reduce_window(x, init, reducer, dims, strides, pads)
        if self.type == "mean":
            out = out / window
        return out


def time_distributed(module_call: Callable, x: jnp.ndarray, *args, **kwargs):
    """Apply `module_call` over every timestep of (B, T, ...) by folding the
    time axis into the batch (layers.py:208-264, 'reshape1' style).

    Returns outputs with (B, T, ...) leading dims (handles tuple outputs).
    """
    b, t = x.shape[0], x.shape[1]
    folded = x.reshape((b * t,) + x.shape[2:])
    out = module_call(folded, *args, **kwargs)

    def unfold(y):
        return y.reshape((b, t) + y.shape[1:])

    if isinstance(out, tuple):
        return tuple(unfold(o) for o in out)
    if isinstance(out, list):
        return [unfold(o) for o in out]
    return unfold(out)


class Corr(nn.Module):
    """Correlation block over t timesteps vs the middle frame
    (layers.py:93-132).  Input (B, T, H, W, C).

    keep='all'  -> (B, H, W, T*C + n_corr*D): fold time into channels, append
                   one cost volume per compared timestep.
    keep='mid'  -> (B, H, W, C + n_corr*D): keep only the middle frame.
    keep='none' -> (B, T', H, W, D): only the stacked cost volumes.
    `comp_mid` also compares the middle frame with itself (yolo3_temporal.py
    uses keep='none', comp_mid=True).
    """

    d: int
    t: int
    kernel_size: int = 1
    stride: int = 1
    keep: str = "all"
    comp_mid: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.correlation import correlation

        assert self.keep in ("all", "mid", "none")
        b, t = x.shape[0], x.shape[1]
        assert t == self.t, (t, self.t)
        mid = t // 2
        x32 = x.astype(jnp.float32)
        frames = [x32[:, i] for i in range(t)]

        corrs = []
        for i in range(t):
            if not self.comp_mid and i == mid:
                continue
            corrs.append(
                correlation(
                    frames[i],
                    frames[mid],
                    max_displacement=self.d,
                    kernel_size=self.kernel_size,
                    stride1=self.stride,
                    stride2=self.stride,
                )
            )

        if self.keep == "none":
            return jnp.stack(corrs, axis=1)  # (B, T', H, W, D)
        if self.keep == "all":
            # fold time into channels (reference reshape (0,-3,-2))
            base = jnp.transpose(x32, (0, 2, 3, 1, 4)).reshape(
                (b,) + x.shape[2:4] + (t * x.shape[4],)
            )
        else:  # mid
            base = frames[mid]
        return jnp.concatenate([base] + corrs, axis=-1)


class ConvGRUCell(nn.Module):
    """Conv2D GRU cell (NHWC), equivalent of gluon Conv2DGRUCell used by the
    reference RNN layer (layers.py:283-296)."""

    channels: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, h, x):
        pad = (self.kernel[0] // 2, self.kernel[1] // 2)
        conv = lambda name: nn.Conv(
            3 * self.channels,
            self.kernel,
            padding=[(pad[0], pad[0]), (pad[1], pad[1])],
            name=name,
            dtype=self.dtype,
        )
        i2h = conv("i2h")(x)
        h2h = conv("h2h")(h)
        ir, iz, inn = jnp.split(i2h, 3, axis=-1)
        hr, hz, hn = jnp.split(h2h, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(inn + r * hn)
        return (1.0 - z) * n + z * h


class ConvLSTMCell(nn.Module):
    """Conv2D LSTM cell (NHWC), equivalent of gluon Conv2DLSTMCell."""

    channels: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        pad = (self.kernel[0] // 2, self.kernel[1] // 2)
        conv = lambda name: nn.Conv(
            4 * self.channels,
            self.kernel,
            padding=[(pad[0], pad[0]), (pad[1], pad[1])],
            name=name,
            dtype=self.dtype,
        )
        gates = conv("i2h")(x) + conv("h2h")(h)
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new)


class ConvRNN(nn.Module):
    """k-step conv-GRU/LSTM over (B, T, H, W, C), optionally bidirectional
    with averaged directions (layers.py:267-306).  Returns (B, T, H, W, C')."""

    channels: int
    kernel: Tuple[int, int] = (3, 3)
    type: str = "gru"
    bi: bool = True
    dtype: Optional[Dtype] = None

    def _run(self, cell, x):
        b, t = x.shape[0], x.shape[1]
        spatial = x.shape[2:4]
        if self.type == "gru":
            carry = jnp.zeros((b,) + spatial + (self.channels,), x.dtype)
        else:
            z = jnp.zeros((b,) + spatial + (self.channels,), x.dtype)
            carry = (z, z)
        outs = []
        for i in range(t):
            carry = cell(carry, x[:, i])
            outs.append(carry[0] if isinstance(carry, tuple) else carry)
        return jnp.stack(outs, axis=1)

    @nn.compact
    def __call__(self, x):
        assert self.type in ("gru", "lstm")
        cell_cls = ConvGRUCell if self.type == "gru" else ConvLSTMCell
        fwd = cell_cls(self.channels, self.kernel, dtype=self.dtype, name="fwd")
        out = self._run(fwd, x)
        if self.bi:
            bwd = cell_cls(self.channels, self.kernel, dtype=self.dtype, name="bwd")
            out_b = self._run(bwd, x[:, ::-1])[:, ::-1]
            out = (out + out_b) / 2.0
        return out
