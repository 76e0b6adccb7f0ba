#!/usr/bin/env python
"""Dump reference-side parity fixtures (RUN UNDER MXNET/GLUONCV, not here).

This build environment has no mxnet, no gluoncv, and no network egress, so
true weight-level parity with the Gluon reference cannot be demonstrated
in-place.  This script packages the protocol: run it once in any environment
with `pip install mxnet gluoncv` and copy the produced files into
`tests/fixtures/` — the tests in tests/test_gluon_fixture.py then upgrade
from format-level checks to full golden parity automatically (they skip
while the fixtures are absent).

Produces, in --out (default tests/fixtures/):
  darknet53.params            gluoncv ImageNet-pretrained weights, saved via
                              gluon's own save_parameters (the byte format
                              videoyolo_tpu.utils.gluon_import must parse)
  darknet53_activations.npz   input (1,3,256,256) fixed-seed tensor + the
                              three FPN route outputs features[:15]/[15:24]/
                              [24:] (extract_base_features.py:131-133 slices)
  yolo3_voc_decode.npz        (ids, scores, bboxes) from gluoncv's
                              yolo3_darknet53_voc on the same input at
                              416px — the bit-comparability target for
                              models/yolo3.py decode + ops/nms.py

Reference surfaces being pinned: darknet/darknet.py:101 (pretrained load),
yolo3.py:172-177 (anchor decode), yolo3.py:525-530 (box_nms eval path).
"""
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import mxnet as mx
    from gluoncv import model_zoo

    ctx = mx.cpu()
    rng = np.random.RandomState(0)

    # 1. pretrained darknet53 weights in gluon's own byte format
    darknet = model_zoo.get_model("darknet53", pretrained=True, ctx=ctx)
    params_path = os.path.join(args.out, "darknet53.params")
    darknet.save_parameters(params_path)
    print("wrote", params_path)

    # 2. route activations on a fixed input (NCHW like the reference;
    #    videoyolo tests transpose to NHWC)
    x = rng.uniform(0.0, 1.0, (1, 3, 256, 256)).astype(np.float32)
    xm = mx.nd.array(x, ctx=ctx)
    f1 = darknet.features[:15](xm)
    f2 = darknet.features[15:24](f1)
    f3 = darknet.features[24:](f2)
    np.savez(
        os.path.join(args.out, "darknet53_activations.npz"),
        x=x,
        f1=f1.asnumpy(),
        f2=f2.asnumpy(),
        f3=f3.asnumpy(),
    )
    print("wrote darknet53_activations.npz",
          f1.shape, f2.shape, f3.shape)

    # 3. full-model weights + decode outputs (bit-comparability target)
    net = model_zoo.get_model("yolo3_darknet53_voc", pretrained=True, ctx=ctx)
    net.set_nms(nms_thresh=0.45, nms_topk=400, post_nms=100)
    yolo_params = os.path.join(args.out, "yolo3_darknet53_voc.params")
    net.save_parameters(yolo_params)
    print("wrote", yolo_params)
    net.hybridize()
    xd = rng.uniform(0.0, 1.0, (1, 3, 416, 416)).astype(np.float32)
    ids, scores, bboxes = net(mx.nd.array(xd, ctx=ctx))
    np.savez(
        os.path.join(args.out, "yolo3_voc_decode.npz"),
        x=xd,
        ids=ids.asnumpy(),
        scores=scores.asnumpy(),
        bboxes=bboxes.asnumpy(),
    )
    print("wrote yolo3_voc_decode.npz")


if __name__ == "__main__":
    main()
