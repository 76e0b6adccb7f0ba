"""Hand-computed golden tests for the VOC mAP metrics."""
import numpy as np

from videoyolo_tpu.metrics import VOC07MApMetric, VOCMApMetric, VOCMApMetricTemporal


def _update_single(metric, preds, gts, difficults=None):
    """preds: (N,6) rows (cls, score, x1,y1,x2,y2); gts: (M,5) rows (x1..y2, cls)."""
    pred_bboxes = preds[None, :, 2:6]
    pred_labels = preds[None, :, 0]
    pred_scores = preds[None, :, 1]
    gt_bboxes = gts[None, :, :4]
    gt_labels = gts[None, :, 4]
    gt_diff = None if difficults is None else difficults[None]
    metric.update(pred_bboxes, pred_labels, pred_scores, gt_bboxes, gt_labels, gt_diff)


def test_perfect_detection_ap_1():
    m = VOCMApMetric(iou_thresh=0.5, class_names=["a", "b"])
    preds = np.array([[0, 0.9, 10, 10, 50, 50]], np.float64)
    gts = np.array([[10, 10, 50, 50, 0]], np.float64)
    _update_single(m, preds, gts)
    names, values = m.get()
    assert names[-1] == "mAP"
    np.testing.assert_allclose(values[0], 1.0)
    np.testing.assert_allclose(values[-1], 1.0)  # class b has no gt -> nan excluded


def test_false_positive_halves_precision():
    m = VOCMApMetric(iou_thresh=0.5, class_names=["a"])
    preds = np.array(
        [[0, 0.9, 10, 10, 50, 50], [0, 0.8, 200, 200, 250, 250]], np.float64
    )
    gts = np.array([[10, 10, 50, 50, 0]], np.float64)
    _update_single(m, preds, gts)
    _, values = m.get()
    # TP at rank1 (P=1, R=1), FP at rank2: integrated AP = 1.0
    np.testing.assert_allclose(values[0], 1.0)

    m.reset()
    preds = np.array(
        [[0, 0.9, 200, 200, 250, 250], [0, 0.8, 10, 10, 50, 50]], np.float64
    )
    _update_single(m, preds, gts)
    _, values = m.get()
    # FP first: P at R=1 is 0.5 -> AP 0.5
    np.testing.assert_allclose(values[0], 0.5)


def test_duplicate_detection_is_fp():
    m = VOCMApMetric(iou_thresh=0.5, class_names=["a"])
    preds = np.array(
        [[0, 0.9, 10, 10, 50, 50], [0, 0.8, 11, 11, 50, 50]], np.float64
    )
    gts = np.array([[10, 10, 50, 50, 0]], np.float64)
    _update_single(m, preds, gts)
    _, values = m.get()
    np.testing.assert_allclose(values[0], 1.0)  # dup is FP after R=1 -> AP unaffected
    np.testing.assert_array_equal(np.concatenate(m._match[0]), [1, 0])


def test_difficult_gt_ignored():
    m = VOCMApMetric(iou_thresh=0.5, class_names=["a"])
    preds = np.array([[0, 0.9, 10, 10, 50, 50]], np.float64)
    gts = np.array([[10, 10, 50, 50, 0]], np.float64)
    _update_single(m, preds, gts, difficults=np.array([1.0]))
    _, values = m.get()
    # matched to a difficult gt: match=-1, n_pos=0 -> AP nan
    assert np.isnan(values[0])
    np.testing.assert_array_equal(np.concatenate(m._match[0]), [-1])


def test_low_iou_is_fp():
    m = VOCMApMetric(iou_thresh=0.5, class_names=["a"])
    preds = np.array([[0, 0.9, 10, 10, 30, 30]], np.float64)
    gts = np.array([[10, 10, 50, 50, 0]], np.float64)
    _update_single(m, preds, gts)
    _, values = m.get()
    np.testing.assert_allclose(values[0], 0.0)


def test_voc07_eleven_point():
    m = VOC07MApMetric(iou_thresh=0.5, class_names=["a"])
    preds = np.array(
        [[0, 0.9, 200, 200, 250, 250], [0, 0.8, 10, 10, 50, 50]], np.float64
    )
    gts = np.array([[10, 10, 50, 50, 0]], np.float64)
    _update_single(m, preds, gts)
    _, values = m.get()
    # P=0.5 at all recall points -> 11-point AP = 0.5
    np.testing.assert_allclose(values[0], 0.5, atol=1e-6)


def test_class_map_remaps_gt():
    # model predicts in a 2-class space; eval set classes map into it
    m = VOCMApMetric(iou_thresh=0.5, class_names=["x", "y"], class_map=[1, 0])
    preds = np.array([[1, 0.9, 10, 10, 50, 50]], np.float64)
    gts = np.array([[10, 10, 50, 50, 0]], np.float64)  # eval class 0 -> model class 1
    _update_single(m, preds, gts)
    names, values = m.get()
    np.testing.assert_allclose(values[0], 1.0)  # class x reads model class 1's AP


def test_streaming_accumulation():
    m = VOCMApMetric(iou_thresh=0.5, class_names=["a"])
    gts = np.array([[10, 10, 50, 50, 0]], np.float64)
    _update_single(m, np.array([[0, 0.9, 10, 10, 50, 50]], np.float64), gts)
    _update_single(m, np.array([[0, 0.8, 200, 200, 250, 250]], np.float64), gts)
    _, values = m.get()
    # 2 gts, 1 TP, 1 FP: recall maxes at 0.5 with P=1 -> AP 0.5
    np.testing.assert_allclose(values[0], 0.5)


def test_temporal_metric():
    m = VOCMApMetricTemporal(t=2, iou_thresh=0.5, class_names=["a"])
    preds = np.array([[0, 0.9, 10, 10, 50, 50]], np.float64)
    gts = np.array([[10, 10, 50, 50, 0]], np.float64)
    m.update_t(0, preds[None, :, 2:6], preds[None, :, 0], preds[None, :, 1],
               gts[None, :, :4], gts[None, :, 4])
    names, values = m.get()
    assert any(n.startswith("t0:") for n in names)
    assert any(n.startswith("t1:") for n in names)


def _oracle_match(pred_boxes, pred_scores, gt_boxes, gt_difficult, thresh):
    """Sequential VOC greedy matcher (protocol as published; used only as a
    test oracle for the vectorised _match_class)."""
    from videoyolo_tpu.ops.bbox import np_bbox_iou

    order = np.argsort(-pred_scores, kind="stable")
    out = []
    selec = np.zeros(len(gt_boxes), bool)
    for i in order:
        if len(gt_boxes) == 0:
            out.append(0)
            continue
        iou = np_bbox_iou(pred_boxes[i : i + 1], gt_boxes)[0]
        j = int(iou.argmax())
        if iou[j] < thresh:
            out.append(0)
            continue
        if gt_difficult[j]:
            out.append(-1)
        else:
            out.append(1 if not selec[j] else 0)
        selec[j] = True
    return np.asarray(out, np.int8)


def test_vectorised_match_equals_sequential_oracle():
    from videoyolo_tpu.metrics.pascalvoc import _match_class

    rs = np.random.RandomState(7)
    for trial in range(200):
        n, m = rs.randint(0, 8), rs.randint(0, 5)
        pb = rs.uniform(0, 80, (n, 2))
        pred_boxes = np.concatenate([pb, pb + rs.uniform(5, 40, (n, 2))], axis=1)
        gb = rs.uniform(0, 80, (m, 2))
        gt_boxes = np.concatenate([gb, gb + rs.uniform(5, 40, (m, 2))], axis=1)
        scores = rs.uniform(0, 1, n)
        difficult = rs.randint(0, 2, m).astype(float)
        got_scores, got = _match_class(pred_boxes, scores, gt_boxes, difficult, 0.35)
        want = _oracle_match(pred_boxes, scores, gt_boxes, difficult, 0.35)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(got_scores, np.sort(scores)[::-1])


def test_update_without_difficults_multiple_gts():
    """Regression: gt_difficults=None with >1 valid gt must not be wrapped
    into a 0-d object array (np.asarray(None)) — found driving combined
    class-tree validation where VID batches carry no difficult column."""
    m = VOCMApMetric(iou_thresh=0.5, class_names=["a", "b"])
    gt_boxes = np.array([[[0, 0, 10, 10], [20, 20, 40, 40]]], np.float64)
    gt_ids = np.array([[[0], [1]]], np.float64)
    preds = np.array([[[0, 0, 10, 10], [20, 20, 40, 40]]], np.float64)
    pred_ids = np.array([[[0], [1]]], np.float64)
    scores = np.array([[[0.9], [0.8]]], np.float64)
    m.update(preds, pred_ids, scores, gt_boxes, gt_ids, None)
    names, values = m.get()
    assert values[-1] == 1.0
