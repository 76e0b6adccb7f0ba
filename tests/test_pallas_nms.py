"""Pallas greedy-NMS kernel: bit-equivalence with the XLA scan
(ops/nms.py) in interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np

from videoyolo_tpu.ops.nms import _nms_single
from videoyolo_tpu.ops.pallas_nms import nms_scan_pallas


def _sorted_candidates(b, k, n_classes, seed):
    rs = np.random.RandomState(seed)
    scores = np.sort(rs.rand(b, k))[:, ::-1].astype(np.float32)
    ids = rs.randint(0, n_classes, (b, k)).astype(np.float32)
    xy = rs.rand(b, k, 2).astype(np.float32) * 50
    wh = rs.rand(b, k, 2).astype(np.float32) * 40 + 5
    return np.concatenate([ids[..., None], scores[..., None], xy, xy + wh], -1)


def test_pallas_nms_matches_xla_scan():
    dets = _sorted_candidates(3, 40, 4, 0)
    keep = np.asarray(nms_scan_pallas(jnp.asarray(dets), interpret=True))
    ref = np.asarray(
        jax.vmap(lambda d: _nms_single(d, 0.45, 0.01, -1, -1, False))(
            jnp.asarray(dets)
        )
    )
    for b in range(dets.shape[0]):
        kept_rows = dets[b][keep[b] > 0]
        ref_rows = ref[b][ref[b][:, 0] >= 0]
        assert len(kept_rows) == len(ref_rows)
        np.testing.assert_allclose(kept_rows, ref_rows, rtol=1e-6)


def test_pallas_nms_force_suppress_and_valid_thresh():
    dets = _sorted_candidates(2, 24, 3, 1)
    dets[:, -6:, 1] = 0.001  # below valid_thresh
    keep = np.asarray(
        nms_scan_pallas(jnp.asarray(dets), force_suppress=True, interpret=True)
    )
    ref = np.asarray(
        jax.vmap(lambda d: _nms_single(d, 0.45, 0.01, -1, -1, True))(
            jnp.asarray(dets)
        )
    )
    assert (keep[:, -6:] == 0).all()
    for b in range(dets.shape[0]):
        assert keep[b].sum() == (ref[b][:, 0] >= 0).sum()
