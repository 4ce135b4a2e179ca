"""Native maskops library vs cv2 / numpy references."""

import numpy as np
import pytest

from maskunet_tpu.evaluation import rle
from maskunet_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_cc_matches_cv2(rng):
    import cv2

    for _ in range(5):
        mask = (rng.random((48, 64)) < 0.4).astype(np.uint8)
        n_ref, lab_ref = cv2.connectedComponents(mask)
        n_nat, lab_nat = native.cc_label(mask)
        assert n_nat == n_ref
        # same partition (labels may be permuted): compare canonical forms
        for labs in (lab_ref, lab_nat):
            assert (labs > 0).sum() == mask.sum()
        # bijection check
        pairs = set(zip(lab_ref.ravel().tolist(), lab_nat.ravel().tolist()))
        assert len(pairs) == n_ref


def test_rle_counts_match_python(rng):
    for _ in range(5):
        mask = (rng.random((32, 24)) < 0.3).astype(np.uint8)
        enc = rle.encode(mask)
        from maskunet_tpu.evaluation.rle import _decompress
        py_counts = _decompress(enc["counts"])
        nat_counts = native.rle_encode_counts(mask)
        assert nat_counts == py_counts
        np.testing.assert_array_equal(
            native.rle_decode_counts(nat_counts, 32, 24), mask)


def test_native_iou_matches_numpy(rng):
    dts = [(rng.random((40, 40)) < p).astype(np.uint8)
           for p in (0.2, 0.5, 0.8)]
    gts = [(rng.random((40, 40)) < p).astype(np.uint8) for p in (0.3, 0.6)]
    dt_rles = [rle.encode(m) for m in dts]
    gt_rles = [rle.encode(m) for m in gts]
    got = native.mask_iou(np.stack(dts), np.stack(gts))
    # numpy reference path
    expect = np.zeros((3, 2))
    for i, d in enumerate(dts):
        for j, g in enumerate(gts):
            inter = int((d & g).sum())
            union = int(d.sum() + g.sum()) - inter
            expect[i, j] = inter / union
    np.testing.assert_allclose(got, expect, rtol=1e-12)
    # and the rle.iou entry point dispatches to it
    via_rle = rle.iou(dt_rles, gt_rles)
    np.testing.assert_allclose(via_rle, expect, rtol=1e-12)


def test_native_iou_crowd(rng):
    d = np.zeros((10, 10), np.uint8); d[:5] = 1
    g = np.ones((10, 10), np.uint8)
    got = native.mask_iou(d[None], g[None], np.array([1], np.uint8))
    np.testing.assert_allclose(got[0, 0], 1.0)
