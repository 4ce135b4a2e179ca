"""RLE codec: round-trips, pycocotools wire-format compatibility, IoU."""

import numpy as np
import pytest

from maskunet_tpu.evaluation import rle


def _random_mask(rng, h=32, w=24, p=0.3):
    return (rng.random((h, w)) < p).astype(np.uint8)


def test_roundtrip_random(rng):
    for _ in range(10):
        m = _random_mask(rng)
        np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)


def test_roundtrip_edge_cases():
    for m in [np.zeros((4, 4), np.uint8), np.ones((4, 4), np.uint8),
              np.eye(5, dtype=np.uint8)]:
        np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)


def test_known_encoding_follows_coco_coding_spec():
    """Hand-derived golden from the COCO coding spec: mask [[1,1],[0,1]]
    flattens F-order to [1,0,1,1] -> counts [0,1,1,2]; the 4th count is
    delta-coded against counts[1] (2-1=1); each value < 16 is one char at
    ASCII 48+v -> "0111"."""
    m = np.array([[1, 1], [0, 1]], np.uint8)
    enc = rle.encode(m)
    assert enc["counts"] == "0111"
    assert enc["size"] == [2, 2]


def test_negative_delta_coding_roundtrip():
    """Deltas can go negative (count smaller than counts[i-2]) — exercises
    the sign-extension path."""
    counts = [5, 40, 3, 2, 100, 1]
    from maskunet_tpu.evaluation.rle import _compress, _decompress
    assert _decompress(_compress(counts)) == counts


def test_uncompressed_counts_accepted():
    m = np.array([[1, 1], [0, 1]], np.uint8)
    out = rle.decode({"size": [2, 2], "counts": [0, 1, 1, 2]})
    np.testing.assert_array_equal(out, m)


def test_area(rng):
    m = _random_mask(rng)
    assert rle.area(rle.encode(m)) == int(m.sum())


def test_large_counts_roundtrip():
    """Counts > 31 exercise the multi-char continuation coding."""
    m = np.zeros((100, 100), np.uint8)
    m[40:60, :] = 1
    np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)


def test_iou_simple():
    a = np.zeros((10, 10), np.uint8); a[:5] = 1          # top half
    b = np.zeros((10, 10), np.uint8); b[:, :5] = 1       # left half
    m = rle.iou([rle.encode(a)], [rle.encode(b)])
    # inter 25, union 75
    np.testing.assert_allclose(m[0, 0], 25 / 75)


def test_iou_crowd_semantics():
    a = np.zeros((10, 10), np.uint8); a[:5] = 1
    b = np.ones((10, 10), np.uint8)                      # crowd region
    m = rle.iou([rle.encode(a)], [rle.encode(b)], iscrowd=[True])
    # union = det area = 50, inter = 50
    np.testing.assert_allclose(m[0, 0], 1.0)


def test_merge():
    a = np.zeros((6, 6), np.uint8); a[:3] = 1
    b = np.zeros((6, 6), np.uint8); b[:, :3] = 1
    merged = rle.decode(rle.merge([rle.encode(a), rle.encode(b)]))
    np.testing.assert_array_equal(merged, (a | b))


def test_polygon_rasterization():
    # 10x10 square polygon covering x,y in [2,8)
    mask = rle.polygons_to_mask([[2, 2, 7, 2, 7, 7, 2, 7]], 10, 10)
    assert mask[4, 4] == 1
    assert mask[0, 0] == 0
    assert 25 <= mask.sum() <= 49   # rasterizer boundary tolerance
