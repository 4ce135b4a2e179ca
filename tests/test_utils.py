"""Aux subsystems: visualization, subsetting, profiling guards."""

import numpy as np
import pytest

from maskunet_tpu.data.subset import FractionSubset
from maskunet_tpu.data.synthetic import SyntheticSegmentationDataset
from maskunet_tpu.utils import visualize
from maskunet_tpu.utils.profiling import NonFiniteError, nan_guard


def test_fraction_subset_nested_and_deterministic():
    ds = SyntheticSegmentationDataset(num_examples=40, img_size=16)
    s10 = FractionSubset(ds, 0.10, seed=7)
    s25 = FractionSubset(ds, 0.25, seed=7)
    assert len(s10) == 4 and len(s25) == 10
    assert set(s10.indices).issubset(set(s25.indices))
    # metadata delegation
    assert s10.num_classes == ds.num_classes
    np.testing.assert_array_equal(s10[0]["image"],
                                  ds[int(s10.indices[0])]["image"])


def test_fraction_subset_validates():
    ds = SyntheticSegmentationDataset(num_examples=4, img_size=16)
    with pytest.raises(ValueError):
        FractionSubset(ds, 0.0)


def test_visualize_sample_and_prediction(tmp_path):
    ds = SyntheticSegmentationDataset(num_examples=2, img_size=16,
                                      with_instance=True)
    ex = ds[0]
    p1 = str(tmp_path / "sample.png")
    visualize.save_sample(ex, p1)
    p2 = str(tmp_path / "pred.png")
    visualize.save_prediction(ex["image"], ex["label"], ex["label"], p2)
    import os
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0


def test_nan_guard():
    nan_guard({"loss": np.float32(1.0)})
    with pytest.raises(NonFiniteError, match="loss"):
        nan_guard({"loss": np.float32("nan")})
