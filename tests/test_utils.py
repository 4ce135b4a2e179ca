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


def test_stall_watchdog_fires_and_beat_resets():
    """StallWatchdog (SURVEY.md §5 failure detection): fires on_stall
    when no beat arrives within the timeout; a beating loop never
    stalls; warn-only mode keeps the process alive and re-arms."""
    import time

    from maskunet_tpu.utils.profiling import StallWatchdog

    fired = []
    with StallWatchdog(0.15, poll_s=0.02,
                       on_stall=lambda el, ctx: fired.append(ctx)) as wd:
        wd.beat("step 1")
        time.sleep(0.4)   # stall: > timeout with no beat
    assert fired and fired[0] == "step 1"
    assert wd.stalls >= 1

    fired.clear()
    with StallWatchdog(0.3, poll_s=0.02,
                       on_stall=lambda el, ctx: fired.append(ctx)) as wd:
        for i in range(8):   # beating faster than the timeout: no stall
            wd.beat(f"step {i}")
            time.sleep(0.05)
    assert not fired and wd.stalls == 0


def test_stall_watchdog_abort_exits_42():
    """abort=True hard-exits with the documented supervisor-visible
    code (a blocked device sync cannot raise, so exit is the only
    fail-fast available). Run in a subprocess: os._exit would take
    pytest down with it."""
    import subprocess
    import sys

    from maskunet_tpu.utils.profiling import StallWatchdog

    code = (
        "import time\n"
        "from maskunet_tpu.utils.profiling import StallWatchdog\n"
        "with StallWatchdog(0.1, poll_s=0.02, abort=True):\n"
        "    time.sleep(30)\n"
        "print('unreachable')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=60)
    assert proc.returncode == StallWatchdog.EXIT_CODE
    assert "watchdog" in proc.stderr
    assert "unreachable" not in proc.stdout


def test_stall_watchdog_pause_resume():
    """pause() suspends stall detection (epoch-end validation/checkpoint
    windows are legitimately slower than a step-sized timeout); resume()
    re-arms with a fresh clock."""
    import time

    from maskunet_tpu.utils.profiling import StallWatchdog

    fired = []
    with StallWatchdog(0.12, poll_s=0.02,
                       on_stall=lambda el, ctx: fired.append(ctx)) as wd:
        wd.pause("eval window")
        time.sleep(0.4)    # well past the timeout: paused -> no stall
        assert wd.stalls == 0 and not fired
        wd.resume()
        time.sleep(0.4)    # armed again with no beats -> stalls
    assert wd.stalls >= 1 and fired
