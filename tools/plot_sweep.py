"""Plot the data-fraction sweep (Segmentation_performance.png equivalent).

Reads sweep_results.jsonl (from tools/run_fraction_sweep.py) and renders
the mIoU / PQ / AP bar chart the reference publishes
(figures/Segmentation_performance.png; BASELINE.md).

    python tools/plot_sweep.py runs/sweep/sweep_results.jsonl out.png
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "sweep.png"
    rows = [json.loads(line) for line in open(path) if line.strip()]
    rows.sort(key=lambda r: r["fraction"])
    fracs = [f"{int(r['fraction'] * 100)}%" for r in rows]
    series = {
        "mIoU": [100 * r["val_miou"] for r in rows],
        "PQ": [100 * r["pq"] for r in rows],
        "AP": [100 * r["ap"] for r in rows],
    }

    x = np.arange(len(fracs))
    width = 0.27
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for i, (name, vals) in enumerate(series.items()):
        ax.bar(x + (i - 1) * width, vals, width, label=name)
    ax.set_xticks(x)
    ax.set_xticklabels(fracs)
    ax.set_xlabel("fraction of training data")
    ax.set_ylabel("metric (%)")
    ax.set_title("Segmentation performance vs training-data fraction")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
