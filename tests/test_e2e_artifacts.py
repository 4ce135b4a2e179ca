"""Committed e2e evidence artifacts keep their gate invariants.

VERDICT r3 weak #7: the nine-recipe e2e gate must ASSERT the documented
degenerate coco_instance AP (summed-target classes are overlap counts,
reference coco_instance.py:331-341; PARITY.md §2.4) rather than skip the
recipe. These tests pin the committed artifacts so a regenerated run
that silently drops a recipe, errors out, or zeroes a metric fails the
default suite — they are artifact-shape checks (no model compile, runs
in the smoke tier).
"""
import json
import os

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ALL_RECIPES = {
    "ade_semantic", "ade_instance", "ade_panoptic",
    "city_semantic", "city_instance", "city_panoptic",
    "coco_semantic", "coco_instance", "coco_panoptic",
}


def _load_tool(name):
    """Import a tools/ script by path WITHOUT putting tools/ on sys.path
    (30 script names would shadow imports for the rest of the session)."""
    import importlib.util

    path = os.path.join(_ROOT, "tools", name + ".py")
    spec = importlib.util.spec_from_file_location(f"_tool_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load(name):
    path = os.path.join(_ROOT, name)
    if not os.path.exists(path):
        pytest.fail(f"{name} missing — regenerate with "
                    f"tools/run_all_recipes.py (it is committed evidence, "
                    f"not a build product)")
    with open(path) as f:
        return json.load(f)


def test_e2e_covers_all_nine_recipes_without_errors():
    rows = {r["recipe"]: r for r in _load("recipes_e2e.json")["rows"]}
    assert set(rows) == _ALL_RECIPES
    errored = [n for n, r in rows.items() if "error" in r]
    assert not errored, f"e2e rows with errors: {errored}"


def test_e2e_metric_rows_are_nonzero():
    rows = {r["recipe"]: r for r in _load("recipes_e2e.json")["rows"]}
    for name, r in rows.items():
        if name.endswith("_panoptic"):
            assert r["pq"] > 0.0, name
            assert r["ap"] > 0.0, name
        if name.endswith("_instance"):
            assert r["ap"] > 0.0, name


def test_e2e_asserts_coco_instance_degenerate_ap_not_skipped():
    """The degenerate recipe is measured through the full eval path."""
    rows = {r["recipe"]: r for r in _load("recipes_e2e.json")["rows"]}
    row = rows["coco_instance"]
    # recorded AND nonzero: the class-agnostic AP flows through RLE
    # encode -> _ragged_coco_gt -> COCOeval, so a break anywhere in the
    # instance eval stack zeroes it
    assert "ap" in row and row["ap"] > 0.0
    # training still learns on the summed-target CE
    assert row["val_miou"] > 0.0


def test_fraction_sweep_at_reference_hparams_is_monotone():
    """VERDICT r4 #2: the reference's headline data-fraction experiment
    (10/25/50/75/100% of panoptic train data,
    figures/Segmentation_performance.png, README.md:103-105) re-run at
    the REFERENCE hyperparameters — coco_panoptic lr 1e-5 / wd 1e-4
    (reference coco_panoptic.py:528), NO lr override — must show the
    more-data -> better trend in all three metrics, averaged over 3
    training seeds (tools/run_fraction_sweep.py --seeds 3
    --max-epochs 100, early-stop patience 10 inside the budget)."""
    path = os.path.join(_ROOT, "sweep_fake_r4.jsonl")
    if not os.path.exists(path):
        pytest.fail("sweep_fake_r4.jsonl missing — regenerate with "
                    "tools/run_fraction_sweep.py --seeds 3 (committed "
                    "evidence, not a build product)")
    with open(path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    assert [r["fraction"] for r in rows] == [0.1, 0.25, 0.5, 0.75, 1.0]
    for r in rows:
        # the defining property of this artifact vs sweep_fake_r3: the
        # recipe's own hyperparameters, not the 1e-3 demo override
        assert r["lr_override"] is None, r["fraction"]
        assert r["seeds"] == 3 and len(r["per_seed_pq"]) == 3
        assert all(p > 0.0 for p in r["per_seed_pq"])
    for key in ("val_miou", "pq", "ap"):
        vals = [r[key] for r in rows]
        assert vals == sorted(vals), (key, vals)
        assert vals[0] > 0.0, key


def test_plateau_artifact_reaches_demo_band_or_documents_gap():
    """VERDICT r4 #3: plateau-bounded convergence at reference lrs.

    recipes_plateau.json records tools/run_all_recipes.py --plateau runs:
    each learnable recipe trains at its REFERENCE hyperparameters with
    EarlyStopping(patience=10, reference ade_semantic.py:382) plus the
    reference's overfit guard until it stops on its own (or exhausts a
    uniform 20k-step budget). Every metric must either reach the 8-epoch
    demo-lr band (within the recorded tolerance) or carry a written,
    measured explanation in documented_gaps.
    """
    data = _load("recipes_plateau.json")
    assert data.get("lr_override") is None
    assert data.get("plateau") is True
    rows = {r["recipe"]: r for r in data["rows"]}
    # the two lr=1e-2 recipes are the ref-lr artifact's documented
    # real-data-scale exceptions; everything else must be here
    exceptions = set(_load("recipes_e2e_ref_lr.json")
                     .get("documented_exceptions", {}))
    assert exceptions == {"ade_instance", "city_panoptic"}
    assert set(rows) == _ALL_RECIPES - exceptions
    tol = data["band_tolerance"]
    comparison = data["band_comparison"]
    gaps = data["documented_gaps"]
    for name, r in rows.items():
        # the run terminated by its own stopping logic, not a crash
        assert r["stop_reason"] in ("early_stop", "overfit_guard",
                                    "completed"), (name, r["stop_reason"])
        assert r["loss_decreased"], name
        # plateau = the run got PAST the 8-epoch snapshot regime
        assert r["epochs_run"] > 8, (name, r["epochs_run"])
        for metric, c in comparison[name].items():
            # the comparison was computed against the committed demo
            # artifact and each miss carries a written explanation
            if c["plateau"] < c["demo_band"] - tol:
                assert not c["reaches_band"]
                doc = gaps.get(f"{name}.{metric}", "")
                assert len(doc) > 50, (name, metric, c)
            else:
                assert c["reaches_band"], (name, metric, c)


def test_ref_lr_artifact_shows_learning_at_reference_hparams():
    """VERDICT r3 #2: convergence at the reference lrs (no override).

    Every recipe must learn at its reference hyperparameters, EXCEPT
    recipes the artifact itself documents as needing real-data scale
    (the two lr=1e-2 scripts) — those must carry a written explanation
    and still run error-free through the full train/eval path.
    """
    name = "recipes_e2e_ref_lr.json"
    data = _load(name)
    assert data.get("lr_override") is None
    rows = {r["recipe"]: r for r in data["rows"]}
    assert set(rows) == _ALL_RECIPES
    errored = [n for n, r in rows.items() if "error" in r]
    assert not errored, f"ref-lr rows with errors: {errored}"
    exceptions = data.get("documented_exceptions", {})
    for n, r in rows.items():
        traj = r["loss_trajectory"]
        assert len(traj) >= 2 and all(x == x for x in traj), n
        if n in exceptions:
            # documented real-data-scale recipe: explanation present,
            # and only the aggressive-lr scripts qualify
            assert len(exceptions[n]) > 50
            assert r["lr"] >= 1e-2, (n, r["lr"])
            continue
        assert r["loss_decreased"], (n, traj)
        # the VERDICT-named low-lr recipes must also produce nonzero
        # metrics through the full eval stack
        if "pq" in r:
            assert r["pq"] > 0.0, n
        if "ap" in r:
            assert r["ap"] > 0.0, n


def test_plateau_band_comparison_matches_rebuild_tool():
    """band_comparison must be exactly what tools/plateau_bands.py
    derives from the rows — the committed comparison can't drift from
    the committed evidence (it was hand-assembled once; now locked)."""
    plateau_bands = _load_tool("plateau_bands")
    plateau = _load("recipes_plateau.json")
    demo = _load("recipes_e2e.json")
    comparison, misses = plateau_bands.build_comparison(plateau, demo)
    assert comparison == plateau["band_comparison"]
    assert {f"{n}.{m}" for n, m in misses} == set(
        plateau["documented_gaps"])


def test_plateau_bands_tool_prefers_best_checkpoint_eval():
    """The best-checkpoint eval columns (keep_best_state runs) are the
    reference-faithful plateau figure (it reloads its best checkpoint,
    ade_panoptic.py:432-435): the tool must use max(final, best), record
    both, and apply the band tolerance on the miss edge."""
    plateau_bands = _load_tool("plateau_bands")
    plateau = {
        "band_tolerance": 0.02,
        "rows": [
            # best rescues a post-dip final -> reaches band
            {"recipe": "a", "val_miou": 0.80, "val_miou_best": 0.93},
            # no best column -> final used; inside tolerance edge
            {"recipe": "b", "val_miou": 0.885},
            # best present but still a miss
            {"recipe": "c", "pq": 0.70, "pq_best": 0.75},
        ],
    }
    demo = {"rows": [
        {"recipe": "a", "val_miou": 0.92},
        {"recipe": "b", "val_miou": 0.90},
        {"recipe": "c", "pq": 0.90},
    ]}
    comparison, misses = plateau_bands.build_comparison(plateau, demo)
    a = comparison["a"]["val_miou"]
    assert a["plateau"] == 0.93 and a["reaches_band"]
    assert a["plateau_final"] == 0.80 and a["plateau_best"] == 0.93
    b = comparison["b"]["val_miou"]
    assert b["plateau"] == 0.885 and b["reaches_band"]
    assert "plateau_best" not in b
    c = comparison["c"]["pq"]
    assert c["plateau"] == 0.75 and not c["reaches_band"]
    assert misses == [("c", "pq")]
    # a metric the demo artifact records but the re-run row LOST (e.g. a
    # crashed eval) is a miss that demands documentation, not a silent
    # skip that would also prune its existing gap prose
    plateau["rows"].append({"recipe": "d", "val_miou": 0.5})
    demo["rows"].append({"recipe": "d", "val_miou": 0.4, "pq": 0.9})
    comparison, misses = plateau_bands.build_comparison(plateau, demo)
    assert ("d", "pq") in misses
    assert "pq" not in comparison["d"]
    assert comparison["d"]["val_miou"]["reaches_band"]
