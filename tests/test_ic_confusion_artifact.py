"""Floors on the committed IC-classifier confusion artifact
(VERDICT r2 #7; artifact: tests/data/ic_confusion.json, produced by
tools/ic_confusion.py).

The artifact measures the classifier on *messy* mixtures — pink-noise
background leak at 10/25/40 % of component variance, blurred
topographies, fs ∈ {250, 512, 1024, 2048}, montages of 19/32/64
channels, multi-seed — the regime the clean per-class injection suite
(test_ic_classify.py) does not cover.  These floors sit slightly below
the measured values so a regression of any feature/threshold fails CI
while ordinary Monte-Carlo regeneration noise does not.
"""
import json
from pathlib import Path

import pytest

ARTIFACT = Path(__file__).resolve().parent / "data" / "ic_confusion.json"

# measured (2026-08-17): brain/blink/muscle/channel/line 1.0,
# heart beat 0.965, exclude precision 1.0
RECALL_FLOORS = {
    "brain": 0.97,
    "eye blink": 0.95,
    "heart beat": 0.85,
    "muscle artifact": 0.95,
    "channel noise": 0.95,
    "line noise": 0.95,
}
EXCLUDE_PRECISION_FLOOR = 0.97
LEAK_ACCURACY_FLOORS = {"0.1": 0.97, "0.25": 0.95, "0.4": 0.90}


@pytest.fixture(scope="module")
def artifact():
    if not ARTIFACT.exists():
        pytest.skip("ic_confusion.json not generated")
    return json.loads(ARTIFACT.read_text())


def test_grid_is_the_committed_sweep(artifact):
    cfg = artifact["config"]
    assert sorted(cfg["fs"]) == [250.0, 512.0, 1024.0, 2048.0]
    assert sorted(cfg["montages"]) == [19, 32, 64]
    assert sorted(cfg["leaks"]) == [0.1, 0.25, 0.4]
    for cls, floor in RECALL_FLOORS.items():
        assert artifact["per_class"][cls]["n"] >= 100, cls


def test_per_class_recall_floors(artifact):
    for cls, floor in RECALL_FLOORS.items():
        got = artifact["per_class"][cls]["label_recall"]
        assert got >= floor, f"{cls}: recall {got} < floor {floor}"


def test_exclude_precision_floor(artifact):
    """Flagging a brain component for exclusion destroys signal — the
    precision of the exclude decision must stay near-perfect."""
    got = artifact["exclude_precision"]
    assert got >= EXCLUDE_PRECISION_FLOOR, got


def test_exclude_accuracy_under_leak(artifact):
    """The exclude decision must degrade gracefully with background
    contamination, staying ≥ 90 % even at 40 % leaked variance."""
    for leak, floor in LEAK_ACCURACY_FLOORS.items():
        got = artifact["per_leak"][leak]["exclude_decision_accuracy"]
        assert got >= floor, f"leak {leak}: {got} < {floor}"
