"""Rotation-proof sweep gate (VERDICT r03 #6).

The driver's correctness gate hash-checks the FIRST 50 entries of
``queries()`` iteration order. This test makes it impossible to rotate
an entry into that window without a CURRENT local driver-faithful green
at sf0.001 AND sf0.1: ``tools/sweep_oracles.py`` stamps every green
entry with ``catalog.entry_fingerprint`` (hash of the entry's module
source + oracle text) into ``tools/sweep_stamps/<sf>.json``, and this
test — pure hashing, no Spark jobs — asserts every oracle-backed window
entry carries a matching stamp at both scales. Editing any code in an
entry's module, or its oracle, invalidates the stamp and turns this
red until the sweep is re-run. The two scales are the ones that catch
data-dependent cross-engine classes: the rounding-tie class appeared
only at sf0.001, the int64-overflow class only at sf0.1.

Refresh with:
    SWEEP_SF_DIR=/root/testdata/sf0.001 python tools/sweep_oracles.py
    SWEEP_SF_DIR=/root/testdata/sf0.1   python tools/sweep_oracles.py
(optionally filtered by name substrings after a local edit).
"""

from __future__ import annotations

import json
import os

import pytest

from coviddatapipeline_spark.queries import catalog

WINDOW = 50
GATED_SFS = ("sf0.001", "sf0.1")
STAMP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "sweep_stamps",
)


def _stamps(sf: str) -> dict[str, str]:
    path = os.path.join(STAMP_DIR, sf + ".json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _window_names() -> list[str]:
    qs = catalog.all_queries()
    return [n for n in list(qs)[:WINDOW] if qs[n].oracle is not None]


@pytest.mark.parametrize("sf", GATED_SFS)
def test_every_window_entry_has_current_sweep_stamp(sf):
    stamps = _stamps(sf)
    stale, missing = [], []
    for name in _window_names():
        got = stamps.get(name)
        if got is None:
            missing.append(name)
        elif got != catalog.entry_fingerprint(name):
            stale.append(name)
    assert not missing and not stale, (
        f"driver-window entries not locally swept at {sf}: "
        f"missing={missing} stale={stale} — run "
        f"SWEEP_SF_DIR=/root/testdata/{sf} python tools/sweep_oracles.py "
        f"(a stale stamp means the entry's module or oracle changed "
        f"after its last sweep)"
    )


def test_fingerprint_tracks_oracle_and_module(tmp_path, monkeypatch):
    """The gate must actually trip: perturbing an oracle changes the
    fingerprint (so a stamped-then-edited entry reads as stale)."""
    name = _window_names()[0]
    before = catalog.entry_fingerprint(name)
    q = catalog.get(name)
    monkeypatch.setattr(q, "oracle", q.oracle + " -- perturbed")
    assert catalog.entry_fingerprint(name) != before
