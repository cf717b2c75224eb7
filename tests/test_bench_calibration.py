"""bench.py self-validation (r9 judge directive #1): the interleaved
aggregate-shaped calibration must stamp per-query suspicion that flags
exactly the contaminated window — r9's start/end scan-shaped
calibration passed while ~19 phantom >=1.5x deltas shipped."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import flag_suspects  # noqa: E402


def test_flag_suspects_marks_the_tainted_window():
    order = [f"q{i}" for i in range(10)]
    # checkpoints every 3 queries; the pos-6 checkpoint saw 2x inflation
    cps = [(0, 1.0), (3, 1.02), (6, 2.0), (9, 0.98), (10, 1.0)]
    got = flag_suspects(order, cps, idle_ref=1.0, thr=1.3)
    # suspect = every query flanked by the bad checkpoint: indices 3..5
    # (closing flank at 6) and 6..8 (opening flank at 6) — wait, pos 6
    # means 6 queries completed, so it OPENS the window of q6.. and
    # CLOSES q3..q5. q0-q2 and q9 have clean flanks on both sides.
    assert set(got) == {"q3", "q4", "q5"} | {"q6", "q7", "q8"}
    assert all(r == 2.0 for r in got.values())


def test_flag_suspects_clean_run_flags_nothing():
    order = [f"q{i}" for i in range(5)]
    cps = [(0, 1.1), (3, 0.9), (5, 1.2)]
    assert flag_suspects(order, cps, idle_ref=1.0, thr=1.3) == {}


def test_flag_suspects_no_reference_is_silent():
    assert flag_suspects(["a"], [(0, 1.0)], idle_ref=None) == {}
    assert flag_suspects(["a"], [(0, 1.0)], idle_ref=0.0) == {}
    assert flag_suspects(["a"], [], idle_ref=1.0) == {}


def test_flag_suspects_ignores_failed_checkpoints():
    order = ["a", "b"]
    cps = [(0, -1.0), (2, 1.0)]
    assert flag_suspects(order, cps, idle_ref=1.0) == {}


def test_bench_pressure_injection_flags_the_right_window(tmp_path):
    """End-to-end teeth: run bench.py at sf0.01 over 6 fast queries with
    checkpoints every 2 and CPU burners injected while queries 2-4 run
    (the pos-4 checkpoint lands INSIDE the pressure window) — the
    suspect map must flag the tainted window and leave the clean head
    alone, and the payload must stamp contaminated: true."""
    names = ["q1_pricing_summary", "filter_compound", "project_rename",
             "count_segments", "distinct_pairs", "slice_sorted_rows"]
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.01",
               SPARK_GRAFT_BENCH_ONLY=",".join(names),
               SPARK_GRAFT_BENCH_CAL_EVERY="2",
               SPARK_GRAFT_BENCH_PRESSURE="2:5")
    out = subprocess.run([sys.executable, str(REPO / "bench.py")],
                         capture_output=True, text=True, env=env,
                         cwd=str(REPO), timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    payload = None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            d = json.loads(line)
            if "queries" in d:
                payload = d
    assert payload, out.stdout[-2000:]
    cal = payload["calibration"]
    assert cal["query"] == "rollup_moments_stddev"
    assert cal["ref_source"] in ("median_checkpoint", "stored_idle")
    # the pos-4 checkpoint ran under burner load -> >1.3x of the ref
    suspects = set(payload["suspect"])
    assert payload["contaminated"] is True
    assert suspects, f"no suspects stamped: {cal}"
    # the clean head (flanked by pos-0 and pos-2 checkpoints, both taken
    # before injection) must not be flagged
    assert "q1_pricing_summary" not in suspects
    assert "filter_compound" not in suspects
    # the window the bad checkpoint closes/opens must be flagged
    assert {"project_rename", "count_segments"} <= suspects
