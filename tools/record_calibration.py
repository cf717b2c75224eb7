"""Record the per-SF idle calibration reference for bench.py.

Usage:  python tools/record_calibration.py [sf_dir ...]
        (default: sf0.001, sf0.01, sf0.1 under /root/testdata)

Reproduces EXACTLY the bench harness's opening-checkpoint procedure —
fresh session, parquet-footer warm count, 2 untimed calibration
warm-ups, then timed best-of-N with the same post-run cleanup — so a
clean run's opening checkpoint reads ~1.0x of the stored ref instead
of systematically high (the r10 flake: the sf0.01 self-test had no
stored ref, self-referenced the upper-median checkpoint, and the
warm-start-drifted opening checkpoint absorbed the pressured one).

Refuses to record under load (1-min loadavg must be < 2): a reference
taken on a busy host would silently raise the contamination threshold
for every future run at that SF.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEST_OF = 5


def record(sf_dir: str) -> float:
    import bench
    from crysda_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("record_calibration")
    from crysda_spark.plans.sizing import apply_recommended_shuffle_partitions
    apply_recommended_shuffle_partitions(spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    cal_fn = entry.queries()[bench.CAL_NAME]

    from crysda_spark.plans.cache import release_pinned

    def cleanup():
        release_pinned()
        spark.catalog.clearCache()
        import gc
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:
            pass

    def run_once() -> float:
        t0 = time.perf_counter()
        cal_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        cleanup()
        return sec

    run_once()  # untimed warm-up x2 — the bench's opening discipline
    run_once()
    best = min(run_once() for _ in range(BEST_OF))
    return round(best, 3)


def main() -> None:
    pregated = len(sys.argv) >= 3 and sys.argv[1] == "--one-pregated"
    load1 = os.getloadavg()[0]
    if not pregated:
        if load1 >= 1.0:
            # r12 advice: the r11 sf0.1 ref was recorded at loadavg
            # 1.59 — under the old <2 gate but ~9% above truly idle,
            # loosening the contamination threshold at the headline
            # SF. References demand a stricter window than ordinary
            # runs. The gate runs ONCE, before any recording: the
            # recording JVMs themselves push 1-min loadavg past 1, so
            # per-SF child re-checks would reject their own
            # self-induced load (the --one-pregated internal flag).
            raise SystemExit(
                f"refusing to record: 1-min loadavg {load1:.2f} >= 1 — "
                "an idle reference taken under ANY measurable load "
                "would mask contamination in every future run at this "
                "SF")
    if len(sys.argv) >= 3 and sys.argv[1] in ("--one", "--one-pregated"):
        print(record(sys.argv[2]))
        return
    sf_dirs = sys.argv[1:] or [f"/root/testdata/sf{s}"
                               for s in ("0.001", "0.01", "0.1")]
    path = os.path.join(REPO, "BENCH_CALIBRATION.json")
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except (OSError, ValueError):
        doc = {}
    import bench
    doc.setdefault("query", bench.CAL_NAME)
    by_sf = doc.setdefault("idle_sec_by_sf", {})
    import subprocess
    for sf_dir in sf_dirs:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
        if len(sf_dirs) > 1:
            # fresh JVM per SF — getOrCreate would otherwise reuse one
            # warm session and only the first SF would see the bench's
            # true opening-checkpoint state
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one-pregated", sf_dir],
                capture_output=True, text=True, cwd=REPO, timeout=900)
            if out.returncode != 0:
                raise SystemExit(f"record failed for {sf_dir}:\n"
                                 + out.stderr[-2000:])
            sec = float(out.stdout.strip().splitlines()[-1])
        else:
            sec = record(sf_dir)
        by_sf[f"{sf:g}"] = sec
        print(f"sf={sf:g}: idle best-of-{BEST_OF} = {sec}s "
              f"(load {os.getloadavg()[0]:.2f})")
    doc["recorded_with"] = (
        f"tools/record_calibration.py best-of-{BEST_OF}, fresh session, "
        "x2 untimed warm-up, post-run cleanup — the bench opening-"
        "checkpoint procedure, so clean opening checkpoints read ~1.0x")
    # pre-flight loadavg, NOT the post-run one — the recording JVMs
    # themselves push 1-min loadavg to ~1.5 by the time they finish
    doc["load_avg_pre_record"] = round(load1, 2)
    doc.pop("load_avg_at_record", None)
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
