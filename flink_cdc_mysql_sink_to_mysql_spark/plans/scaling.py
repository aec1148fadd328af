"""Scaling-efficiency evidence (BASELINE.json north rule).

The rule demands throughput scaling efficiency ≥0.8 from N to 4N
executors. No real cluster exists in this sandbox, so — per BASELINE.md —
we run the IDENTICAL job on IDENTICAL input at two local parallelism
levels (local[N] vs local[4N]) and report turns/sec at both plus
efficiency = (thr_4N / thr_N) / 4.

Choice of N: this sandbox advertises 32 vCPUs but a raw multi-process
CPU probe (fixed per-process work, no JVM) shows aggregate throughput
caps at ~15 effective cores — a hypervisor/cgroup quota, not a property
of the job: per-process wall time is flat from 1→8 processes and
degrades beyond. N=2 vs 4N=8 therefore measures the job's scaling
inside the region where the machine itself scales; 8 vs 32 would
measure the quota. (On a real cluster the equivalent guardrail is
executors × cores ≤ physical cores per node.)

The measured job is the full changelog-apply pipeline (envelope →
last-writer-wins materialization → event derivation → sink projection →
noop sink). Input is synthesized from ``spark.range`` with deterministic
arithmetic — no files, so the measurement isolates compute+shuffle
scaling (at 100 TB the scan parallelizes trivially; shuffle and agg are
what must scale).

Each level runs in a fresh subprocess (own JVM) so neither JIT warmup
nor executor reuse leaks between measurements.

**CPU pinning (the headline protocol).** ``local[N]`` caps only task
slots; the JVM's service threads (GC, shuffle, codegen compilation)
and the forked Python workers may use any idle core on the host.
``pin_cpus=True`` tasksets each leg's whole process tree to exactly
its core count — the faithful model of an N-core executor container,
where a cgroup cpuset bounds ALL threads. On an idle host the two
protocols agree closely (measured 0.804 pinned vs 0.838 unpinned,
median-of-3 vs single-shot at 10M turns); the pinned form is the
headline because it is additionally robust to other processes on the
host, whose load otherwise hits the wide leg hardest. Numbers in
BENCH/BASELINE.md §1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TURNS = 10_000_000
HOT_EVERY = 20  # 5% of all turns land in one hot conversation (skew)


def synth_envelopes(
    spark: SparkSession, n_turns: int, n_convs: int | None = None
) -> DataFrame:
    """Deterministic Debezium-shaped changelog at arbitrary scale.

    Same op mix as the test fixture (sources/transcripts.py): base r/c
    rows, +10% updates, +2% deletes; 5% of rows hit a single hot
    conversation to exercise the skew path.
    """
    if n_convs is None:
        n_convs = max(n_turns // 50, 1)
    base = spark.range(n_turns).select(
        F.when(F.col("id") % HOT_EVERY == 0, F.lit("hot"))
        .otherwise(
            F.concat(
                F.lit("c"),
                ((F.col("id") * 2654435761) % 2147483647 % n_convs).cast(
                    "string"
                ),
            )
        )
        .alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.element_at(
            F.array(
                F.lit("user"), F.lit("assistant"), F.lit("tool"), F.lit("system")
            ),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("role"),
        F.concat(F.lit("turn text "), F.col("id").cast("string")).alias("text"),
        F.when(
            F.col("id") % 4 == 2, F.concat(F.lit("tool_"), F.col("id") % 7)
        ).alias("tool"),
        F.timestamp_millis(F.lit(1704067200000) + F.col("id") * 100).alias("ts"),
        F.col("id"),
    )

    def turn(text_col):
        return F.struct(
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("role"),
            text_col.alias("text"),
            F.col("tool"),
            F.col("ts"),
        )

    src = F.struct(F.lit("transcripts").alias("db"), F.lit("turns").alias("table"))
    seq0 = F.unix_millis(F.col("ts"))
    null_turn = F.lit(None).cast(
        "struct<conv_id:string,turn_idx:int,role:string,text:string,"
        "tool:string,ts:timestamp>"
    )

    rows = base.select(
        F.when(F.col("id") % 100 < 5, F.lit("r")).otherwise(F.lit("c")).alias("op"),
        null_turn.alias("before"),
        turn(F.col("text")).alias("after"),
        src.alias("source"),
        seq0.alias("seq"),
    )
    updates = base.where(F.col("id") % 10 == 7).select(
        F.lit("u").alias("op"),
        turn(F.col("text")).alias("before"),
        turn(F.concat(F.col("text"), F.lit(" [edited]"))).alias("after"),
        src.alias("source"),
        (seq0 + 60000).alias("seq"),
    )
    deletes = base.where(F.col("id") % 50 == 13).select(
        F.lit("d").alias("op"),
        turn(F.col("text")).alias("before"),
        null_turn.alias("after"),
        src.alias("source"),
        (seq0 + 120000).alias("seq"),
    )
    return rows.unionByName(updates).unionByName(deletes)


def run_once(cpus: int, n_turns: int) -> dict:
    """One measured run: full changelog-apply pipeline at local[cpus]."""
    import time

    from ..operators import cdc
    from ..session import get_spark

    spark = get_spark(app_name=f"scaling-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def pipeline(envelopes):
        # the two consumer paths of the changelog: LWW materialization
        # (flagship) and event derivation → sink projection
        cdc.apply_changelog(envelopes).write.format("noop").mode(
            "overwrite"
        ).save()
        cdc.sink_rows(cdc.derive_turn_events(envelopes)).write.format(
            "noop"
        ).mode("overwrite").save()

    # warm-up: tiny run to JIT the pipeline (excluded from timing)
    pipeline(synth_envelopes(spark, 10_000))

    env = synth_envelopes(spark, n_turns)
    t0 = time.perf_counter()
    pipeline(env)
    wall = time.perf_counter() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "n_turns": n_turns,
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns / wall),
    }


def _distinct_physical_cpus(n: int) -> list[int]:
    """First ``n`` logical CPUs that sit on DISTINCT physical cores.
    On SMT hosts that enumerate hyperthread siblings adjacently (e.g.
    cpu0/cpu1 = siblings of core 0), a naive ``0..n-1`` range would pin
    the small leg onto sibling threads of fewer physical cores and
    overstate the measured efficiency. Falls back to ``0..n-1`` where
    the sysfs topology is unreadable (matches it exactly on
    1-thread-per-core hosts like this sandbox)."""
    chosen: list[int] = []
    seen_cores: set[str] = set()
    cpu = 0
    base = "/sys/devices/system/cpu"
    while len(chosen) < n:
        sib = os.path.join(base, f"cpu{cpu}", "topology", "thread_siblings_list")
        if not os.path.exists(sib):
            if cpu == 0:
                return list(range(n))  # no sysfs topology at all
            break  # ran out of CPUs: pad with the plain range below
        with open(sib) as f:
            core_key = f.read().strip()
        if core_key not in seen_cores:
            seen_cores.add(core_key)
            chosen.append(cpu)
        cpu += 1
    if len(chosen) < n:  # more slots requested than physical cores
        chosen = list(range(n))
    return chosen


def _run_in_subprocess(cpus: int, n_turns: int, pin_cpus: bool = False) -> dict:
    code = (
        "import json;"
        "from flink_cdc_mysql_sink_to_mysql_spark.plans.scaling import run_once;"
        f"print('RESULT ' + json.dumps(run_once({cpus}, {n_turns})))"
    )
    env = dict(os.environ)
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    argv = [sys.executable, "-c", code]
    if pin_cpus:
        # Confine the WHOLE process tree (JVM incl. GC/shuffle/codegen
        # threads + forked Python workers, which inherit the affinity
        # mask) to exactly `cpus` physical cores — the faithful model
        # of an N-core executor container, where a cgroup cpuset bounds
        # ALL threads, not just task slots. On an idle host the
        # unpinned legs run only mildly faster (service threads use
        # spare cores roughly proportionally at both levels: measured
        # 0.838 unpinned vs 0.804 pinned), but pinning also makes the
        # measurement robust to OTHER processes on the host, whose
        # load otherwise hits the wide leg hardest (a contaminated
        # unpinned pair once read 0.51).
        cores = ",".join(str(c) for c in _distinct_physical_cpus(cpus))
        argv = ["taskset", "-c", cores] + argv
    proc = subprocess.run(
        argv,
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"scaling run (cpus={cpus}) failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def measure_scaling(
    sf_dir: str | None = None,
    cpus_lo: int = 2,
    cpus_hi: int = 8,
    n_turns: int | None = None,
    reps: int = 1,
    pin_cpus: bool = False,
) -> dict:
    """N vs 4N measurement; returns both throughputs + efficiency.

    ``reps > 1`` (the reporting protocol for BENCH/BASELINE.md) runs
    each level reps times in alternating order (lo,hi,lo,hi,…) and
    takes the MEDIAN throughput per level — a shared VM's transient
    load then biases both levels alike instead of producing
    artifacts like the round-2 1.023 "efficiency" (a loaded-host
    2-core run). bench.py keeps reps=1 (driver time budget).

    ``pin_cpus=True`` (the headline protocol) additionally taskset-pins
    each leg to exactly its core count so local[N] behaves like an
    N-core executor — see :func:`_run_in_subprocess`."""
    if n_turns is None:
        n_turns = int(os.environ.get("SPARK_GRAFT_SCALING_TURNS", DEFAULT_TURNS))
    los, his = [], []
    for _ in range(reps):
        los.append(_run_in_subprocess(cpus_lo, n_turns, pin_cpus=pin_cpus))
        his.append(_run_in_subprocess(cpus_hi, n_turns, pin_cpus=pin_cpus))

    def med(runs):
        # low-median: always an ACTUAL run record (throughput, wall and
        # n_turns stay mutually consistent in the published output);
        # for odd reps this IS the median, for even reps the
        # conservative (lower) middle run
        return sorted(runs, key=lambda r: r["turns_per_sec"])[
            (len(runs) - 1) // 2
        ]

    lo, hi = med(los), med(his)
    ratio = hi["turns_per_sec"] / lo["turns_per_sec"]
    eff = ratio / (cpus_hi / cpus_lo)
    out = {
        "lo": lo,
        "hi": hi,
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
        "reps": reps,
    }
    if reps > 1:
        out["lo_all"] = [r["turns_per_sec"] for r in los]
        out["hi_all"] = [r["turns_per_sec"] for r in his]
    return out


if __name__ == "__main__":
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "1"))
    pin = bool(int(os.environ.get("SPARK_GRAFT_SCALING_PIN", "0")))
    print(json.dumps(measure_scaling(reps=reps, pin_cpus=pin), indent=2))
