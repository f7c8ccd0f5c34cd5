#!/usr/bin/env python
"""One KG-pipeline run on a LOCAL-CLUSTER — the N vs 4N EXECUTOR proxy.

    python bench/pipeline_job_lc.py <n_executors> <cores_per_exec> <n_pages>

Same job and same cached corpus as bench/pipeline_job.py, but the master is
``local-cluster[n_exec, cores, mem]``: Spark's standalone-in-a-box mode that
forks ONE REAL JVM PER EXECUTOR (CoarseGrainedExecutorBackend processes,
launched by an in-process Master/Worker pair). Unlike local[N] — where all N
task threads share a single driver heap, one GC, and one block manager —
this gives each executor its own heap, its own GC, its own Python workers
and its own shuffle server, with inter-executor shuffles crossing process
boundaries over loopback netty exactly as they cross the network on a real
cluster (minus the wire latency).

Why it exists: the north rule's scaling criterion is N -> 4N EXECUTORS.
local[2] -> local[8] models the core-count axis but shares one heap across
all threads — and the round-5 event-log attribution showed the shared heap
is exactly what inflates at higher counts (JVM GC core-seconds 12x, CPU
+41% for identical work). Scaling the number of executor *processes* while
holding per-executor cores and heap FIXED is the faithful single-box proxy
for adding executors: each new executor brings its own heap and GC, as it
would on a real cluster. The shared memory bus remains (unavoidable on one
box) — the pure-CPU control still quantifies that.

Per-executor resources are IDENTICAL at every level (a real cluster scales
by adding identical executors): SPARK_GRAFT_EXEC_MEM (default 8g — the same
heap the local-mode evidence gives its single JVM; a first 4g run showed
197 GC core-seconds on the extraction/cache-build stage alone) and
<cores_per_exec> task slots each. The driver JVM is separate (4g default —
in distributed mode it only plans and collects counts).

Bias note: at 1 executor ALL shuffle fetches are process-local; at 4
executors ~75% are remote (loopback netty). A real cluster pays remote
fetches at BOTH sizes, so this proxy over-charges the 4N level — the
measured pair is a conservative lower bound on true executor scaling.

Prints the same JSON line shape as pipeline_job.py plus n_exec/cores_per_exec.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipeline_job import corpus_path  # noqa: E402  (same cached corpus)


def main() -> None:
    n_exec = int(sys.argv[1])
    cores_per_exec = int(sys.argv[2])
    n_pages = int(sys.argv[3])
    total_cores = n_exec * cores_per_exec

    # keep executor work dirs (launch scripts, stdout/stderr) in /tmp, not
    # $SPARK_HOME/work — the in-process Worker reads this env at launch
    os.environ.setdefault(
        "SPARK_WORKER_DIR",
        str(pathlib.Path(os.environ.get("SPARK_GRAFT_TMP", "/tmp")) / "lc_work"),
    )

    from ocds_entity_extract_spark.plans.pipeline import build_triples
    from ocds_entity_extract_spark.session import get_spark

    path = corpus_path(n_pages)

    # identical split/advisory tuning to pipeline_job.py, keyed by TOTAL
    # cores so the two proxies size tasks the same way at equal core count
    corpus_bytes = sum(
        f.stat().st_size for f in pathlib.Path(path).glob("*.parquet")
    )
    waves = int(os.environ.get("SPARK_GRAFT_WAVES", "2"))
    split = max(1 << 20, corpus_bytes // (total_cores * waves))
    advisory = max(4 << 20, corpus_bytes // (total_cores * 8))

    exec_mem = os.environ.get("SPARK_GRAFT_EXEC_MEM", "8g")
    exec_mem_mb = int(float(exec_mem.rstrip("gm")) * (1024 if exec_mem.endswith("g") else 1))
    # worker memory must cover its executor; one worker per executor slot
    worker_mb = exec_mem_mb + 512
    spark = get_spark(
        app_name=f"scaling-lc-{n_exec}x{cores_per_exec}",
        master=f"local-cluster[{n_exec},{cores_per_exec},{worker_mb}]",
        shuffle_partitions=max(8, total_cores * 2),
        extra_conf={
            "spark.executor.memory": exec_mem,
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"),
            # executor python workers must import the package (cloudpickle
            # serializes module-level UDF helpers by reference) — same role
            # as --py-files on a real cluster (bench/submit.sh)
            "spark.executorEnv.PYTHONPATH": ROOT,
            # size every core-count-derived pool inside the executor JVM by
            # the executor's OWN slot count, not the machine's 32 cores —
            # exactly what a cgroup/cpuset-limited container presents on a
            # real cluster. Without this each executor spawns ~25 ParallelGC
            # threads (plus netty/parquet pools sized at 32), so 4 executors
            # stampede 100+ GC threads onto 8 task cores during the
            # allocation-heavy spans-cache build (measured: stage-7 GC 389s
            # at 4x2 vs 12s in the one-JVM local[8] run of the same job).
            "spark.executor.extraJavaOptions": (
                "-XX:+UseParallelGC "
                f"-XX:ActiveProcessorCount={cores_per_exec} "
                f"-XX:ParallelGCThreads={max(2, cores_per_exec)}"
            ),
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": str(128 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(advisory),
            "spark.io.compression.codec": os.environ.get("SPARK_GRAFT_CODEC", "lz4"),
            # executor work dirs/logs out of the repo
            "spark.worker.cleanup.enabled": "true",
            **(
                {
                    "spark.eventLog.enabled": "true",
                    "spark.eventLog.dir": os.environ["SPARK_GRAFT_EVENTLOG"],
                }
                if os.environ.get("SPARK_GRAFT_EVENTLOG")
                else {}
            ),
        },
    )
    # wait for every executor to register before the warmup (startup cost
    # stays outside the timed window, same as JVM startup in local mode)
    deadline = time.time() + 120
    while time.time() < deadline:
        n_up = (
            spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
        )  # minus the driver entry
        if n_up >= n_exec:
            break
        time.sleep(0.5)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(0, total_cores * 4, 1, total_cores * 2).select(
        F.sum(_warm("id"))
    ).collect()

    pages = spark.read.parquet(path)

    mode = os.environ.get("SPARK_GRAFT_MODE", "distributed")
    kw = {"linking_hash_family": os.environ.get("SPARK_GRAFT_HASH", "fast")}
    if mode == "distributed":
        kw.update(
            max_driver_linking=0,
            surface_broadcast="aqe",
            cc_small_graph_threshold=0,
        )

    t0 = time.time()
    res = build_triples(spark, pages, **kw)
    n_triples = res.triples.count()
    n_entities = res.entities.count() if mode == "distributed" else None
    secs = time.time() - t0
    print(
        json.dumps(
            {
                "n_exec": n_exec,
                "cores_per_exec": cores_per_exec,
                "cores": total_cores,
                "n_pages": n_pages,
                "mode": mode,
                "secs": round(secs, 3),
                "triples": n_triples,
                "entities": n_entities,
                "pages_per_sec": round(n_pages / secs, 1),
                "triples_per_sec": round(n_triples / secs, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
