#!/usr/bin/env python
"""Phase-split timing of the KG pipeline at one parallelism level:
(1) spans+dim materialization (the pandas-UDF extraction pass),
(2) everything after (mentions probe, merge, linking, CC, assembly).

    python bench/phase_timing.py <cores> <n_pages>
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pipeline_job import corpus_path  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_pages = int(sys.argv[2])

    from pyspark.sql import functions as F

    from ocds_entity_extract_spark.functions.classify import with_entity_type
    from ocds_entity_extract_spark.operators.mentions import (
        detect_spans_fused,
        surface_dim_batched,
    )
    from ocds_entity_extract_spark.plans.pipeline import build_triples
    from ocds_entity_extract_spark.session import get_spark

    path = corpus_path(n_pages)
    corpus_bytes = sum(
        f.stat().st_size for f in pathlib.Path(path).glob("*.parquet")
    )
    waves = int(os.environ.get("SPARK_GRAFT_WAVES", "2"))
    split = max(1 << 20, corpus_bytes // (cores * waves))
    # core-scaled AQE advisory — same rationale as pipeline_job.py
    advisory = max(4 << 20, corpus_bytes // (cores * 8))
    spark = get_spark(
        app_name=f"phase-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, cores * 2),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": str(128 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(advisory),
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(0, cores * 4, 1, cores * 2).select(F.sum(_warm("id"))).collect()

    pages = spark.read.parquet(path)

    t0 = time.time()
    spans = detect_spans_fused(pages).cache()
    dim = with_entity_type(surface_dim_batched(spans)).cache()
    n_dim = dim.count()
    t1 = time.time()

    res = build_triples(spark, pages)
    n_triples = res.triples.count()
    t2 = time.time()

    print(
        json.dumps(
            {
                "cores": cores,
                "extract_dim_secs": round(t1 - t0, 2),
                "full_secs_after": round(t2 - t1, 2),
                "n_dim": n_dim,
                "n_triples": n_triples,
            }
        )
    )


if __name__ == "__main__":
    main()
