#!/usr/bin/env python
"""One KG-pipeline run at a given parallelism — the scaling-evidence unit.

    python bench/pipeline_job.py <cores> <n_pages>

Prints one JSON line {"cores": N, "n_pages": P, "secs": S, "triples": T,
"pages_per_sec": ..., "triples_per_sec": ...}. JVM startup and corpus
generation excluded from the timed window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_pages = int(sys.argv[2])

    from ocds_entity_extract_spark.datagen import generate_corpus
    from ocds_entity_extract_spark.plans.pipeline import build_triples
    from ocds_entity_extract_spark.schemas import PAGES_SCHEMA
    from ocds_entity_extract_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, cores * 2),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    pages_rows, _, _ = generate_corpus(n_pages=n_pages, seed=42)
    pages = spark.createDataFrame(pages_rows, schema=PAGES_SCHEMA).repartition(
        cores * 2
    )
    pages = pages.cache()
    pages.count()  # materialize input outside the timed window

    t0 = time.time()
    n_triples = build_triples(spark, pages).triples.count()
    secs = time.time() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n_pages,
                "secs": round(secs, 3),
                "triples": n_triples,
                "pages_per_sec": round(n_pages / secs, 1),
                "triples_per_sec": round(n_triples / secs, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
