"""Cluster-submission entry point (the north rule's spark-submit shape).

Self-contained job script: imports the engine ONLY from --py-files (run it
from outside the repo to prove the artifact is complete), generates a
deterministic corpus, runs the full KG pipeline (extract -> mentions ->
classify -> merge -> link -> CC -> triples), and prints counts; optionally
materializes the triple/entity tables.

    cd /tmp && spark-submit \
        --py-files /root/repo/dist/ocds_entity_extract_spark.zip \
        /root/repo/tools/submit_job.py 2000 [/tmp/kg_out]

On a real cluster the same command line scales: swap the synthetic pages
for the Iceberg pages table and add --master/--num-executors. The
SparkSession is created WITHOUT a master override so spark-submit's
--master (YARN/k8s/standalone) wins; local runs default to local[*].
"""

from __future__ import annotations

import sys


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None

    import os

    from pyspark import SparkConf

    # forward spark-submit's --master (it lands in the JVM system props,
    # which SparkConf() reads) so get_spark doesn't pin a local master;
    # launched bare, this is unset and get_spark defaults to local[cpus].
    submitted_master = SparkConf().get("spark.master", None)
    if submitted_master:
        os.environ.setdefault("SPARK_GRAFT_MASTER", submitted_master)

    from ocds_entity_extract_spark.session import get_spark
    from ocds_entity_extract_spark.datagen import generate_corpus
    from ocds_entity_extract_spark.plans.pipeline import build_triples
    from ocds_entity_extract_spark.schemas import PAGES_SCHEMA

    spark = get_spark(app_name=f"kg-submit-{n_pages}")
    pages, _golden, _aux = generate_corpus(n_pages=n_pages, seed=42)
    pages_df = spark.createDataFrame(pages, schema=PAGES_SCHEMA)
    triples = build_triples(spark, pages_df).triples
    n = triples.count()
    by_pred = {
        r["pred"]: r["n"]
        for r in triples.groupBy("pred").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    print(f"pages={n_pages} triples={n} preds={sorted(by_pred.items())}")
    if out_dir:
        triples.write.mode("overwrite").parquet(f"{out_dir}/triples.parquet")
        print(f"wrote {out_dir}/triples.parquet")
    spark.stop()
    return 0 if n > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
