#!/usr/bin/env python
"""Blocker precision/recall vs ground truth at scaling-corpus dimensions,
for BOTH per-shingle hash families.

    python tools/linking_recall_eval.py [n_pages]   # default 4_000_000

Builds the datagen entity universe at the size the scaling corpus uses
(~72k entities / ~110k slugs at 4M pages — the same generator, so the
same alias structure the pooled evidence runs link), takes every
within-entity slug pair as ground truth, runs the REAL linking twin
(`operators/linking.verified_edges_py` — pytest-parity-locked to the
distributed plan per family) over the full slug universe, and reports
precision/recall per family. This is the measured backing for the round-5
claim that switching the measured window to the xxhash64 production
family moves only LSH candidate recall, and by how much.

Pure driver-side Python (one core) — safe to run beside pooled evidence
windows; expect a few minutes at the 4M-page universe.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    import random

    from ocds_entity_extract_spark.datagen import _mk_entities, simple_name_py
    from ocds_entity_extract_spark.operators.linking import verified_edges_py

    n_person = max(60, n_pages // 150)
    n_company = max(80, n_pages // 125)
    n_inst = max(60, n_pages // 300)
    t0 = time.time()
    uni = _mk_entities(random.Random(42), n_person, n_company, n_inst)
    slugs: set[str] = set()
    truth: set[tuple[str, str]] = set()
    for e in uni.ents:
        ss = sorted({simple_name_py(s) for s in e.all_surfaces})
        slugs.update(ss)
        for i, a in enumerate(ss):
            for b in ss[i + 1:]:
                truth.add((a, b))
    print(
        f"# universe: {len(uni.ents)} entities, {len(slugs)} slugs, "
        f"{len(truth)} true alias pairs ({time.time() - t0:.0f}s)",
        file=sys.stderr,
    )

    out = {"n_pages": n_pages, "entities": len(uni.ents),
           "slugs": len(slugs), "true_pairs": len(truth), "families": {}}
    ordered = sorted(slugs)
    for fam in ("portable", "fast"):
        t1 = time.time()
        edges = {
            (min(a, b), max(a, b))
            for a, b, _c, _j in verified_edges_py(ordered, hash_family=fam)
        }
        tp = len(edges & truth)
        prec = tp / len(edges) if edges else 1.0
        rec = tp / len(truth) if truth else 1.0
        out["families"][fam] = {
            "edges": len(edges), "tp": tp,
            "precision": round(prec, 4), "recall": round(rec, 4),
            "secs": round(time.time() - t1, 1),
        }
        print(
            f"# {fam}: {len(edges)} verified edges, P={prec:.4f} "
            f"R={rec:.4f} ({time.time() - t1:.0f}s)",
            file=sys.stderr,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
