#!/usr/bin/env python
"""Pinned 180k-corpus admission A/B (VERDICT r7 item 3 done-criteria).

One session, 180k-doc corpus (36 vocab-perturbed replicas of sf0.1
documents — distinct fingerprints, shared shingle mass), per mode:
bootstrap the full corpus in one availableNow batch, then TWO
successive 500-doc fresh triggers (unique-vocabulary docs, so the
candidate sets are empty and every doc admits).  Modes alternate
(indexed first, then recomputed, then a second rep each) so host drift
hits both.  Prints one JSON line for SCALE_STRESS notes.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 36  # 36 x ~5k = ~180k docs


def main() -> None:
    from pyspark.sql import functions as F

    from sortify_spark.session import get_spark
    from sortify_spark.streaming.pipeline import admission_stream
    from sortify_spark.tables import load_table

    spark = get_spark("admission-ab-180k")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            # vocab perturbation: translate vowels per replica so
            # replicas are near-dup-shaped, not byte-identical
            (
                F.col("text")
                if i == 0
                else F.concat(
                    F.translate(
                        F.col("text"), "aeiou"[i % 5], str(i % 10)
                    ),
                    F.lit(f" rep{i}"),
                )
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(REPS)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.localCheckpoint(eager=True)
    n = corpus.count()

    def fresh(tag: str):
        return (
            docs.limit(500)
            .select(
                (F.col("doc_id") + F.lit(90_000_000)).alias("doc_id"),
                F.concat(
                    F.translate(F.col("text"), "aeiou", "01234"),
                    F.lit(f" f{tag}"),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )

    out: dict = {"corpus_docs": int(n), "indexed": [], "recomputed": []}
    for rep in range(2):
        for use_index in (True, False):
            mode = "indexed" if use_index else "recomputed"
            adir = tempfile.mkdtemp(prefix=f"ab180_{mode}{rep}_")
            inp, tbl = f"{adir}/in", f"{adir}/table"
            os.makedirs(inp, exist_ok=True)
            t0 = time.time()
            corpus.coalesce(8).write.mode("append").parquet(inp)
            q = admission_stream(
                spark, inp, tbl, f"{adir}/ck",
                semantic_tau=0.995, use_index=use_index,
            )
            assert q.awaitTermination(1200), "bootstrap timed out"
            boot = round(time.time() - t0, 2)
            steadies = []
            for t in range(2):
                t0 = time.time()
                fresh(f"{rep}{t}").coalesce(1).write.mode(
                    "append"
                ).parquet(inp)
                q = admission_stream(
                    spark, inp, tbl, f"{adir}/ck",
                    semantic_tau=0.995, use_index=use_index,
                )
                assert q.awaitTermination(1200), "trigger timed out"
                steadies.append(round(time.time() - t0, 2))
            out[mode].append(
                {"bootstrap": boot, "steady500": steadies}
            )
            print(f"  [{mode} rep{rep}] boot={boot} steady={steadies}",
                  file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
