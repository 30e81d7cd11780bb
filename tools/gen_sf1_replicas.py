"""Rebuild the sf1 (10x sf0.1) probe replica set — SCALING.md §Method.

The set is NOT committed (driver-regenerated testdata would rot it);
this script is the recipe, kept in-repo since r12 so it stops living in
/tmp. Three variants, each answering a different scaling question:

  full      (r6/r11)  key-offset replicas; documents rewrite EVERY
                      token t -> t_x{i}. Replicas share zero terms:
                      vocabulary/bucket-count stress. Stopword-driven
                      gates go DEGENERATE here (replicas fail the gate;
                      ppl-cut labels go one-sided) — documented caveat.
  stopword  (r12)     same, but the rewrite skips the pinned
                      EN_STOPWORDS + LANG_MARKERS vocabulary. Preserves
                      stopword-gate selectivity (measured: 39% kept at
                      sf1 vs 63% at sf0.1 — non-degenerate) but NOT the
                      perplexity-cut label: on this corpus's ~uniform
                      31-token vocabulary the content tokens carry ~97%
                      of unigram mass, so every doc's ppl rises ~10x
                      past the cut regardless (measured n_pos=0). Use
                      for gate-selectivity scaling, not ppl labels.
  copy      (r12)     key-offset replicas with IDENTICAL text. The full
                      per-doc quality distribution (gate logits, ppl,
                      DSIR weights, AUC labels) is preserved exactly —
                      the quality-DISTRIBUTION scaling probe. Valid
                      ONLY for distribution-granular entries (gates,
                      perplexity, DSIR, AUC, temperature/waterfill):
                      identical copies give pairwise dedup entries a
                      10-deep cross-replica duplicate structure no real
                      corpus has — never read pairwise numbers off this
                      variant.

Usage: python tools/gen_sf1_replicas.py [full|stopword|copy] [out_dir]
Default out_dir: /tmp/sf1_probe (full) or /tmp/sf1_<variant>.
`full` writes documents+events+embeddings; the text variants write
documents only (the gate-heavy entries read nothing else).
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from sports_data_integration_and_forecasting_pipeline_spark.operators.textstats import (  # noqa: E402
    EN_STOPWORDS,
    LANG_MARKERS,
)
from sports_data_integration_and_forecasting_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
OFFSET = 100_000_000
N_REPLICAS = 10


def _rewrite(col, i: int, preserve: frozenset[str]):
    def one(w):
        tagged = F.concat(w, F.lit(f"_x{i}"))
        if not preserve:
            return tagged
        return F.when(w.isin(*sorted(preserve)), w).otherwise(tagged)

    return F.array_join(F.transform(F.split(col, " "), one), " ")


def build_documents(spark, variant: str, out: str) -> None:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    preserve = frozenset()
    if variant == "stopword":
        preserve = frozenset(EN_STOPWORDS) | {
            w for ws in LANG_MARKERS.values() for w in ws
        }
    parts = []
    for i in range(N_REPLICAS):
        off = i * OFFSET
        if i == 0 or variant == "copy":
            parts.append(
                docs.select(
                    (F.col("doc_id") + off).alias("doc_id"),
                    "text",
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        else:
            parts.append(
                docs.select(
                    (F.col("doc_id") + off).alias("doc_id"),
                    _rewrite(F.col("text"), i, preserve).alias("text"),
                    "lang",
                    "source",
                ).withColumn(
                    "n_chars",
                    F.length("text").cast(
                        docs.schema["n_chars"].dataType.simpleString()
                    ),
                )
            )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print("documents", spark.read.parquet(f"{out}/documents.parquet").count())


def build_keyed(spark, name: str, keys: list[str], cols: list[str], out: str):
    src = spark.read.parquet(f"{SRC}/{name}.parquet")
    parts = []
    for i in range(N_REPLICAS):
        off = i * OFFSET
        sel = [
            (F.col(k) + off).alias(k) if k in keys else F.col(k) for k in cols
        ]
        parts.append(src.select(*sel))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    print(name, spark.read.parquet(f"{out}/{name}.parquet").count())


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    if variant not in ("full", "stopword", "copy"):
        raise SystemExit(f"unknown variant {variant!r}")
    default_out = "/tmp/sf1_probe" if variant == "full" else f"/tmp/sf1_{variant}"
    out = sys.argv[2] if len(sys.argv) > 2 else default_out
    spark = get_spark(app_name=f"gen_sf1_{variant}")
    build_documents(spark, variant, out)
    if variant == "full":
        build_keyed(
            spark,
            "events",
            ["event_id", "user_id"],
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
            out,
        )
        build_keyed(
            spark, "embeddings", ["vec_id"], ["vec_id", "embedding", "label"], out
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
