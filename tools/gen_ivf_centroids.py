"""Regenerate the pinned IVF coarse-quantizer centroids
(sports_data_integration_and_forecasting_pipeline_spark/operators/ivf_centroids.py).

Trains MLlib KMeans(k=16, seed=42) on the sf0.01 embeddings table — the
correctness-gate scale — and pins the centers as literals, the way a
production IVF index pretrains its quantizer on a sample. Run only when
the training data or quantizer hyperparameters change; the battery oracle
embeds the same literals, so both sides update together on regeneration.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
K = 16
SEED = 42
DIM = 64


def main() -> None:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.session import get_spark

    spark = get_spark(app_name="gen_ivf_centroids", master="local[8]",
                      shuffle_partitions=8)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    e = emb.select(
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("fv")
    )
    model = KMeans(k=K, seed=SEED, featuresCol="fv").fit(e)
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    assert len(centers) == K and all(len(c) == DIM for c in centers)

    lines = [
        '"""IVF coarse-quantizer centroids (GENERATED — do not hand-edit).',
        "",
        f"Trained once with MLlib KMeans(k={K}, seed={SEED}) on the sf0.01",
        "embeddings table and pinned as literals, the way a production IVF",
        "index pretrains its quantizer on a sample. Pinning makes the cell",
        "assignment a pure driver-literal expression — reproducible in any",
        "engine (the DuckDB oracle embeds the identical doubles) and",
        "independent of query-time input scale.",
        "",
        "Regenerate: python tools/gen_ivf_centroids.py",
        '"""',
        "",
        "IVF_CENTROIDS: list[list[float]] = [",
    ]
    for c in centers:
        lines.append("    [")
        for i in range(0, DIM, 4):
            lines.append("        " + ", ".join(repr(x) for x in c[i : i + 4]) + ",")
        lines.append("    ],")
    lines.append("]")
    out = REPO / "sports_data_integration_and_forecasting_pipeline_spark/operators/ivf_centroids.py"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
