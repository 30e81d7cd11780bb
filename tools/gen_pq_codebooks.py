"""Regenerate the pinned product-quantization codebooks
(sports_data_integration_and_forecasting_pipeline_spark/operators/pq_codebooks.py).

Trains one MLlib KMeans(k=16, seed=42) per 16-dim subspace of the
sf0.01 embeddings table (m=4 subspaces over the 64-dim vectors) — the
offline codebook-training step of a production IVF-PQ index (Jégou,
Douze & Schmid, "Product Quantization for Nearest Neighbor Search",
TPAMI 2011; public). Pinned as literals so encoding and ADC lookup
tables are pure driver-literal expressions the DuckDB oracle embeds
identically. Run only when the training data or hyperparameters change.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
M = 4           # subspaces
SUB_DIM = 16    # dims per subspace (M * SUB_DIM = 64)
K = 16          # centroids per subspace (4-bit codes)
SEED = 42


def main() -> None:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.session import get_spark

    spark = get_spark(app_name="gen_pq_codebooks", master="local[8]",
                      shuffle_partitions=8)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books: list[list[list[float]]] = []
    for s in range(M):
        sub = emb.select(
            array_to_vector(
                F.transform(
                    F.slice("embedding", s * SUB_DIM + 1, SUB_DIM),
                    lambda x: x.cast("double"),
                )
            ).alias("fv")
        )
        model = KMeans(k=K, seed=SEED, featuresCol="fv").fit(sub)
        centers = [[float(x) for x in c] for c in model.clusterCenters()]
        assert len(centers) == K and all(len(c) == SUB_DIM for c in centers)
        books.append(centers)

    lines = [
        '"""Product-quantization codebooks (GENERATED — do not hand-edit).',
        "",
        f"One MLlib KMeans(k={K}, seed={SEED}) per {SUB_DIM}-dim subspace",
        f"(m={M} subspaces over the 64-dim embeddings), trained on the",
        "sf0.01 embeddings table — the offline codebook step of IVF-PQ",
        '(Jégou et al., TPAMI 2011). Pinned as literals so PQ encoding and',
        "the ADC lookup tables are pure driver-literal expressions the",
        "DuckDB oracle embeds identically.",
        "",
        "Regenerate: python tools/gen_pq_codebooks.py",
        '"""',
        "",
        f"PQ_M = {M}",
        f"PQ_SUB_DIM = {SUB_DIM}",
        f"PQ_K = {K}",
        "",
        "PQ_CODEBOOKS: list[list[list[float]]] = [",
    ]
    for book in books:
        lines.append("    [")
        for c in book:
            lines.append("        [")
            for i in range(0, SUB_DIM, 4):
                chunk = ", ".join(repr(x) for x in c[i : i + 4])
                lines.append(f"            {chunk},")
            lines.append("        ],")
        lines.append("    ],")
    lines.append("]")
    lines.append("")
    out = REPO / "sports_data_integration_and_forecasting_pipeline_spark" / "operators" / "pq_codebooks.py"
    out.write_text("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
