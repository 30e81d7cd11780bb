"""Embedding quantization — symmetric int8 scalar quantization of
vector columns, the memory/bandwidth lever for ANN at scale (a 64-dim
float32 vector becomes 64 bytes + one scale: 4x smaller, SIMD-friendly
for downstream distance kernels).

Per vector: ``scale = max |x_i|``; ``q_i = round(x_i / scale * 127)``
(int8 range, symmetric, zero-preserving); dequantization error is
reported as per-vector MSE. ENTIRELY narrow — transform/aggregate over
the array column, zero shuffles, zero Python; 100 TB of embeddings
quantize at scan speed.

Everything is deterministic double arithmetic in a fixed fold order, so
the battery entry hash-matches DuckDB (quantized codes exactly; MSE at
integer nano precision). No reference counterpart; part of the
similarity/ANN family (`operators/similarity.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 127,
) -> DataFrame:
    """``(id, dim, scale, q)`` — ``q`` the int codes array; zero vectors
    quantize to all-zero codes."""
    staged = df.select(
        F.col(id_col),
        F.col(emb_col).alias("__e"),
        # staged once: referenced by every code and the error fold
        F.array_max(F.transform(emb_col, lambda x: F.abs(x)))
        .cast("double")
        .alias("scale"),
    )
    q = F.when(
        F.col("scale") == 0,
        F.transform("__e", lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            "__e",
            lambda x: F.floor(
                x.cast("double") / F.col("scale") * levels + F.lit(0.5)
            ).cast("int"),
        )
    )
    return staged.select(
        id_col,
        F.size("__e").cast("bigint").alias("dim"),
        "scale",
        q.alias("q"),
        F.col("__e").alias(emb_col),
    )


def quantization_report(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 127,
) -> DataFrame:
    """Battery-friendly projection: codes as CSV, scale and dequant-MSE
    snapped to integer micro/nano grids (engine-exact)."""
    qd = quantize_embeddings(df, emb_col, id_col, levels)
    err_sq = F.zip_with(
        emb_col,
        "q",
        lambda x, qi: F.pow(
            x.cast("double") - qi * F.col("scale") / levels, F.lit(2)
        ),
    )
    mse = F.aggregate(
        err_sq, F.lit(0.0), lambda acc, e: acc + e
    ) / F.col("dim")
    return qd.select(
        id_col,
        "dim",
        F.floor(F.col("scale") * 1e6 + 0.5).cast("bigint").alias("scale_e6"),
        F.array_join(
            F.transform("q", lambda x: x.cast("string")), ","
        ).alias("q_csv"),
        F.floor(mse * 1e9 + 0.5).cast("bigint").alias("mse_e9"),
    )


def quantized_cosine_topk(
    df: DataFrame,
    query_pred,
    k: int = 5,
    levels: int = 127,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine neighbors computed ON THE INT8 CODES — the search
    path that pairs with :func:`quantize_embeddings` at scale (integer
    dot products over 4x-smaller vectors; per-vector scales cancel out
    of cosine, so ranking needs no dequantization at all).

    Same shape as the exact `similarity.cosine_topk`: bounded query set
    broadcasts, candidates never shuffle; ranking is deterministic
    (integer dots, shared sqrt, vec-id tiebreak). Returns
    ``(q_id, rank, cand_id, qcos_e6)``.
    """
    qd = quantize_embeddings(df, emb_col, id_col, levels).select(
        id_col,
        "q",
        F.aggregate(
            F.transform("q", lambda x: x.cast("long") * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("nsq"),
    )
    queries = qd.filter(query_pred).select(
        F.col(id_col).alias("q_id"),
        F.col("q").alias("qq"),
        F.col("nsq").alias("qn"),
    )
    cands = qd.select(
        F.col(id_col).alias("cand_id"),
        F.col("q").alias("cq"),
        F.col("nsq").alias("cn"),
    )
    dotq = F.aggregate(
        F.zip_with("qq", "cq", lambda x, y: x.cast("long") * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        cands.join(F.broadcast(queries), F.col("cand_id") != F.col("q_id"))
        .withColumn(
            "qcos",
            dotq / F.sqrt(F.col("qn").cast("double") * F.col("cn")),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("qcos"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "rank",
            "cand_id",
            F.floor(F.col("qcos") * 1e6 + 0.5).cast("bigint").alias("qcos_e6"),
        )
    )


# --- product quantization (IVF-PQ's compression half) -----------------------


def _sub_d2(v, s: int, sub_dim: int, center: list[float]):
    """Squared L2 of subvector s of ``v`` to a centroid literal —
    sequential left-to-right fold, bit-identical across engines (the
    `_d2_to_center` discipline applied to a slice).

    Form note (r9, measured): an unrolled expression chain beats this
    fold ~1.9x on an ISOLATED encode pass at sf1 (2.52 -> 1.36 s), but
    the full entries stacking 64-80 of these per row (ivfpq, semdedup,
    ivf_ann) regressed 3-8x at BOTH sf0.1 and sf1 when unrolled — the
    ~2000-term projection leaves whole-stage codegen (huge-method
    fallback) and the fallback evaluator is slower than the lambda
    fold. The fold is the right default; see SCALING.md round-9."""
    c = F.array(*[F.lit(x) for x in center])
    return F.aggregate(
        F.zip_with(
            F.slice(v, s * sub_dim + 1, sub_dim),
            c,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization codes (Jégou, Douze & Schmid, TPAMI 2011 —
    the compression half of IVF-PQ, public): split each vector into
    ``m = len(codebooks)`` subspaces and store, per subspace, the index
    of its nearest codebook centroid. A 64-dim float32 vector (256 B)
    becomes m small ints (m=4, k=16 → 2 B packed): the 100 TB lever
    that lets an ANN index's candidate scan run at memory-bandwidth
    speed over codes instead of floats.

    Codebooks are PRETRAINED driver literals (operators/pq_codebooks.py,
    the IVF_CENTROIDS discipline) so encoding is a pure Column
    expression — narrow, shuffle-free, whole-stage-codegen'd, and
    reproducible in the DuckDB oracle. Nearest-centroid ties break to
    the lowest code (lexicographic struct min, same rule as
    `similarity.ivf_assign`).

    Returns ``(id_col, c0..c{m-1})`` int codes."""
    sub_dim = len(codebooks[0][0])
    v = F.transform(emb_col, lambda x: x.cast("double"))
    staged = df.select(F.col(id_col), v.alias("__v"))
    codes = [
        F.array_min(
            F.array(
                *[
                    F.struct(
                        _sub_d2(F.col("__v"), s, sub_dim, c).alias("d"),
                        F.lit(i).alias("code"),
                    )
                    for i, c in enumerate(book)
                ]
            )
        )
        .getField("code")
        .alias(f"c{s}")
        for s, book in enumerate(codebooks)
    ]
    return staged.select(id_col, *codes)


def pq_adc_topk(
    df: DataFrame,
    query_pred,
    codebooks: list[list[list[float]]],
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric distance computation (ADC) top-k over PQ codes: the
    query keeps its exact vector; every candidate is represented ONLY by
    its m codes, and the query→candidate distance is the sum of m
    lookup-table entries ``LUT[s][code] = d²(query subvector s,
    codebook[s][code])``.

    Scale shape — the PQ-canonical two-sided split:
    (a) the LUT is query-side work: |Q|·m·k_codebook rows (bounded by
    the query predicate, like every query set in this family), built as
    a narrow explode of literal-centroid distance expressions and
    BROADCAST;
    (b) the candidate side never touches floats: codes explode to
    (cand, s, code) — m small rows per candidate — and meet the LUT in a
    broadcast hash join on (s, code); the per-(query, cand) sum is a
    map-side-combined aggregate (all m rows of a pair originate in one
    partition). The scan is linear in the corpus BY DESIGN (ADC is the
    in-cell scan of IVF-PQ; cell pruning composes orthogonally via
    `similarity.ivf_ann_topk_pretrained`'s cell equi-join).

    Determinism: LUT entries are snapped to integer micro-units
    (floor(d²·10⁶ + 0.5)) BEFORE the sum, so ADC totals are exact
    integer arithmetic and the ranking (asc distance, cand id tiebreak)
    hash-matches the oracle. Returns ``(q_id, rank, cand_id, adc_e6)``.
    """
    from pyspark.sql.window import Window

    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    enc = pq_encode(df, codebooks, emb_col=emb_col, id_col=id_col)
    cand_long = enc.select(
        F.col(id_col).alias("cand_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"), F.col(f"c{s}").alias("code")
                    )
                    for s in range(m)
                ]
            )
        ).alias("__sc"),
    ).select("cand_id", F.col("__sc.s").alias("s"), F.col("__sc.code").alias("code"))
    qv = F.transform(emb_col, lambda x: x.cast("double"))
    lut = (
        df.filter(query_pred)
        .select(F.col(id_col).alias("q_id"), qv.alias("__qv"))
        .select(
            "q_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.lit(c).alias("code"),
                            F.floor(
                                _sub_d2(F.col("__qv"), s, sub_dim, center)
                                * 1e6
                                + F.lit(0.5)
                            )
                            .cast("bigint")
                            .alias("d_e6"),
                        )
                        for s, book in enumerate(codebooks)
                        for c, center in enumerate(book)
                    ]
                )
            ).alias("__l"),
        )
        .select(
            "q_id",
            F.col("__l.s").alias("s"),
            F.col("__l.code").alias("code"),
            F.col("__l.d_e6").alias("d_e6"),
        )
    )
    scored = (
        cand_long.join(F.broadcast(lut), ["s", "code"])
        .groupBy("q_id", "cand_id")
        .agg(F.sum("d_e6").cast("bigint").alias("adc_e6"))
        .filter(F.col("q_id") != F.col("cand_id"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_e6", "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "cand_id", "adc_e6")
    )


def ivfpq_topk(
    df: DataFrame,
    query_pred,
    centers: list[list[float]],
    codebooks: list[list[list[float]]],
    n_probe: int = 3,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ search — the composed production ANN index (FAISS's
    IVFADC, Jégou et al. TPAMI 2011): the IVF coarse quantizer prunes
    candidates to each query's ``n_probe`` nearest cells, and the
    in-cell scan is :func:`pq_adc_topk`'s asymmetric distance over
    codes. The two halves multiply: cells cut the candidate count
    ~n_probe/n_cells, PQ cuts per-candidate cost to m integer adds —
    at 100 TB this is the shape that replaces both the full scan AND
    the float payload.

    Scale shape: cell assignment and PQ encoding are one narrow
    projection over the scan (zero shuffles); the probe list and the
    query LUT are bounded query-side work, broadcast; candidates meet
    probes in a cell equi-join and the LUT in a (q, s, code) hash join,
    both broadcast; the (q, cand) ADC sum is map-side-combined exact
    integer arithmetic; WindowGroupLimit cuts top-k.

    Returns ``(q_id, rank, cand_id, cell, adc_e6)`` — rank by ascending
    ADC, cand-id tiebreak. Recall < 1 by construction (a true neighbor
    in an unprobed cell is missed — audit with the recall-audit pattern
    of `embed_ann_recall_audit`).

    This inline form is the ONE-SHOT query shape (encode rides the
    query — linear scan work). For repeated queries, the stored-column
    split (:func:`ivfpq_index_codes` built once +
    :func:`ivfpq_topk_precoded`) measured 2.0×/3.9× lower query wall at
    sf0.1/sf1 and FLAT across 10× data — SCALING.md r10."""
    v = F.transform(emb_col, lambda x: x.cast("double"))
    enc = ivfpq_index_codes(
        df, centers, codebooks, emb_col=emb_col, id_col=id_col
    )
    q = df.filter(query_pred).select(
        F.col(id_col).alias("q_id"), v.alias("__qv")
    )
    return _ivfpq_search(enc, q, centers, codebooks, n_probe, k, id_col)


def ivfpq_index_codes(
    df: DataFrame,
    centers: list[list[float]],
    codebooks: list[list[list[float]]],
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The IVF-PQ INDEX table: ``(id_col, cell, c0..c{m-1})`` — cell
    assignment + all m PQ codes in ONE corpus projection off a shared
    staged vector (encoding and assignment separately would scan the
    corpus twice and pay the literal-distance folds twice — measured
    ~2x the candidate-side cost at sf1). Zero shuffles.

    This is the stored-column build: at production scale the index is
    materialized ONCE (parquet/bucketed table) and every query scans
    codes, never floats — encode cost amortizes across queries instead
    of riding each one (`ivfpq_topk_precoded` is the matching query
    path; SCALING.md r10 records the measured split)."""
    from .similarity import ivf_assign

    sub_dim = len(codebooks[0][0])
    v = F.transform(emb_col, lambda x: x.cast("double"))
    staged = df.select(F.col(id_col), v.alias("__v"))
    codes = [
        F.array_min(
            F.array(
                *[
                    F.struct(
                        _sub_d2(F.col("__v"), s, sub_dim, c).alias("d"),
                        F.lit(i).alias("code"),
                    )
                    for i, c in enumerate(book)
                ]
            )
        )
        .getField("code")
        .alias(f"c{s}")
        for s, book in enumerate(codebooks)
    ]
    return staged.select(
        F.col(id_col),
        ivf_assign(F.col("__v"), centers).alias("cell"),
        *codes,
    )


def ivfpq_topk_precoded(
    enc_df: DataFrame,
    query_df: DataFrame,
    centers: list[list[float]],
    codebooks: list[list[list[float]]],
    n_probe: int = 3,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ search over a PRE-MATERIALIZED index table — the
    production split of :func:`ivfpq_topk`: ``enc_df`` is the stored
    :func:`ivfpq_index_codes` output (encode paid once at build time),
    ``query_df`` carries raw query vectors. The query path then touches
    only ints: probe equi-join + broadcast LUT + map-side-combined ADC
    sums — the encode-dominated linearity of the inline entry
    (SCALING.md: 4.9x at 10x) drops out of query latency entirely."""
    v = F.transform(emb_col, lambda x: x.cast("double"))
    q = query_df.select(F.col(id_col).alias("q_id"), v.alias("__qv"))
    return _ivfpq_search(enc_df, q, centers, codebooks, n_probe, k, id_col)


def _ivfpq_search(
    enc: DataFrame,
    q: DataFrame,
    centers: list[list[float]],
    codebooks: list[list[list[float]]],
    n_probe: int,
    k: int,
    id_col: str,
) -> DataFrame:
    """Shared IVFADC query half: candidates (cell + codes) meet the
    broadcast probe list on cell and the broadcast query LUT on
    (q, s, code); exact-integer ADC sums rank with a cand-id tiebreak.
    ``q`` must be ``(q_id, __qv: array<double>)``."""
    from pyspark.sql.window import Window

    from .similarity import ivf_cell_structs

    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    cand_long = enc.select(
        F.col(id_col).alias("cand_id"),
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"), F.col(f"c{s}").alias("code")
                    )
                    for s in range(m)
                ]
            )
        ).alias("__sc"),
    ).select(
        "cand_id", "cell",
        F.col("__sc.s").alias("s"), F.col("__sc.code").alias("code"),
    )
    probes = q.select(
        "q_id",
        F.explode(
            F.slice(
                F.array_sort(ivf_cell_structs(F.col("__qv"), centers)),
                1,
                n_probe,
            )
        ).alias("__p"),
    ).select("q_id", F.col("__p.cell").alias("cell"))
    lut = q.select(
        "q_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.lit(c).alias("code"),
                        F.floor(
                            _sub_d2(F.col("__qv"), s, sub_dim, center) * 1e6
                            + F.lit(0.5)
                        )
                        .cast("bigint")
                        .alias("d_e6"),
                    )
                    for s, book in enumerate(codebooks)
                    for c, center in enumerate(book)
                ]
            )
        ).alias("__l"),
    ).select(
        "q_id",
        F.col("__l.s").alias("s"),
        F.col("__l.code").alias("code"),
        F.col("__l.d_e6").alias("d_e6"),
    )
    scored = (
        cand_long.join(F.broadcast(probes), "cell")
        .join(F.broadcast(lut), ["q_id", "s", "code"])
        .filter(F.col("q_id") != F.col("cand_id"))
        .groupBy("q_id", "cand_id", "cell")
        .agg(F.sum("d_e6").cast("bigint").alias("adc_e6"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_e6", "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "cand_id", "cell", "adc_e6")
    )


def ivfpq_refine_topk(
    df: DataFrame,
    query_pred,
    centers: list[list[float]],
    codebooks: list[list[list[float]]],
    n_probe: int = 3,
    shortlist: int = 20,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_expr=None,
) -> DataFrame:
    """Two-stage retrieval: IVF-PQ ADC shortlist → EXACT cosine re-rank
    of the shortlist — FAISS's refine step (``IndexRefineFlat``, Jégou
    et al. TPAMI 2011 §V.B; public): the quantized first stage prunes
    the corpus to ``shortlist`` candidates per query at integer-ADC
    cost, then the float vectors of ONLY those candidates are fetched
    and scored exactly. This recovers most of the recall the PQ
    approximation loses while touching |q|·shortlist float vectors
    instead of the corpus — the standard production ANN shape.

    Returns ``(q_id, rank, cand_id, adc_rank, cosine)`` — rank by exact
    cosine (desc, cand-id tiebreak); ``adc_rank`` is the candidate's
    stage-1 position, so ``rank != adc_rank`` rows measure how much the
    refinement actually reorders (the audit column).

    If ``shortlist < k`` the output simply has fewer than k rows per
    query (degenerate-input discipline: never an error).

    Scale shape: stage 1 is :func:`ivfpq_topk` (cell-pruned,
    map-side-combined integer ADC, WindowGroupLimit top-shortlist);
    the bounded shortlist then BROADCASTS onto the corpus scan to
    fetch candidate vectors (the corpus never shuffles), queries
    broadcast as usual, and the final re-rank window sees ≤ shortlist
    rows per query."""
    from .similarity import _prepared, dot

    short = ivfpq_topk(
        df,
        query_pred,
        centers,
        codebooks,
        n_probe=n_probe,
        k=shortlist,
        emb_col=emb_col,
        id_col=id_col,
    ).select("q_id", "cand_id", F.col("rank").alias("adc_rank"))
    e = _prepared(df, id_col, emb_col)
    q = e.filter(query_pred).select(
        F.col(id_col).alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cos = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    if round_expr is not None:
        cos = round_expr(cos)
    scored = (
        e.join(
            F.broadcast(short), e[id_col] == short["cand_id"]
        )
        .join(F.broadcast(q), "q_id")
        .select("q_id", "cand_id", "adc_rank", cos.alias("cosine"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "cand_id", "adc_rank", "cosine")
    )
