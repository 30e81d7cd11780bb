"""Hybrid retrieval fusion — combining a lexical (BM25) and a dense
(embedding-cosine) ranking into one result list via Reciprocal Rank
Fusion (Cormack, Clarke & Büttcher, "Reciprocal Rank Fusion outperforms
Condorcet and individual Rank Learning Methods", SIGIR 2009 — public).
This is the retrieval stack every RAG / training-data-curation pipeline
runs in front of an LLM: each leg ranks independently, RRF needs only
the RANKS (no score calibration across legs), and the fused order is
remarkably robust to a weak leg.

No reference counterpart (the reference repo has no retrieval surface) —
north-star LLM-data-pipeline scope, like the dedup/ANN families.

Scale shape: each leg is the already-scaled operator it composes
(`similarity.cosine_topk` / the BM25 inverted-index join), both emitting
(q_id, cand_id, rank) for a BOUNDED query set; fusion itself is
leg-union → one (q_id, cand_id) aggregate → per-query WindowGroupLimit —
work proportional to |queries|·n_cand, independent of corpus size.

Determinism: RRF contributions are exact integers
(``1_000_000 div (k_rrf + rank)``), so fused scores and the (desc score,
cand_id) final order hash-match the DuckDB oracle with no float
boundary cases.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_K = 60  # the paper's constant; pinned


def rrf_fuse(
    legs: list[DataFrame], k: int = 10, k_rrf: int = RRF_K
) -> DataFrame:
    """Fuse ranked lists: each leg is ``(q_id, cand_id, rank)`` (1-based
    ranks); the fused score is ``Σ_legs 1_000_000 div (k_rrf + rank)``
    — exact integer arithmetic. Returns
    ``(q_id, rank, cand_id, rrf_e6, n_legs)`` with the final rank by
    descending score, cand_id tiebreak, top ``k`` per query.

    A candidate missing from a leg simply contributes nothing for that
    leg (the standard RRF convention); ``n_legs`` reports in how many
    legs it appeared."""
    if not legs:
        raise ValueError("rrf_fuse: need at least one leg")
    allr = reduce(
        DataFrame.unionByName,
        [df.select("q_id", "cand_id", "rank") for df in legs],
    )
    scored = (
        allr.withColumn(
            "__c", F.expr(f"1000000 div ({k_rrf} + rank)").cast("bigint")
        )
        .groupBy("q_id", "cand_id")
        .agg(
            F.sum("__c").cast("bigint").alias("rrf_e6"),
            F.count("*").cast("int").alias("n_legs"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("rrf_e6"), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "cand_id", "rrf_e6", "n_legs")
    )


def bm25_by_example(
    docs: DataFrame,
    query_pred: Column,
    n_cand: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Query-BY-EXAMPLE BM25: each query DOCUMENT's distinct terms act
    as its query, and every other document is scored with the standard
    BM25 idf/tf-saturation sum (k1/b pinned) — the lexical leg of
    hybrid retrieval ("find documents like this one").

    Scale shape: ONE corpus explode into the scope-persisted
    (doc, term, tf) aggregate (the `bm25_scoring` discipline) feeds doc
    lengths, corpus stats, document frequencies, AND the query term
    sets; query terms are bounded (|queries|·|vocab-per-doc|) and meet
    the postings in a broadcast term join. Ranking runs on the 6dp-floor
    score with a cand-id tiebreak (engine-identical total order).

    Returns ``(q_id, rank, cand_id, score)`` top ``n_cand`` per query."""
    from .dedup import persist_scoped

    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    tc = persist_scoped(
        "bm25qbe_term_counts",
        toks.groupBy(id_col, "term").agg(
            F.count("*").cast("bigint").alias("tf")
        ),
    )
    dl = tc.groupBy(id_col).agg(F.sum("tf").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    qterms = (
        tc.filter(query_pred)
        .select(F.col(id_col).alias("q_id"), "term")
        .distinct()
    )
    # document frequency over the FULL corpus for exactly the query
    # terms (postings for other terms never join)
    tf = tc.join(
        F.broadcast(qterms), "term"
    ).filter(F.col(id_col) != F.col("q_id"))
    df_ = (
        tc.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("dl") * F.col("n_docs") / F.col("total_len")
        )
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy("q_id", F.col(id_col).alias("cand_id"))
        .agg(
            F.floor(F.sum(idf * sat) * 1e6 + F.lit(0.5)).cast("bigint")
            .alias("__s_e6")
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("__s_e6"), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_cand)
        .select(
            "q_id",
            "rank",
            "cand_id",
            (F.col("__s_e6") / 1e6).alias("score"),
        )
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_pred_doc: Column,
    query_pred_vec: Column,
    n_cand: int = 20,
    k: int = 10,
    round_expr=None,
) -> DataFrame:
    """The composed hybrid retriever: lexical query-by-example BM25 +
    exact dense cosine, fused with RRF. ``query_pred_doc`` /
    ``query_pred_vec`` must select the SAME query identities in both
    tables (the testdata embeddings are the documents' vectors by
    construction: vec_id = doc_id)."""
    from .similarity import cosine_topk

    lex = bm25_by_example(docs, query_pred_doc, n_cand=n_cand)
    dense = cosine_topk(
        emb, query_pred_vec, k=n_cand, round_expr=round_expr
    )
    return rrf_fuse([lex, dense], k=k)


def mmr_rerank_topk(
    emb_df: DataFrame,
    query_pred: Column,
    n_cand: int = 10,
    k: int = 5,
    lam_num: int = 7,
    lam_den: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998 — public): select ``k`` of each query's top-``n_cand``
    cosine candidates one at a time, each pick maximizing
    ``λ·relevance − (1−λ)·max_similarity_to_already_selected`` — the
    diversity-aware final stage of a retrieval stack (after
    :func:`rrf_fuse`-style fusion), and the selection rule
    diversity-sampling curation pipelines reuse verbatim.

    Exact integer arithmetic throughout: relevance and pairwise
    similarity are micro-unit ints (``floor(cos·10⁶ + 0.5)``) and the
    MMR objective is scored as
    ``score_e7 = lam_num·rel_e6 − (lam_den − lam_num)·maxsim_e6``
    (the λ-weighted score times ``lam_den`` — same argmax, NO division,
    so no truncation-direction mismatch between engines on negative
    cosines). Ties break to the lower candidate id; the first pick is
    the pure-relevance argmax (``maxsim`` term 0, the paper's
    convention).

    Scale shape: the ONLY corpus-sized work is the initial broadcast
    query scan that produces the top-``n_cand`` candidates; the
    candidate-pair similarity table is |queries|·n_cand² rows and every
    selection round after that is SELECTED-set-granular (bounded joins
    over bounded frames — the k rounds compose lazily into one plan
    over tiny tables). Returns
    ``(q_id, mmr_rank, cand_id, score_e7)``."""
    from .similarity import _prepared, dot

    if not (0 < lam_num <= lam_den):
        raise ValueError(
            f"mmr_rerank_topk: need 0 < lam_num <= lam_den "
            f"(got {lam_num}/{lam_den})"
        )
    if k > n_cand:
        raise ValueError(
            f"mmr_rerank_topk: k ({k}) must be <= n_cand ({n_cand})"
        )
    e = _prepared(emb_df, id_col, vec_col)
    q = e.filter(query_pred).select(
        F.col(id_col).alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    rel_e6 = F.floor(
        dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")) * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col(id_col))
        .select("q_id", F.col(id_col).alias("cand_id"), rel_e6.alias("rel_e6"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("rel_e6"), F.col("cand_id"))
    cand = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_cand)
        .drop("__rn")
    )
    from .dedup import persist_scoped

    cand = persist_scoped("mmr_cand", cand)
    cvec = cand.join(
        e.select(F.col(id_col).alias("cand_id"), "v", "nrm"), "cand_id"
    ).select("q_id", "cand_id", "v", "nrm")
    a = cvec.select(
        "q_id", F.col("cand_id").alias("ca"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = cvec.select(
        "q_id", F.col("cand_id").alias("cb"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    sim_e6 = F.floor(
        dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")) * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    sims = persist_scoped(
        "mmr_sims",
        a.join(b, "q_id")
        .filter(F.col("ca") != F.col("cb"))
        .select("q_id", "ca", "cb", sim_e6.alias("sim_e6")),
    )
    mu = lam_den - lam_num
    # round 1: pure-relevance argmax. Each round's pick (|queries| rows
    # — guard-bounded: the query set is the operator's bounded side by
    # contract, the same class as text_bpe_encode_ranked's collected
    # merge list) crosses the driver and re-enters the next round as
    # LITERAL predicates over the persisted cand/sims tables. The
    # greedy recurrence otherwise re-derives cand/sims/sel per
    # reference and the lazy k-round composition blows the plan up
    # combinatorially (measured 923 textual exchanges at k=5 vs ~8
    # with truncation). r15: literal picks replace the r10 per-round
    # localCheckpoint — a checkpointed pick scans as an
    # UnknownPartitioning RDD, so every round paid an anti-join AND a
    # selected-side join against RDD scans (plus the checkpoint job
    # itself), and the final union replayed k RDD scans; with literals
    # each round is two narrow filters over the persisted tables, one
    # aggregate, one join, and the operator's RETURN is one local
    # relation (zero cluster work at action time). The predicate is
    # O(|queries|*k) literal terms — the same boundedness class as the
    # broadcast query set the operator already assumes.
    w1 = Window.partitionBy("q_id").orderBy(F.desc("rel_e6"), F.col("cand_id"))
    pick_plan = cand.withColumn("__rn", F.row_number().over(w1)).filter(
        F.col("__rn") == 1
    ).select(
        "q_id",
        F.lit(1).cast("int").alias("mmr_rank"),
        "cand_id",
        (F.lit(lam_num) * F.col("rel_e6")).cast("bigint").alias("score_e7"),
    )
    out_schema = pick_plan.schema
    spark = emb_df.sparkSession
    picked_rows = pick_plan.collect()

    def _is_selected(qc: str, cc: str) -> Column:
        return reduce(
            lambda x, y: x | y,
            [
                (F.col(qc) == F.lit(p["q_id"]))
                & (F.col(cc) == F.lit(p["cand_id"]))
                for p in picked_rows
            ],
        )

    for r in range(2, k + 1):
        # max similarity of each unselected candidate to the selected
        # set: filter the persisted pair table to (cb selected, ca not),
        # aggregate per (q, ca), then join back to cand for the exact
        # rel_e6 (functionally dependent on the key, so the join carries
        # it deterministically — same rows as the r10 join-then-max).
        ms = (
            sims.filter(
                _is_selected("q_id", "cb") & ~_is_selected("q_id", "ca")
            )
            .groupBy("q_id", F.col("ca").alias("cand_id"))
            .agg(F.max("sim_e6").alias("__mx"))
            .join(cand, ["q_id", "cand_id"])
        )
        score = (
            F.lit(lam_num) * F.col("rel_e6") - F.lit(mu) * F.col("__mx")
        ).cast("bigint")
        wr = Window.partitionBy("q_id").orderBy(
            F.desc("__score"), F.col("cand_id")
        )
        picked_rows.extend(
            ms.withColumn("__score", score)
            .withColumn("__rn", F.row_number().over(wr))
            .filter(F.col("__rn") == 1)
            .select(
                "q_id",
                F.lit(r).cast("int").alias("mmr_rank"),
                "cand_id",
                F.col("__score").alias("score_e7"),
            )
            .collect()
        )
    return spark.createDataFrame(picked_rows, schema=out_schema)
