"""Document chunking — split long documents into token-bounded,
optionally overlapping windows (the pre-tokenization step of sequence
packing for LLM training, and the unit of retrieval indexing).

Scale shape: ENTIRELY NARROW — tokenize, compute chunk starts with
integer arithmetic, explode, slice. Zero shuffles, zero Python; a 100 TB
corpus chunks at parquet-scan speed and the output stays co-partitioned
with its input (downstream per-chunk ops start shuffle-free).

Chunk layout: starts at 0, stride, 2·stride, … while start < n_tokens;
each chunk takes ``max_tokens`` tokens (the tail may be shorter).
``stride < max_tokens`` yields the standard training overlap;
``stride = max_tokens`` is disjoint packing. All integer arithmetic, so
the battery entry hash-matches DuckDB (`slice(arr, i, n)` ==
`list_slice(l, i, i+n-1)` — both 1-based, both end-clamped).

No reference counterpart; part of the corpus-curation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 32,
    stride: int | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (doc, chunk): ``(id_col, *passthrough, chunk_id,
    chunk_start, chunk_tokens, chunk_fp)`` where ``chunk_fp`` is the md5
    of the chunk's whitespace-rejoined text (carry the text itself by
    swapping the fingerprint projection — fp keeps battery rows
    compact). ``passthrough`` columns (e.g. language, source) ride the
    narrow plan instead of forcing a join-back after chunking."""
    stride = stride or max_tokens
    if not 0 < stride <= max_tokens:
        raise ValueError("need 0 < stride <= max_tokens")
    extra = list(passthrough)
    toks = df.select(
        F.col(id_col),
        *extra,
        F.split(F.col(text_col), " ").alias("__toks"),
    ).withColumn("__n", F.size("__toks"))
    # n_chunks = ceil(n / stride), integer-exact in both engines
    chunks = toks.select(
        id_col,
        *extra,
        "__toks",
        F.explode(
            F.sequence(
                F.lit(0), F.expr(f"(__n + {stride - 1}) div {stride}").cast("int") - 1
            )
        ).alias("chunk_id"),
    ).withColumn("__chunk", F.slice("__toks", F.col("chunk_id") * stride + 1, max_tokens))
    return chunks.select(
        id_col,
        *extra,
        F.col("chunk_id").cast("bigint"),
        (F.col("chunk_id") * stride).cast("bigint").alias("chunk_start"),
        F.size("__chunk").cast("bigint").alias("chunk_tokens"),
        F.md5(F.array_join("__chunk", " ")).alias("chunk_fp"),
    )


def global_prefix_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    n_col: str = "n_tokens",
    bucket_width: int = 4096,
) -> DataFrame:
    """``df`` + ``tok_start``: each row's EXCLUSIVE prefix sum of
    ``n_col`` in global ``id_col`` order — the distributed prefix-sum
    primitive sequence packing needs.

    A naive ``Window.orderBy(id)`` with no partition key funnels the
    whole table through ONE task; this is the classic two-phase form
    instead, with deterministic buckets (``id // bucket_width``) rather
    than sampled ranges so results never depend on a range partitioner's
    sample:

    1. within-bucket running sum — one hash shuffle on the bucket key;
    2. per-bucket totals — same partitioning, no extra exchange;
    3. exclusive prefix over the (tiny: id_range/bucket_width rows)
       bucket-total table — a one-task window over KBs, not the data;
    4. broadcast the bucket offsets back.

    Every task's state is bounded by ``bucket_width`` rows regardless of
    table size. Requires a numeric, unique ``id_col``; ids may be sparse
    (empty buckets cost nothing).
    """
    bucket = (F.col(id_col) / bucket_width).cast("bigint").alias("__bucket")
    d = df.withColumn("__bucket", bucket)
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("__cum_in", F.sum(n_col).over(w_in))
    totals = d.groupBy("__bucket").agg(F.sum(n_col).alias("__btot"))
    w_b = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__btot").over(w_b), F.lit(0)).alias("__boff"),
    )
    return (
        d.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "tok_start",
            (F.col("__boff") + F.col("__cum_in") - F.col(n_col)).cast("bigint"),
        )
        .drop("__bucket", "__cum_in", "__boff")
    )


def pack_token_spans(
    df: DataFrame,
    seq_len: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """GPT-style sequence packing, span view: concatenate all documents in
    ``id_col`` order and cut the token stream every ``seq_len`` tokens;
    report for each document where it lands — ``(id, n_tokens, tok_start,
    first_seq, last_seq, n_seqs)``. ``n_seqs > 1`` means the doc straddles
    a sequence boundary (the share of such docs is the packing
    fragmentation metric). All integer arithmetic over the distributed
    prefix sum — deterministic and engine-exact at any scale."""
    toks = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_tokens"),
    )
    return pack_counted_spans(
        toks,
        seq_len=seq_len,
        id_col=id_col,
        n_col="n_tokens",
        bucket_width=bucket_width,
    )


def pack_counted_spans(
    counts: DataFrame,
    seq_len: int = 256,
    id_col: str = "doc_id",
    n_col: str = "n_tokens",
    bucket_width: int = 4096,
) -> DataFrame:
    """The packing core over an ARBITRARY per-document token-count frame
    ``(id_col, n_col)`` — so packing can consume REAL tokenizer counts
    (e.g. :func:`~.textstats.bpe_encode_stats`'s ``n_bpe_tokens``)
    instead of the whitespace estimate. Output schema and arithmetic as
    :func:`pack_token_spans` (``n_col`` reported as ``n_tokens``)."""
    counts = counts.select(
        F.col(id_col), F.col(n_col).cast("bigint").alias("n_tokens")
    )
    spans = global_prefix_offsets(
        counts, id_col=id_col, n_col="n_tokens", bucket_width=bucket_width
    )
    tok_end = F.col("tok_start") + F.col("n_tokens")  # exclusive
    return spans.select(
        id_col,
        "n_tokens",
        "tok_start",
        F.floor(F.col("tok_start") / seq_len).cast("bigint").alias("first_seq"),
        F.floor((tok_end - 1) / seq_len).cast("bigint").alias("last_seq"),
        (
            F.floor((tok_end - 1) / seq_len)
            - F.floor(F.col("tok_start") / seq_len)
            + 1
        )
        .cast("bigint")
        .alias("n_seqs"),
    )


def padding_waste_curve(
    df: DataFrame,
    seq_lens: tuple[int, ...] = (128, 256, 512),
    text_col: str = "text",
) -> DataFrame:
    """Padding-waste curve over candidate context lengths — the
    "pick your seq_len" compute audit for DOCUMENT-BOUNDARY packing
    (each doc chunked to ``ceil(n/L)`` sequences, the last chunk padded
    to L; the policy when cross-document attention is disallowed).
    GPT-style concat packing (:func:`pack_token_spans`) wastes nothing
    by construction — this audit quantifies what respecting document
    boundaries COSTS at each L, which is exactly the number teams weigh
    when choosing between the two policies.

    Per candidate L: ``pad(doc) = (L − n mod L) mod L`` — exact
    integers throughout; ``waste_e6 = 1e6·Σpad div (Σn + Σpad)`` (the
    fraction of compute spent on padding). Returns one row per L:
    ``(seq_len, n_docs, n_seqs, data_tokens, padding_tokens,
    waste_e6)``. Degenerate inputs DEGRADE: an empty corpus yields zero
    rows; a zero-token doc contributes one fully-padded sequence only
    if n = 0 never occurs here (split('') counts 1 token), so no
    special case is reachable — and the arithmetic never divides by
    zero (Σn ≥ n_docs ≥ 1 within a group).

    Scale shape: one narrow token-count projection, an inline
    len(seq_lens)-struct explode (corpus × |L| rows, no join), one
    map-side-combined aggregate to |L| rows."""
    if not seq_lens or any(L < 1 for L in seq_lens):
        raise ValueError(
            f"padding_waste_curve: seq_lens must be positive (got {seq_lens})"
        )
    n = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    arms = [
        F.struct(
            F.lit(int(L)).cast("int").alias("seq_len"),
            F.expr(f"(({int(L)} - __n % {int(L)}) % {int(L)})")
            .cast("bigint")
            .alias("pad"),
            F.expr(f"(__n + {int(L)} - 1) DIV {int(L)}")
            .cast("bigint")
            .alias("n_seq"),
        )
        for L in seq_lens
    ]
    ex = (
        df.select(n.alias("__n"))
        .select("__n", F.explode(F.array(*arms)).alias("a"))
        .select(
            "__n",
            F.col("a.seq_len").alias("seq_len"),
            F.col("a.pad").alias("pad"),
            F.col("a.n_seq").alias("n_seq"),
        )
    )
    return (
        ex.groupBy("seq_len")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_seq").cast("bigint").alias("n_seqs"),
            F.sum("__n").cast("bigint").alias("data_tokens"),
            F.sum("pad").cast("bigint").alias("padding_tokens"),
        )
        .select(
            "seq_len",
            "n_docs",
            "n_seqs",
            "data_tokens",
            "padding_tokens",
            F.expr(
                "1000000 * padding_tokens div (data_tokens + padding_tokens)"
            )
            .cast("bigint")
            .alias("waste_e6"),
        )
    )
