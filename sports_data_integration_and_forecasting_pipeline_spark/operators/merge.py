"""MERGE INTO — the lakehouse upsert primitive (Delta/Iceberg-style):
apply a keyed change batch (update / delete / insert rows) to a target
table in one declarative operation.

The reference engine has no merge surface (it appends snapshots —
reference sinks write whole files); this operator is part of the
LLM-data-pipeline extension pack: corpus curation at scale is
incremental, and the canonical way to fold a day's crawl/CDC batch into
a 100 TB canonical table is MERGE, not rewrite.

Scale shape (the small-source case, which is THE production case for
CDC batches): the source is broadcast, so the target is never
shuffled — two broadcast-hash passes over the target scan (one
left-outer join for carry/update/delete, one inner join to discover
which insert keys already exist), each pushdown-friendly and
whole-stage-codegen'd. For a source too big to broadcast you would
instead co-partition both sides on the key (bucketed table or
repartition) — that variant is a caller-side `.hint("merge")` decision,
not a different operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A MERGE source is a keyed change batch, not a fact table: past this
# many rows the broadcast plan is wrong and the caller should
# co-partition instead. Loud failure, same style as the battery's
# pair-join heavy-key guard.
MERGE_SOURCE_MAX_ROWS = 1_000_000


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    update_op: str = "update",
    delete_op: str = "delete",
    insert_op: str = "insert",
    action_col: str = "merge_action",
    broadcast_source: bool = True,
) -> DataFrame:
    """Apply ``source`` (rows labeled ``update``/``delete``/``insert`` in
    ``op_col``, carrying a full payload image in the target's non-key
    columns) to ``target``. Returns the post-merge table plus
    ``action_col`` ∈ {'carry', 'update', 'insert'}:

    - matched + ``update``  → target row replaced by the source payload
    - matched + ``delete``  → target row dropped
    - matched + ``insert``  → ignored (ANSI/Delta whenNotMatched only)
    - unmatched ``update``/``delete`` → ignored (whenMatched only)
    - unmatched ``insert``  → appended

    Preconditions (ENFORCED, fail-loud): source keys are unique (ANSI
    MERGE raises on multiple matches for one target row — silently
    picking one would be nondeterministic), and — on the default
    broadcast path — the source is change-batch sized
    (``MERGE_SOURCE_MAX_ROWS``) so the broadcast plan is valid. The
    checks are EAGER (cheap aggregates over the source only — the
    target is never touched) at construction time, the
    `_assert_bounded_group` house style.

    ``broadcast_source=False`` selects the big-source plan: ONE
    co-partitioned full-outer join on the key (both sides shuffle; use
    bucketed tables to make even that shuffle-free). Identical
    semantics — differentially tested against the broadcast path —
    with no source-size bound.
    """
    payload = [c for c in target.columns if c not in key_cols]
    # The plan reserves __-prefixed internals (__op, __t, __src_<col>)
    # plus the action output column; a target/source already using one
    # would silently alias the wrong payload or die with an ambiguous-
    # column error mid-plan. Fail loudly at entry instead (free —
    # schema-only, no job).
    reserved = {"__op", "__t", action_col} | {f"__src_{c}" for c in payload}
    clash = reserved & (set(target.columns) | set(source.columns))
    if clash:
        raise ValueError(
            "merge_into reserved-name collision: column(s) "
            f"{sorted(clash)} already exist on the target/source — "
            "rename them or pass a different action_col; __op/__t/"
            "__src_<col> are internal to the merge plan."
        )
    stats = (
        source.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .agg(
            F.count("*").alias("rows"),
            F.max("n").alias("mx"),
        )
        .collect()[0]
    )
    if stats["mx"] is not None and stats["mx"] > 1:
        raise AssertionError(
            "merge_into source-key precondition violated: a key appears "
            f"{stats['mx']} times in the source — ANSI MERGE forbids "
            "multiple source matches per target row (the applied row "
            "would be nondeterministic). Deduplicate the change batch "
            "(e.g. keep the latest image per key) upstream."
        )
    if (
        broadcast_source
        and stats["rows"] is not None
        and stats["rows"] > MERGE_SOURCE_MAX_ROWS
    ):
        raise AssertionError(
            "merge_into source-size precondition violated: source has "
            f"{stats['rows']:,} keys (bound {MERGE_SOURCE_MAX_ROWS:,}) — "
            "the broadcast merge plan would OOM executors. Use "
            "broadcast_source=False (co-partitioned full-outer merge) "
            "for fact-sized sources."
        )

    src = source.select(op_col, *key_cols, *payload)
    if not broadcast_source:
        # Big-source plan: one full-outer join on the key. Each joined
        # row resolves locally: matched+update substitutes, matched+
        # delete drops, unmatched insert appends, everything else
        # carries — a single co-partitioned shuffle on each side.
        t_tag = target.withColumn("__t", F.lit(True))
        s_tag = src.select(
            F.col(op_col).alias("__op"),
            *key_cols,
            *[F.col(c).alias(f"__src_{c}") for c in payload],
        )
        full = t_tag.join(s_tag, key_cols, "full_outer")
        matched = F.col("__t").isNotNull()
        keep = (
            # matched rows survive unless deleted (a matched insert is
            # an ANSI no-op, so its target row carries)
            (matched & (F.col("__op").isNull() | (F.col("__op") != delete_op)))
            | (~matched & (F.col("__op") == insert_op))
        )
        use_src = (F.col("__op") == update_op) | (
            ~matched & (F.col("__op") == insert_op)
        )
        return full.filter(keep).select(
            *key_cols,
            *[
                F.when(use_src, F.col(f"__src_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in payload
            ],
            F.when(~matched, F.lit("insert"))
            .when(F.col("__op") == update_op, F.lit("update"))
            .otherwise(F.lit("carry"))
            .alias(action_col),
        )
    matched_side = F.broadcast(
        src.filter(F.col(op_col).isin(update_op, delete_op)).select(
            F.col(op_col).alias("__op"),
            *key_cols,
            *[F.col(c).alias(f"__src_{c}") for c in payload],
        )
    )
    # Leg 1: one broadcast left-outer join over the full target —
    # carry unmatched rows, substitute the payload for updates, drop
    # deletes. The target scan stays narrow and is never shuffled.
    joined = target.join(matched_side, key_cols, "left_outer")
    survived = joined.filter(
        F.col("__op").isNull() | (F.col("__op") == update_op)
    ).select(
        *key_cols,
        *[
            F.when(
                F.col("__op") == update_op, F.col(f"__src_{c}")
            )
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
        F.when(F.col("__op") == update_op, F.lit("update"))
        .otherwise(F.lit("carry"))
        .alias(action_col),
    )
    # Leg 2: inserts = insert-labeled source keys NOT already in the
    # target. A direct source-anti-target join would shuffle the huge
    # target (broadcast-hash LeftAnti can only build on the right), so
    # discover the matched keys with a broadcast INNER join (second
    # narrow target scan, tiny output) and anti-join the source — both
    # sides of that final anti-join are change-batch sized.
    src_ins = src.filter(F.col(op_col) == insert_op)
    matched_ins_keys = target.select(*key_cols).join(
        F.broadcast(src_ins.select(*key_cols)), key_cols, "inner"
    )
    inserts = src_ins.join(
        F.broadcast(matched_ins_keys), key_cols, "left_anti"
    ).select(
        *key_cols,
        *payload,
        F.lit("insert").alias(action_col),
    )
    return survived.unionByName(inserts)
