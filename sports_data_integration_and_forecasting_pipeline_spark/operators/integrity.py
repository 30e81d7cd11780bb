"""Referential-integrity auditing — the data-quality gate a warehouse
runs after every load: for each declared FK relationship, how many child
rows reference a parent key that does not exist (orphans). The reference
pipeline's equivalent trust boundary is its canonical-table append (keys
are synthesized, so orphans mean a broken ingest); at 100 TB this audit
is how partition-level purges (retention, GDPR deletes) are verified not
to have stranded children.

Shape per relationship: distinct child keys (map-side combined) left-anti
joined against the parent key set, then ONE count pass over the child
keyed by orphan membership. The result is a lazy union of 1-row
aggregates — no driver-side loops over data, no collect.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_orphan_audit(
    relationships: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Audit a list of FK relationships.

    Each relationship is ``(name, child_df, child_key, parent_df,
    parent_key)``. Returns one row per relationship:
    ``(fk_name, n_child_rows, n_orphan_rows, n_orphan_keys)`` — row
    counts so the blast radius is visible, key counts so the fix list is
    sized. Null child keys count as orphan rows (a null FK violates the
    relationship as surely as a dangling one) but not as orphan keys.

    The orphan KEY set is computed distinct-first (child keys are
    many-to-one, so the anti-join runs on the collapsed key set), then
    broadcast back over the child for row counts — orphan sets are tiny
    when the data is healthy, which is the common case the plan should
    be shaped for.
    """
    if not relationships:
        raise ValueError("fk_orphan_audit: empty relationship list")
    rels = []
    for name, child, child_key, parent, parent_key in relationships:
        ck = child.select(F.col(child_key).alias("__k"))
        orphan_keys = (
            ck.filter(F.col("__k").isNotNull())
            .distinct()
            .join(
                parent.select(F.col(parent_key).alias("__k")).distinct(),
                "__k",
                "left_anti",
            )
        )
        # no broadcast HINT: orphan sets are tiny when the data is
        # healthy (AQE broadcasts them at runtime), but on PATHOLOGICAL
        # data — a dropped parent partition orphaning most child keys —
        # a forced broadcast builds a corpus-sized driver relation and
        # OOMs exactly when the audit matters most (r7 broadcast audit)
        flagged = ck.join(
            orphan_keys.withColumn("__orphan", F.lit(1)),
            "__k",
            "left",
        )
        stats = flagged.agg(
            F.count("*").cast("bigint").alias("n_child_rows"),
            F.count_if(F.col("__orphan").isNotNull() | F.col("__k").isNull())
            .cast("bigint")
            .alias("n_orphan_rows"),
        )
        keys = orphan_keys.agg(
            F.count("*").cast("bigint").alias("n_orphan_keys")
        )
        rels.append(
            stats.crossJoin(keys).select(
                F.lit(name).alias("fk_name"),
                "n_child_rows",
                "n_orphan_rows",
                "n_orphan_keys",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), rels)
