"""Query battery: every SURVEY §2 operator expressed over the driver's
testdata tables, each paired with a DuckDB oracle SQL string."""

from .battery import QUERIES, oracle_sql_map, query_map

__all__ = ["QUERIES", "query_map", "oracle_sql_map"]
