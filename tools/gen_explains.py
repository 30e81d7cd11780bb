import sys, io, re; sys.path.insert(0, "/root/repo")
from contextlib import redirect_stdout
from sports_data_integration_and_forecasting_pipeline_spark.session import get_spark
from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import QUERIES
spark = get_spark(app_name="explains", master="local[4]")
SF = "/root/testdata/sf0.01"
NOTES = {
  "flagship_market_report": "Best-price window + arbitrage agg + join-back: filters pushed to scan, window reuses one exchange, WindowGroupLimit prunes before shuffle.",
  "devig_proportional": "Share-of-group window: one hash exchange on the group key, unbounded frame so no sort-based frame scan.",
  "best_price_per_order": "Argmax per group: WindowGroupLimit applies the top-1 cut map-side (partial) AND reduce-side (final) — the no-wasted-sort plan.",
  "dedup_shingle_jaccard": "Inverted index on 60-bit hashes: broadcast anti-join hot-shingle guard (LeftAnti + BroadcastExchange), pair join + single groupBy.",
  "dedup_minhash_lsh": "One explode->groupBy for 16 signature mins (partial aggregation), banded bucket self-join, est-jaccard from carried signature arrays.",
  "embed_cosine_topk": "Bounded query side broadcast (BroadcastNestedLoopJoin BuildRight); per-query top-k via WindowGroupLimit before the final exchange.",
  "dedup_simhash": "Zero-shuffle narrow plan: the whole 16-bit signature is computed inside one Project over the scan.",
  "event_sessionize": "Two windows + groupBy all share the user_id partitioning: a single exchange drives lag, running-sum, and the session rollup.",
  "customer_order_rollup": "Dim joins broadcast (region/nation-sized sides), fact agg is partial+final.",
}
out = ["# EXPLAINS — physical plans of representative battery queries",
       "",
       "Auto-generated with `df.explain(\"formatted\")` at sf0.01 (plan shapes are",
       "scale-invariant; AQE refines partition counts at runtime). Regenerate with",
       "`python tools/gen_explains.py`. The properties called out here are",
       "regression-asserted in `tests/test_plan_shapes.py`.",
       ""]
for name, note in NOTES.items():
    df = QUERIES[name].fn(spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf): df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n")[0]
    out.append(f"## {name}\n\n{note}\n\n```\n{tree}\n```\n")
open("/root/repo/EXPLAINS.md", "w").write("\n".join(out))
print("wrote EXPLAINS.md", len("\n".join(out)), "chars")
