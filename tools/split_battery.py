"""One-shot mechanical splitter for ``plans/battery.py`` (VERDICT r13
task 3): carve the 16.8k-line monolith into per-family section modules
while preserving registration order, oracle SQL bytes, and the public
``plans.battery`` import surface exactly.

Method
------
- The file is cut at top-level statement boundaries (never inside a
  node), so each section module is a byte-exact contiguous slice of the
  original — comments and banners travel with their section.
- Execution order is preserved by importing the section modules from
  ``battery.py`` in original slice order; the shared registry
  (``QUERIES`` + ``_register``) moves to ``battery_core.py``.
- Cross-section name dependencies are resolved by AST analysis: each
  section gets explicit ``from .battery_<x> import (...)`` headers for
  every name it loads but does not define, with providers searched in
  slice order (an unresolvable name aborts the split).
- ``battery.py`` becomes the facade: section imports, the full
  historical symbol surface re-exported (tests import private helpers
  like ``_t`` / ``_fdiv`` / entry functions directly from it), plus the
  rotation ledger, ``_WINDOW_PRIORITY`` and ``_curate_order``.

Identity proof: run tools/check_battery_identity.py before and after —
md5 over sorted (name, oracle_sql) must be unchanged, and the ordered
name list (driver window!) must be unchanged.
"""

from __future__ import annotations

import ast
import builtins
import symtable
from pathlib import Path

PKG = Path("sports_data_integration_and_forecasting_pipeline_spark/plans")
SRC = PKG / "battery.py"

# Names every section header re-imports directly (same lines as the
# original top-of-file import block) — excluded from dependency search.
COMMON_IMPORTS = """\
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
"""
COMMON_NAMES = {
    "annotations", "dataclasses", "dataclass", "Callable",
    "Column", "DataFrame", "SparkSession", "F", "Window",
}

# (module_name, docstring, name-of-last-registered-entry-or-helper)
# Each section ends at the END line of the named top-level node.
SECTIONS = [
    ("battery_core",
     "Battery registry core: QuerySpec/QUERIES/_register, the testdata "
     "schema self-check, and the float-parity + epoch helpers shared by "
     "every section (SURVEY §5.2).",
     "oracle_sql_map"),
    ("battery_markets",
     "SURVEY §2 core: odds/markets/EV/backtest entries (devig, argmax "
     "best price, arbitrage, rolling/lead features, flagship report).",
     "pricing_summary"),
    ("battery_text_dedup",
     "Text quality + fingerprinting + the dedup families (exact, "
     "shingle-Jaccard, MinHash/LSH, SimHash), decontamination, PII, "
     "chunking and packing heads.",
     "dedup_simhash_pairs"),
    ("battery_embeddings",
     "Embedding similarity: cosine top-k, hard negatives, LSH/IVF ANN, "
     "PQ/IVF-PQ, RRF fusion, mean-pool, near-dup pairs, SemDeDup.",
     "embed_semdedup_keep"),
    ("battery_multimodal_streaming",
     "Multimodal payload/CDC/decode entries, the OLS forecast twin, and "
     "the Structured Streaming batch-twin family.",
     "streaming_late_data_drop"),
    ("battery_events_warehouse",
     "Event-log analytics + warehouse entries: flatten/sessionize, "
     "percentiles, as-of/salting, cohorts, SCD2, clustering, pivots, "
     "OHLC, histograms, manifests, sampling heads.",
     "sample_events_stratified"),
    ("battery_mixture_storage",
     "Mixture sampling, int8 quantization, inverted index, z-order "
     "layout, curation v2, storage/merge/iceberg entries, sketches "
     "(count-min, HLL, GK), perplexity gate, early TPC-H heads.",
     "vocab_coverage"),
    ("battery_tpch_graph",
     "TPC-H q-tail and graph/matrix analytics (triangles, transition "
     "matrices, attribution, hierarchy, k-means).",
     "kmeans_embeddings_lloyd"),
    ("battery_stats_audits",
     "Statistical audits: PMI, weighted median, checksums, grouping "
     "sets, sweep-line, chi-square, Benford, funnels, survival, BM25, "
     "A/B z-test, seasonal indices.",
     "seasonal_weekday_index"),
    ("battery_trends_drift",
     "Trend/drift entries: Theil-Sen (banded pair-join guards), ridge, "
     "anomalies, attribution windows, bitmaps, leakage-safe splits, "
     "HLL rolling, KL drift, k-core, bigram perplexity.",
     "text_bigram_perplexity"),
    ("battery_bpe_packing",
     "BPE family (merges/encode/fertility), sequence packing, LSH "
     "recall audit, MMR rerank, distinct n-grams, temperature mixture, "
     "Markov power iteration, distribution curves, calendar spines.",
     "winsorized_event_stats"),
    ("battery_pointintime_skyline",
     "Point-in-time enrichment/state lookup, Holt linear, embedding "
     "quality, banded Theil-Sen, trigrams, Zipf fit, MERGE upsert, IVF "
     "centroid refresh, sorted-neighborhood, skylines.",
     "skyline_orders_3d"),
    ("battery_substring_winnow",
     "ExactSubstr span family, winnowing (MOSS) fingerprints + "
     "incremental state, curation v3, KMV contamination, sketch merge "
     "parity, DSIR, AUC audit, matryoshka, curation v5.",
     "curation_pipeline_v5"),
    ("battery_curation_recent",
     "Round-12/13 additions: novelty audit, waterfill caps + prefix "
     "fill, Zipf/PSI/entropy audits, gate ablation, padding waste, "
     "label separation, IVF-PQ refine, curation v6, soft near-dup "
     "weights, embedding contamination audit, BPE vocab coverage.",
     "text_bpe_vocab_coverage"),
]


# Top-level nodes hoisted into battery_core (with their leading comment
# block): cross-family infrastructure that the monolith defined later in
# the file than its first user (legal under late binding in one module,
# a forward reference across two).
HOIST_TO_CORE = ["_PAIR_JOIN_MAX_GROUP", "_PAIR_JOIN_MAX_PAIRS",
                 "_assert_bounded_group"]


def main() -> None:
    src = SRC.read_text()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # hoist ranges: node span plus the contiguous comment block above
    hoist_lines: set[int] = set()   # 0-based indices
    hoist_text_parts: list[str] = []
    name_to_node = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            name_to_node[node.name] = node
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    name_to_node.setdefault(t.id, node)
                elif isinstance(t, (ast.Tuple, ast.List)):
                    for e in t.elts:
                        if isinstance(e, ast.Name):
                            name_to_node.setdefault(e.id, node)
    seen_nodes = set()
    for hname in HOIST_TO_CORE:
        node = name_to_node[hname]
        if id(node) in seen_nodes:
            continue
        seen_nodes.add(id(node))
        start = node.lineno - 1
        while start > 0 and lines[start - 1].lstrip().startswith("#"):
            start -= 1
        span = range(start, node.end_lineno)
        hoist_lines.update(span)
        hoist_text_parts.append("".join(lines[i] for i in span))

    # locate each section's terminal node
    def node_key(node):
        names = []
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            names.append(node.name)
        return names

    end_line_of = {}
    for node in tree.body:
        for nm in node_key(node):
            end_line_of[nm] = node.end_lineno
        if isinstance(node, (ast.FunctionDef,)):
            for dec in node.decorator_list:
                if (isinstance(dec, ast.Call)
                        and getattr(dec.func, "id", "") == "_register"
                        and dec.args and isinstance(dec.args[0], ast.Constant)):
                    end_line_of[dec.args[0].value] = node.end_lineno

    cut_ends = []
    for _, _, last in SECTIONS:
        if last not in end_line_of:
            raise SystemExit(f"terminal node {last!r} not found")
        cut_ends.append(end_line_of[last])
    if cut_ends != sorted(cut_ends):
        raise SystemExit("sections out of order")

    # slice text per section; remainder (window priority + ledger +
    # curate) stays for the facade
    slices = []
    prev = 0
    for (name, doc, _), end in zip(SECTIONS, cut_ends):
        body = "".join(
            lines[i] for i in range(prev, end) if i not in hoist_lines
        )
        if name == "battery_core" and hoist_text_parts:
            body += (
                "\n\n# --- hoisted by the r14 split: cross-family pair-join"
                " guards the\n# monolith defined mid-file (late-bound there,"
                " a forward reference\n# across modules) "
                "-------------------------------------------------\n"
                + "\n\n".join(hoist_text_parts)
            )
        slices.append((name, doc, body))
        prev = end
    remainder = "".join(lines[prev:])

    # dependency analysis per slice
    bt = set(dir(builtins))
    provider: dict[str, str] = {}
    outputs: list[tuple[str, str]] = []
    all_defined: dict[str, str] = {}
    for name, doc, body in slices:
        mod = ast.parse(body)
        defined: set[str] = set()
        used: set[str] = set()
        for node in mod.body:
            if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
                defined.add(node.name)
            elif isinstance(node, ast.Assign):
                def add_target(t):
                    if isinstance(t, ast.Name):
                        defined.add(t.id)
                    elif isinstance(t, (ast.Tuple, ast.List)):
                        for e in t.elts:
                            add_target(e)
                for t in node.targets:
                    add_target(t)
            elif isinstance(node, ast.AnnAssign):
                if isinstance(node.target, ast.Name):
                    defined.add(node.target.id)
            elif isinstance(node, ast.Import):
                for a in node.names:
                    defined.add((a.asname or a.name).split(".")[0])
            elif isinstance(node, ast.ImportFrom):
                for a in node.names:
                    defined.add(a.asname or a.name)
        # scope-aware use analysis: a name counts as "used" only when it
        # resolves to MODULE scope (module-level loads, plus names that
        # are global-implicit/explicit inside nested function scopes)
        def collect(table: symtable.SymbolTable, top: bool) -> None:
            for s in table.get_symbols():
                if not s.is_referenced():
                    continue
                if top:
                    used.add(s.get_name())
                elif s.is_global():
                    used.add(s.get_name())
            for child in table.get_children():
                collect(child, False)

        collect(symtable.symtable(body, name, "exec"), True)
        for d in defined:
            if d in all_defined and name != "battery_core":
                # same name defined in two sections would shadow on the
                # facade — forbid outright
                raise SystemExit(
                    f"name collision: {d} in {all_defined[d]} and {name}")
            all_defined.setdefault(d, name)

        need = sorted(used - defined - bt - COMMON_NAMES)
        by_provider: dict[str, list[str]] = {}
        unresolved = []
        for n in need:
            p = provider.get(n)
            if p is None:
                unresolved.append(n)
            else:
                by_provider.setdefault(p, []).append(n)
        if name == "battery_core" and unresolved:
            raise SystemExit(f"core unresolved: {unresolved}")
        if unresolved and name != "battery_core":
            raise SystemExit(f"{name} unresolved: {unresolved}")

        header = f'"""{doc}\n\nMechanical slice of the original plans/battery.py (r14 split —\nVERDICT r13 task 3); statement order and oracle SQL are byte-identical\nto the monolith. Registration side-effects land in\n:data:`battery_core.QUERIES` at import time; ``plans/battery.py``\nimports the sections in original order and re-exports every name.\n"""\n\n' + COMMON_IMPORTS
        imports = []
        for p in sorted(by_provider):
            ns = by_provider[p]
            line = f"from .{p} import " + ", ".join(ns)
            if len(line) > 78:
                line = (f"from .{p} import (\n    "
                        + ",\n    ".join(ns) + ",\n)")
            imports.append(line)
        text = header
        if imports:
            text += "\n" + "\n".join(imports) + "\n"
        if name == "battery_core":
            # core body already starts with the original module
            # docstring + imports; strip the generated common header
            # and keep the original bytes wholesale.
            text = body
        else:
            text += "\n\n" + body
        outputs.append((name, text))
        for d in defined:
            provider.setdefault(d, name)

    # facade battery.py
    section_names = [n for n, _, _ in SECTIONS]
    facade = '"""Facade for the correctness battery (SURVEY §5.2 tier-2).\n\nThe battery itself lives in per-family section modules (r14 split —\nVERDICT r13 task 3); importing them here, in original registration\norder, populates :data:`battery_core.QUERIES` exactly as the former\nmonolith did (same 253 names, same order, byte-identical oracle SQL —\nproved by tools/check_battery_identity.py). This module keeps the\nhistorical import surface: every top-level name of every section is\nre-exported, so ``from ...plans.battery import _t, QUERIES, cube_pricing``\nall keep working, and the driver-window rotation ledger + curation stay\nhere, next to the window they control.\n"""\n\nfrom __future__ import annotations\n\n'
    facade += "from . import (\n"
    for n in section_names:
        facade += f"    {n},\n"
    facade += ")\n\n"
    facade += "_SECTION_MODULES = (\n"
    for n in section_names:
        facade += f"    {n},\n"
    facade += ")\n\n"
    facade += (
        "# Re-export the full historical surface (tests and tools import\n"
        "# private helpers and entry callables directly from this module).\n"
        "for _m in _SECTION_MODULES:\n"
        "    for _k, _v in vars(_m).items():\n"
        "        if not _k.startswith(\"__\"):\n"
        "            globals().setdefault(_k, _v)\n"
        "del _m, _k, _v\n\n"
        "QUERIES = battery_core.QUERIES\n"
        "query_map = battery_core.query_map\n"
        "oracle_sql_map = battery_core.oracle_sql_map\n\n"
    )
    facade += remainder

    for name, text in outputs:
        (PKG / f"{name}.py").write_text(text)
        print(f"wrote {name}.py ({text.count(chr(10))} lines)")
    SRC.write_text(facade)
    print(f"wrote battery.py facade ({facade.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
