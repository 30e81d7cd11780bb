"""Structural pins for the r14 battery split (plans/battery_*.py).

The facade re-exports every section's top-level names via
``globals().setdefault`` — first definition wins, so a name defined in
TWO sections would be silently shadowed for facade importers. The
splitter refused collisions at split time; these tests keep that
invariant live as sections evolve independently.
"""

from __future__ import annotations

from sports_data_integration_and_forecasting_pipeline_spark.plans import battery


def test_no_cross_section_name_shadowing():
    """A top-level name bound in two section modules to DIFFERENT
    objects means the facade silently exports only the first — forbid
    it (imports of the same object across sections are fine)."""
    owners: dict[str, list[str]] = {}
    values: dict[str, int] = {}
    for mod in battery._SECTION_MODULES:
        for k, v in vars(mod).items():
            if k.startswith("__"):
                continue
            if k in values and values[k] != id(v):
                owners[k].append(mod.__name__)
            else:
                values.setdefault(k, id(v))
                owners.setdefault(k, [mod.__name__])
    collisions = {k: mods for k, mods in owners.items() if len(mods) > 1}
    assert not collisions, collisions


def test_no_cross_section_defined_name_collision():
    """Stricter than the id() check above (r14 advice item 3): two
    sections independently DEFINING the same top-level name can evade
    id() inequality when the bound values are interned/cached objects
    (small ints, short strings) — the facade would then silently export
    only the first definition if the values later diverge. So treat any
    name *defined* (assignment / def / class at module top level, not
    imported) in two sections as a collision, by reading each section's
    AST rather than its runtime namespace."""
    import ast
    import inspect

    owners: dict[str, list[str]] = {}
    for mod in battery._SECTION_MODULES:
        tree = ast.parse(inspect.getsource(mod))
        for node in tree.body:
            names: list[str] = []
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                names = [node.name]
            elif isinstance(node, ast.Assign):
                names = [
                    t.id for t in node.targets if isinstance(t, ast.Name)
                ]
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                names = [node.target.id]
            elif isinstance(node, (ast.AugAssign,)) and isinstance(
                node.target, ast.Name
            ):
                names = [node.target.id]
            for n in names:
                owners.setdefault(n, [])
                if mod.__name__ not in owners[n]:
                    owners[n].append(mod.__name__)
    collisions = {k: mods for k, mods in owners.items() if len(mods) > 1}
    assert not collisions, collisions


def test_facade_reexports_full_surface():
    """Every section's public-ish surface must be reachable from
    plans.battery (tests and tools import private helpers and entry
    callables directly from it)."""
    missing = []
    for mod in battery._SECTION_MODULES:
        for k in vars(mod):
            if k.startswith("__"):
                continue
            if not hasattr(battery, k):
                missing.append(f"{mod.__name__}.{k}")
    assert not missing, missing


def test_registry_object_identity():
    """The facade's QUERIES must BE battery_core's dict (one registry,
    mutated in place by _curate_order — a copy would freeze the window
    order at import time of whichever module copied it)."""
    from sports_data_integration_and_forecasting_pipeline_spark.plans import (
        battery_core,
    )

    assert battery.QUERIES is battery_core.QUERIES
    assert len(battery.QUERIES) == 253
