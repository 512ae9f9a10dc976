"""Driver-contract structural guards for __ray_entry__: the registry
invariants the driver relies on (every oracle key has a query, names
are stable identifiers, callables are 1-arg, no module ever calls
ray.init at import time)."""

from __future__ import annotations

import inspect
import re
import sys


def _entry():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e
    return e


def test_oracle_keys_subset_of_queries():
    e = _entry()
    qs, sqls = e.queries(), e.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 40
    assert all(isinstance(s, str) and s.strip() for s in sqls.values())


def test_query_names_are_stable_identifiers():
    e = _entry()
    for name in e.queries():
        assert re.fullmatch(r"[a-z][a-z0-9_]*", name), name


def test_query_callables_take_one_positional_arg():
    e = _entry()
    for name, fn in e.queries().items():
        params = [p for p in inspect.signature(fn).parameters.values()
                  if p.default is inspect.Parameter.empty
                  and p.kind in (p.POSITIONAL_ONLY,
                                 p.POSITIONAL_OR_KEYWORD)]
        assert len(params) == 1, f"{name} must take exactly sf_dir"


def test_entry_module_never_inits_ray():
    """Importing the registry must not start (or require) a Ray
    session — the driver owns it."""
    import ray
    e = _entry()
    e.queries()
    e.oracle_sql()
    # building the registries must not have initialized ray by itself
    # (the session-scoped test fixture may have; the invariant we can
    # check statically is that no library module CALLS ray.init —
    # docstrings don't count, the guarded CLI is exempt)
    import ast
    import pathlib
    root = pathlib.Path("/root/repo/kg_covid_19_ray")
    offenders = []
    for p in root.rglob("*.py"):
        if p.name == "cli.py":  # CLI owns its session (guarded)
            continue
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "init"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "ray"):
                offenders.append(f"{p}:{node.lineno}")
    assert not offenders, offenders


def test_registry_names_unique_across_modules():
    """_registry() merges per-module REGISTRY dicts with dict.update —
    a name collision would silently shadow a query. Guard: the union of
    module registries has exactly as many entries as the merged one."""
    import importlib

    e = _entry()
    total = 0
    seen: dict[str, str] = {}
    from kg_covid_19_ray.pipelines import kg_queries
    mods = {"kg_queries": kg_queries.REGISTRY}
    for mod_name in e.PIPELINE_MODULES:
        mods[mod_name] = importlib.import_module(
            f"kg_covid_19_ray.pipelines.{mod_name}").REGISTRY
    for mod_name, reg in mods.items():
        for name in reg:
            assert name not in seen, \
                f"{name} defined in both {seen[name]} and {mod_name}"
            seen[name] = mod_name
        total += len(reg)
    assert len(e.queries()) == total
