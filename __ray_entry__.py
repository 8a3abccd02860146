"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB. No function here (or in the library) calls ``ray.init()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full CDC replay (final-state table with
    per-row content sha256) over /root/testdata/sf0.001."""
    from cosmwasm_etl_ray.pipelines.queries_cdc import cdc_final_state

    return cdc_final_state("/root/testdata/sf0.001")


_QUERY_MODULES = (
    "queries_cdc",
    "queries_relational",
    "queries_textml",
    "queries_extra",
    "queries_transfers",
    "queries_dataprep",
)


def _merged(attr: str) -> dict:
    """Union one attr across the query suites. A suite is optional only
    in the sense that ITS module may be absent — a transitive
    ImportError inside a present module must surface, or a broken
    family silently drops out of the gate and it still exits green."""
    import importlib

    out: dict = {}
    for modname in _QUERY_MODULES:
        try:
            mod = importlib.import_module(f"cosmwasm_etl_ray.pipelines.{modname}")
        except ModuleNotFoundError as e:
            if e.name and e.name.endswith(modname):
                continue  # the suite itself is absent: optional
            raise  # a dependency inside the suite broke: loud
        out.update(getattr(mod, attr))
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return _merged("QUERIES")


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (same column names)."""
    return _merged("ORACLE_SQL")
