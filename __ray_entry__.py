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


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from cosmwasm_etl_ray.pipelines import queries_cdc

    out: dict[str, Callable[[str], Any]] = {}
    out.update(queries_cdc.QUERIES)
    try:
        from cosmwasm_etl_ray.pipelines import queries_relational

        out.update(queries_relational.QUERIES)
    except ImportError:
        pass
    try:
        from cosmwasm_etl_ray.pipelines import queries_textml

        out.update(queries_textml.QUERIES)
    except ImportError:
        pass
    try:
        from cosmwasm_etl_ray.pipelines import queries_extra

        out.update(queries_extra.QUERIES)
    except ImportError:
        pass
    try:
        from cosmwasm_etl_ray.pipelines import queries_transfers

        out.update(queries_transfers.QUERIES)
    except ImportError:
        pass
    try:
        from cosmwasm_etl_ray.pipelines import queries_dataprep

        out.update(queries_dataprep.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (same column names)."""
    from cosmwasm_etl_ray.pipelines import queries_cdc

    out: dict[str, str] = {}
    out.update(queries_cdc.ORACLE_SQL)
    try:
        from cosmwasm_etl_ray.pipelines import queries_relational

        out.update(queries_relational.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from cosmwasm_etl_ray.pipelines import queries_textml

        out.update(queries_textml.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from cosmwasm_etl_ray.pipelines import queries_extra

        out.update(queries_extra.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from cosmwasm_etl_ray.pipelines import queries_transfers

        out.update(queries_transfers.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from cosmwasm_etl_ray.pipelines import queries_dataprep

        out.update(queries_dataprep.ORACLE_SQL)
    except ImportError:
        pass
    return out
