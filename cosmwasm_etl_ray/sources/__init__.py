from cosmwasm_etl_ray.sources.changes import (
    CHANGES_CTE,
    changes_from_documents,
    read_documents,
)
from cosmwasm_etl_ray.sources.generator import generate_change_stream

__all__ = [
    "CHANGES_CTE",
    "changes_from_documents",
    "read_documents",
    "generate_change_stream",
]
