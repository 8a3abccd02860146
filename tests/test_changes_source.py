"""The documents→changes expansion must agree exactly with its DuckDB
CTE twin — this is what makes the driver's oracle check meaningful."""

import duckdb
import pandas as pd

from cosmwasm_etl_ray.sources.changes import CHANGES_CTE, changes_from_documents


def test_expansion_matches_sql_cte(sf_dir):
    ray_df = (
        changes_from_documents(sf_dir)
        .to_pandas()
        .sort_values(["commit", "repo", "path"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    sql_df = (
        con.sql(f'WITH {CHANGES_CTE.strip()} SELECT * FROM changes ORDER BY "commit", repo, path')
        .df()
        .reset_index(drop=True)
    )
    assert len(ray_df) == len(sql_df) > 0
    pd.testing.assert_frame_equal(ray_df, sql_df[ray_df.columns.tolist()])


def test_expansion_properties(sf_dir):
    df = changes_from_documents(sf_dir).to_pandas()
    # ops well-formed; first event per key is the insert
    assert set(df["op"]) == {"insert", "update", "delete"}
    first = df.sort_values("commit").groupby(["repo", "path"]).first()
    assert (first["op"] == "insert").all()
    # deletes have empty content
    assert (df.loc[df["op"] == "delete", "content"] == "").all()
    # hot keys exist (salting/combiner test fodder)
    per_key = df.groupby(["repo", "path"]).size()
    assert per_key.max() >= 46


def test_expand_documents_empty_batch():
    """A 0-row documents block expands to a 0-row change table with the
    full schema (the vectorized expansion indexes ends[-1])."""
    import pyarrow as pa

    from cosmwasm_etl_ray.sources.changes import expand_documents_batch

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
            "lang": pa.array([], type=pa.string()),
        }
    )
    out = expand_documents_batch(empty)
    assert out.num_rows == 0
    assert out.column_names == ["repo", "path", "commit", "lang", "content", "op"]
