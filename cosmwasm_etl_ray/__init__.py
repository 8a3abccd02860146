"""cosmwasm_etl_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch rebuild of the query and data-processing capabilities of
dezswap/cosmwasm-etl (reference at /root/reference, Go) on top of
``ray.data.Dataset``:

- a change-event stream (binlog analogue of the reference's per-height
  ``RawTx`` batches, /root/reference/parser/dto.go:9-17) over a Parquet
  table of source-code repositories
  ``(repo, path, commit, lang, content, op)``;
- keyed last-writer-wins upserts on ``(repo, path)`` with ``commit`` as
  the monotone sequence number and tombstone deletes — the graft of the
  reference's pair upsert + parsed-tx apply
  (/root/reference/parser/dex/repo/repository.go:63-122);
- an exactly-once Parquet sink committed via per-partition manifest
  files carrying lineage (offset range, row counts, epoch) — the graft
  of the insert+cursor single transaction
  (/root/reference/parser/dex/repo/repository.go:117-119);
- hot-key detection + salting before the per-key sequence-ordered
  reduce;
- derived incremental aggregations (windowed stats, running history,
  as-of joins) mirroring the reference's aggregator tasks
  (/root/reference/aggregator/task.go);
- training-data operators (dedup exact/minhash/simhash, ANN search,
  text analysis) as first-class Ray Data stages.

Everything is expressed Ray-Data-first: ``read_parquet`` →
``map_batches`` over zero-copy Arrow → ``groupby``/``map_groups`` for
the keyed shuffle → ``write_parquet``; stateful stages are actor pools.
No module calls ``ray.init()`` — sessions are owned by bench.py / tests.
"""

__version__ = "0.1.0"
