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

from cosmwasm_etl_ray._malloc import tune_malloc as _tune_malloc

_tune_malloc()  # see _malloc.py: slow-first-touch hosts; opt out GRAFT_MALLOC_TUNE=0


def __getattr__(name):
    """Lazy public API (keeps `import cosmwasm_etl_ray` cheap — no Ray
    import until a pipeline symbol is touched)."""
    api = {
        "EngineConfig": ("cosmwasm_etl_ray.config", "EngineConfig"),
        "GeneratorConfig": ("cosmwasm_etl_ray.config", "GeneratorConfig"),
        "StateStore": ("cosmwasm_etl_ray.state.manifest", "StateStore"),
        "replay_files": ("cosmwasm_etl_ray.pipelines.replay", "replay_files"),
        "apply_epoch": ("cosmwasm_etl_ray.pipelines.replay", "apply_epoch"),
        "read_state": ("cosmwasm_etl_ray.pipelines.replay", "read_state"),
        "tail_changes": ("cosmwasm_etl_ray.sources.tail", "tail_changes"),
        "validate_store": ("cosmwasm_etl_ray.stages.validate", "validate_store"),
        "replay_quarantine": ("cosmwasm_etl_ray.state.quarantine", "replay_quarantine"),
        "store_metrics": ("cosmwasm_etl_ray.state.metrics", "store_metrics"),
        "gc_state": ("cosmwasm_etl_ray.state.gc", "gc_state"),
        "bootstrap_store": ("cosmwasm_etl_ray.state.gc", "bootstrap_store"),
        "run_all_tasks": ("cosmwasm_etl_ray.pipelines.aggregator", "run_all_tasks"),
    }
    if name in api:
        import importlib

        mod, sym = api[name]
        return getattr(importlib.import_module(mod), sym)
    raise AttributeError(name)
