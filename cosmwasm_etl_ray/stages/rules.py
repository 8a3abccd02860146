"""Declarative rule registry — the engine's user-extension surface.

Graft of the reference's rule system: a ``Rule`` declares a typed
pattern over event attributes with per-item filters that are nil (any
value), an exact string, or a predicate
(/root/reference/pkg/eventlog/rule.go:9-64), matched by a finder
(/root/reference/pkg/eventlog/finder.go:36-116); matched events feed a
``Mapper`` (/root/reference/parser/parser.go:13-30). Adding a protocol
means registering rules + mappers, not editing the parse loop
(/root/reference/parser/dex/interface.go:21-25).

Here a rule's items are PER-COLUMN vectorized filters over Arrow
batches; a RuleSet classifies every row in one pass (first matching
rule wins — rule order is the reference's parser order), rows matching
no rule become quarantine rows, and a rule's optional mapper rewrites
its rows (the MatchedToParsedTx projection, M14). Filters compile once
per RuleSet construction — the stage stays a vectorized map_batches.

Filter forms (the nil / exact / func trichotomy):

    None               column present (non-null), any value
    "literal"          exact match
    ("in", [a, b])     membership
    ("re", pattern)    regex match (compiled by Arrow)
    callable           fn(pa.ChunkedArray) -> boolean mask (vectorized)

Per-version dispatch (schema evolution by offset, M5) composes with
``stages.versioned``: give each commit range its own RuleSet.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _compile_item(col: str, filt):
    """One item → fn(batch) -> boolean mask (null never matches)."""
    if filt is None:

        def any_value(t: pa.Table) -> pa.ChunkedArray:
            return pc.invert(pc.is_null(t[col], nan_is_null=True))

        return any_value
    if isinstance(filt, str):

        def exact(t: pa.Table) -> pa.ChunkedArray:
            return pc.fill_null(pc.equal(t[col], pa.scalar(filt)), False)

        return exact
    if isinstance(filt, tuple) and len(filt) == 2 and filt[0] == "in":
        values = pa.array(list(filt[1]))

        def member(t: pa.Table) -> pa.ChunkedArray:
            return pc.fill_null(pc.is_in(t[col], value_set=values), False)

        return member
    if isinstance(filt, tuple) and len(filt) == 2 and filt[0] == "re":
        pattern = filt[1]

        def regex(t: pa.Table) -> pa.ChunkedArray:
            return pc.fill_null(
                pc.match_substring_regex(
                    pc.coalesce(t[col], pa.scalar("")), pattern
                ),
                False,
            )

        return regex
    if callable(filt):

        def custom(t: pa.Table) -> pa.ChunkedArray:
            return filt(t[col])

        return custom
    raise TypeError(f"unsupported filter for column {col!r}: {filt!r}")


class Rule:
    """name + {column: filter} + optional mapper(pa.Table) -> pa.Table
    applied to this rule's rows (must preserve the event schema)."""

    def __init__(
        self,
        name: str,
        items: dict,
        mapper: Callable[[pa.Table], pa.Table] | None = None,
    ):
        self.name = name
        self.items = dict(items)
        self.mapper = mapper
        self._compiled = [_compile_item(c, f) for c, f in self.items.items()]

    def mask(self, batch: pa.Table) -> "pa.ChunkedArray":
        out = None
        for fn in self._compiled:
            m = fn(batch)
            out = m if out is None else pc.and_(out, m)
        if out is None:  # no items: matches everything
            # explicit bool type: pa.array([]) infers NULL type and
            # pc.invert/and_ have no null kernel (0-row batches crash)
            out = pa.chunked_array(
                [pa.array([True] * batch.num_rows, type=pa.bool_())]
            )
        return out


class RuleSet:
    """Ordered rules; first match wins. ``classify`` adds ``valid``
    (matched any rule) and ``rule_type`` columns in one vectorized
    pass; ``apply_mappers`` rewrites each rule's rows with its mapper
    (identity when none), preserving schema and order-free semantics
    (rows keep their commit — the LWW fold doesn't care about batch
    order)."""

    def __init__(self, rules: list[Rule]):
        names = [r.name for r in rules]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate rule names: {names}")
        self.rules = list(rules)

    def with_rule(self, rule: Rule, prepend: bool = False) -> "RuleSet":
        """Extension point: a NEW RuleSet with one more rule (the
        UpdateParsers analogue — registries are immutable values)."""
        return RuleSet([rule] + self.rules if prepend else self.rules + [rule])

    def classify(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # explicit bool type — see mask(): 0 rows would infer null
        assigned = pa.chunked_array([pa.array([False] * n, type=pa.bool_())])
        rule_type = pa.chunked_array([pa.array([""] * n, type=pa.string())])
        for rule in self.rules:
            m = pc.and_(rule.mask(batch), pc.invert(assigned))
            rule_type = pc.if_else(m, pa.scalar(rule.name), rule_type)
            assigned = pc.or_(assigned, m)
        batch = batch.append_column("valid", assigned.combine_chunks())
        return batch.append_column("rule_type", rule_type.combine_chunks())

    def apply_mappers(self, batch: pa.Table) -> pa.Table:
        """Rewrite rows per matching rule's mapper. Requires the
        ``rule_type`` column from classify. Rows are regrouped by rule
        (order across rules changes; per-key semantics don't — the
        fold orders by commit, not arrival)."""
        mappers = {r.name: r.mapper for r in self.rules if r.mapper is not None}
        if not mappers or "rule_type" not in batch.column_names:
            return batch
        parts = []
        untouched = pc.invert(
            pc.is_in(batch["rule_type"], value_set=pa.array(list(mappers)))
        )
        rest = batch.filter(untouched)
        if rest.num_rows:
            parts.append(rest)
        for name, mapper in mappers.items():
            rows = batch.filter(pc.equal(batch["rule_type"], pa.scalar(name)))
            if rows.num_rows:
                mapped = mapper(rows)
                if mapped.schema.names != batch.schema.names:
                    mapped = mapped.select(batch.schema.names)
                parts.append(mapped)
        if not parts:
            return batch.slice(0, 0)
        return pa.concat_tables(parts, promote_options="permissive")


def ruleset_batch_fn(rs: RuleSet):
    """RuleSet → a plain batch fn (classify → mappers → drop the
    transient column). Composes with ``stages.versioned``: give each
    commit-range era its own RuleSet —
    ``VersionedNormalizer([("", ruleset_batch_fn(v1_rules)),
    ("0005000000", ruleset_batch_fn(v2_rules))])`` is the reference's
    UpdateParsers-per-height / version-gated decode pattern
    (/root/reference/parser/dex/dezswap/app.go:143-207)."""

    def fn(t: pa.Table) -> pa.Table:
        t = rs.apply_mappers(rs.classify(t))
        return t.drop_columns(["rule_type"])

    return fn


def default_cdc_rules() -> RuleSet:
    """The engine's built-in protocol, expressed declaratively: one
    rule per op type, each requiring a decimal commit and non-null
    keys — exactly the previous hardcoded validity predicate, now an
    editable registry."""
    base = {
        "commit": ("re", r"^[0-9]+$"),
        "repo": None,
        "path": None,
    }
    return RuleSet(
        [
            Rule("insert", {**base, "op": "insert"}),
            Rule("update", {**base, "op": "update"}),
            Rule("delete", {**base, "op": "delete"}),
        ]
    )
