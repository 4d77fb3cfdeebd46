"""Property-based hardening of the DDL parser: column attributes in any
order and count must parse to the same structured op (the round-1 bug
class: a fixed-order attribute regex silently dropped legal ALTERs)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import IntegerType, StringType, TimestampType

from qin_cdc_spark.cdc.ddl_parse import parse_ddl

# attribute snippets that may follow a column type, in any order
_ATTRS = [
    "NOT NULL",
    "NULL",
    "DEFAULT 0",
    "DEFAULT 'x y'",
    'DEFAULT "z"',
    "DEFAULT CURRENT_TIMESTAMP",
    "ON UPDATE CURRENT_TIMESTAMP",
    "AUTO_INCREMENT",
    "COMMENT 'why, indeed'",
    "UNSIGNED",
    "COLLATE utf8mb4_bin",
    "UNIQUE KEY",
]

_TYPES = [
    ("int", IntegerType),
    ("varchar(32)", StringType),
    ("datetime(6)", TimestampType),
]


@settings(max_examples=50, deadline=None)
@given(
    dtype=st.sampled_from(_TYPES),
    attrs=st.lists(st.sampled_from(_ATTRS), max_size=4, unique=True),
    use_after=st.booleans(),
)
def test_add_column_parses_under_any_attribute_order(dtype, attrs, use_after):
    raw_type, spark_type = dtype
    spec = f"ADD COLUMN c1 {raw_type} {' '.join(attrs)}"
    if use_after:
        spec += " AFTER id"
    [p] = parse_ddl(f"ALTER TABLE t {spec}", "db")
    [op] = p.ops
    assert op.action == "add-column" and op.column == "c1"
    assert isinstance(op.dtype, spark_type)
    assert op.position == ("after:id" if use_after else None)


@settings(max_examples=30, deadline=None)
@given(
    attrs=st.lists(st.sampled_from(_ATTRS), max_size=3, unique=True),
    col=st.sampled_from(["a", "`weird col`", "B2"]),
)
def test_modify_column_parses_under_any_attribute_order(attrs, col):
    [p] = parse_ddl(
        f"ALTER TABLE t MODIFY {col} varchar(10) {' '.join(attrs)}", "db"
    )
    [op] = p.ops
    assert op.action == "modify-column"
    assert op.column == col.strip("`")
    assert isinstance(op.dtype, StringType)


# -- rename planner properties (round 10: streaming/rename_plan.py) ----


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_plan_renames_matches_sequential_semantics(data):
    """For ANY legal sequential rename chain over a column set
    (including chains that free-and-reuse names, and full CYCLES —
    column swaps), the route's chain-collapse produces a net mapping
    whose SIMULTANEOUS application (the planner's contract) lands on
    exactly the state the true sequential chain produces.  Replay of
    an ACYCLIC mapping against the post-state is a no-op; identity
    entries never surface."""
    from qin_cdc_spark.streaming.rename_plan import plan_renames

    pool = [f"c{i}" for i in range(6)]
    cols = set(
        data.draw(st.lists(st.sampled_from(pool), min_size=1, max_size=5,
                           unique=True))
    )
    # build a legal sequential chain: each step renames a live column
    # to a name not currently live (or itself — a retype no-op)
    n_steps = data.draw(st.integers(min_value=0, max_value=4))
    state = set(cols)
    mapping: dict = {}
    for _ in range(n_steps):
        old = data.draw(st.sampled_from(sorted(state)))
        free = sorted((set(pool) - state) | {old})
        new = data.draw(st.sampled_from(free))
        # fold the way apply_ddl_statements does: identity ops are
        # skipped, multi-hop chains collapse into the origin's slot
        if new != old:
            src = next((k for k, t in mapping.items() if t == old), None)
            if src is not None:
                mapping[src] = new
            else:
                mapping[old] = new
            state.discard(old)
            state.add(new)
    mapping = {o: n for o, n in mapping.items() if o != n}

    applied = plan_renames(cols, mapping)
    got = (set(cols) - set(applied)) | set(applied.values())
    assert got == state  # simultaneous net == exact sequential chain
    assert all(o != n for o, n in applied.items())
    # replay detection is only promised for ACYCLIC mappings (a swap's
    # replay is fenced by stmt-id markers at the store layer instead)
    def _has_cycle(m):
        for start in m:
            seen = {start}
            cur = m[start]
            while cur in m:
                if cur in seen:
                    return True
                seen.add(cur)
                cur = m[cur]
        return False

    if not _has_cycle(mapping):
        assert plan_renames(state, mapping) == {}
