"""Per-route row transforms — the reference's transform chain, Spark-first.

Reference parity (SURVEY §2.A A14-A17):
- transform chain with drop semantics: transforms/transforms.go:63-83
- rename-column: transforms/trans_rename_column.go:20-74
- delete-column: transforms/trans_delete_column.go:19-47
- match predicate (exact schema+table): trans_rename_column.go:63

The reference mutates a per-row ``map[string]any``; we express each
transform as a pure DataFrame→DataFrame function on the decoded, typed
route stream.  Catalyst collapses the whole chain into the scan
projection — a rename/drop costs nothing at any scale.  A transform
returning fewer rows (``filter``) reproduces the chain's drop semantics
(a transform returning ``true`` drops the message).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame


Transform = Callable[[DataFrame], DataFrame]


@dataclass(frozen=True)
class RenameColumnTransform:
    """rename-column: map source column names to new names, in order.

    Also rewrites the route's downstream column list, mirroring the
    reference's config-time router rewrite (transforms/transforms.go:22-32).
    """

    match_schema: str
    match_table: str
    columns: tuple[str, ...]
    rename_as: tuple[str, ...]

    def __post_init__(self):
        if len(self.columns) != len(self.rename_as):
            raise ValueError("rename-column: columns and rename-as must align")

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.withColumnsRenamed(dict(zip(self.columns, self.rename_as)))


@dataclass(frozen=True)
class DeleteColumnTransform:
    """delete-column: drop columns from the row image."""

    match_schema: str
    match_table: str
    columns: tuple[str, ...]

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.drop(*self.columns)


@dataclass(frozen=True)
class FilterRowsTransform:
    """Row filter (SQL predicate) — generalization of the chain's drop
    semantics (a transform may drop messages, transforms/transforms.go:75-79).
    """

    match_schema: str
    match_table: str
    predicate: str  # SQL expression over the typed row, e.g. "o_totalprice > 0"

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.filter(self.predicate)


@dataclass
class TransformChain:
    """Ordered transforms gated on (schema, table) — A14.

    ``apply(db, table, df)`` runs only the transforms whose match
    predicate hits, in declaration order (the reference iterates its
    configured list in order, transforms/transforms.go:63-71).
    """

    transforms: list = field(default_factory=list)

    def apply(self, db: str, table: str, df: DataFrame) -> DataFrame:
        for t in self.transforms:
            if t.match_schema == db and t.match_table == table:
                df = t(df)
        return df


TRANSFORM_TYPES = {
    "rename-column": lambda cfg: RenameColumnTransform(
        match_schema=cfg["match-schema"],
        match_table=cfg["match-table"],
        columns=tuple(cfg["columns"]),
        rename_as=tuple(cfg["rename-as"]),
    ),
    "delete-column": lambda cfg: DeleteColumnTransform(
        match_schema=cfg["match-schema"],
        match_table=cfg["match-table"],
        columns=tuple(cfg["columns"]),
    ),
    "filter-rows": lambda cfg: FilterRowsTransform(
        match_schema=cfg["match-schema"],
        match_table=cfg["match-table"],
        predicate=cfg["predicate"],
    ),
}


def build_transform(type_: str, cfg: dict) -> Transform:
    try:
        factory = TRANSFORM_TYPES[type_]
    except KeyError:
        raise ValueError(f"unknown transform type {type_!r}") from None
    return factory(cfg)
