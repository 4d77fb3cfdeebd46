"""TOML pipeline config — accepts the reference's exact config schema.

Reference parity: config/config.go:10-31, config/plugin_config.go:3-48,
sample configs docs/*.toml and README.md:37-99.  Sections:

- ``name``                          pipeline name (unique)
- ``[input]``   type + config       source plugin (mysql in reference)
- ``[[transforms]]`` type + config  ordered transform chain (A14-A16)
- ``[output]``  type + config       sink plugin + ``[[…routers]]`` with
                                     optional ``columns-mapper`` (A18/A19)

Notes kept from the survey: ``parallel-workers`` appears in the
reference's samples but is never read by its code (BASELINE.md) — we
accept and ignore it the same way.  Column mapping preserves declared
order (the reference's ``MapMapperOrder`` fix for Go map-iteration
nondeterminism, core/meta.go:80-103 / SURVEY §4.3.1).
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field

from qin_cdc_spark.operators.transforms import TransformChain, build_transform


@dataclass(frozen=True)
class Router:
    """source schema.table → target schema.table (+ ordered column map).

    Reference: metas/routers.go:10-25; mapping built in core/meta.go:38-104
    (same-name auto-map when source-columns is empty).
    """

    source_schema: str
    source_table: str
    target_schema: str
    target_table: str
    source_columns: tuple[str, ...] = ()
    target_columns: tuple[str, ...] = ()
    # engine extensions to the reference's router schema (which has no
    # target layout concept — the warehouse owns it there):
    # partition-col makes the target a PartitionedVersionedTable
    # (immutable-column partitioning, partition-grain retention);
    # partition-keep-latest = N applies drop-all-but-newest-N after
    # every batch; history = true maintains an SCD Type-2 history table
    # beside the target (streaming/scd2.py).
    partition_col: str | None = None
    partition_keep_latest: int | None = None
    history: bool = False
    # egress-format = "default" | "canal": after every batch lands, the
    # target's change feed re-emits as reference wire-format messages
    # (the relay loop, in-stream; see CdcStreamRoute.emit_egress).
    # Forces the target to be versioned (the CDF is the source).
    egress_format: str | None = None
    # tombstone-gc-lag = N: after every batch, drop delete tombstones
    # below max(applied seq) - N (the reference's position-lag GC
    # window in seq units; see CdcStreamRoute).
    tombstone_gc_lag: int | None = None
    # history-expire-lag = N: after every batch, expire SCD2 history
    # versions that closed below max(applied seq) - N (in-stream
    # retention for the history store; requires history = true).
    history_expire_lag: int | None = None

    @property
    def key(self) -> str:
        # GenerateMapRouterKey analog (metas/routers.go:70-75)
        return f"{self.source_schema}:{self.source_table}"

    def column_mapping(self, available: list[str]) -> list[tuple[str, str]]:
        """Ordered (source, target) pairs; empty config = identity map
        over the available columns (core/meta.go:43-55)."""
        if not self.source_columns:
            return [(c, c) for c in available]
        return list(zip(self.source_columns, self.target_columns))


@dataclass(frozen=True)
class MviewSpec:
    """One ``[[materialized-views]]`` block — an ENGINE EXTENSION to the
    reference's config schema (the reference leaves derived views to
    the downstream warehouse): a derived view declared against a
    routed table, maintained in-stream from that target's change data
    feed (streaming/mviews.py)."""

    name: str
    mv_type: str
    source_schema: str
    source_table: str
    config: dict = field(default_factory=dict)


@dataclass
class PipelineConfig:
    name: str
    input_type: str
    input_config: dict
    output_type: str
    output_config: dict
    transforms: TransformChain
    routers: list[Router] = field(default_factory=list)
    mviews: list[MviewSpec] = field(default_factory=list)
    # [coordinator] (engine extension): cross-table consistent snapshots
    # over every route — the reference tracks ONE global position for
    # all sinks (inputs/mysql/mysql_position.go:37-54) but its targets
    # are only mutually consistent at quiescence; declaring the section
    # makes every route versioned and records batch → {table: version}
    # coordinates in-stream.  Keys: path (default
    # <target_root>/_coordinator), retain-batches (0 = keep all),
    # gc-every (default 1).
    coordinator: dict | None = None

    def router_for(self, db: str, table: str) -> Router | None:
        for r in self.routers:
            if r.source_schema == db and r.source_table == table:
                return r
        return None


def parse_config(text: str) -> PipelineConfig:
    raw = tomllib.loads(text)
    name = raw.get("name", "")
    inp = raw.get("input", {})
    out = raw.get("output", {})

    chain = TransformChain(
        [build_transform(t["type"], t.get("config", {})) for t in raw.get("transforms", [])]
    )

    routers = []
    for r in out.get("config", {}).get("routers", []):
        mapper = r.get("columns-mapper", {})
        src_cols = tuple(mapper.get("source-columns", []) or [])
        tgt_cols = tuple(mapper.get("target-columns", []) or [])
        if len(src_cols) != len(tgt_cols):
            raise ValueError(
                f"router {r.get('source-table')}: columns-mapper source/target length mismatch"
            )
        routers.append(
            Router(
                source_schema=r["source-schema"],
                source_table=r["source-table"],
                target_schema=r.get("target-schema", r["source-schema"]),
                target_table=r.get("target-table", r["source-table"]),
                source_columns=src_cols,
                target_columns=tgt_cols,
                partition_col=r.get("partition-col"),
                partition_keep_latest=(
                    int(r["partition-keep-latest"])
                    if "partition-keep-latest" in r
                    else None
                ),
                history=bool(r.get("history", False)),
                egress_format=r.get("egress-format"),
                tombstone_gc_lag=(
                    int(r["tombstone-gc-lag"])
                    if "tombstone-gc-lag" in r
                    else None
                ),
                history_expire_lag=(
                    int(r["history-expire-lag"])
                    if "history-expire-lag" in r
                    else None
                ),
            )
        )

    mviews = []
    for m in raw.get("materialized-views", []):
        mviews.append(
            MviewSpec(
                name=m["name"],
                mv_type=m["type"],
                source_schema=m["source-schema"],
                source_table=m["source-table"],
                config=m.get("config", {}),
            )
        )

    return PipelineConfig(
        name=name,
        input_type=inp.get("type", ""),
        input_config=inp.get("config", {}),
        output_type=out.get("type", ""),
        output_config=out.get("config", {}),
        transforms=chain,
        routers=routers,
        mviews=mviews,
        coordinator=raw.get("coordinator"),
    )


def load_config(path: str) -> PipelineConfig:
    with open(path, "rb") as f:
        return parse_config(f.read().decode("utf-8"))
