"""Raw MySQL DDL parsing (reference A11: metas/mysql_ddl_parse.go
TableDdlParser) and end-to-end registry application."""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from qin_cdc_spark.cdc.ddl_parse import apply_raw_ddl, mysql_type_to_spark, parse_ddl
from qin_cdc_spark.cdc.registry import SchemaRegistry


def _registry_with_orders() -> SchemaRegistry:
    reg = SchemaRegistry()
    reg.add(
        "shop",
        "orders",
        StructType(
            [
                StructField("id", LongType(), False),
                StructField("status", StringType(), True),
                StructField("price", DecimalType(10, 2), True),
            ]
        ),
    )
    return reg


def test_type_mapping_matches_reference_enum():
    # metas/mysql_ddl_parse.go:29-60 / SURVEY §1.2
    assert isinstance(mysql_type_to_spark("tinyint(1)"), ShortType)
    assert isinstance(mysql_type_to_spark("int unsigned"), IntegerType)
    assert isinstance(mysql_type_to_spark("bigint(20)"), LongType)
    assert mysql_type_to_spark("decimal(12,3)") == DecimalType(12, 3)
    assert isinstance(mysql_type_to_spark("datetime(6)"), TimestampType)
    assert isinstance(mysql_type_to_spark("date"), DateType)
    assert isinstance(mysql_type_to_spark("varchar(255)"), StringType)
    assert isinstance(mysql_type_to_spark("enum('a','b')"), StringType)
    assert isinstance(mysql_type_to_spark("json"), StringType)


def test_alter_add_with_position_and_backticks():
    [p] = parse_ddl(
        "ALTER TABLE `shop`.`orders` ADD COLUMN `note` varchar(64) AFTER `status`",
        "ignored",
    )
    assert (p.db, p.table) == ("shop", "orders")
    [op] = p.ops
    assert op.action == "add-column" and op.column == "note"
    assert op.position == "after:status"


def test_alter_multi_spec_and_registry_apply():
    reg = _registry_with_orders()
    apply_raw_ddl(
        reg,
        "ALTER TABLE orders ADD discount decimal(5,2) FIRST, "
        "DROP COLUMN status, "
        "CHANGE price total_price decimal(12,2)",
        "shop",
    )
    cur = reg.get("shop", "orders")
    assert cur.fieldNames() == ["discount", "id", "total_price"]
    assert cur["total_price"].dataType == DecimalType(12, 2)
    # CHANGE decomposed into modify+rename ⇒ two version bumps + add/drop
    assert reg.current_version("shop", "orders") == 5


def test_rename_table_statement_and_alter_rename():
    reg = _registry_with_orders()
    apply_raw_ddl(reg, "RENAME TABLE orders TO orders_v2", "shop")
    assert reg.get("shop", "orders_v2").fieldNames() == ["id", "status", "price"]
    apply_raw_ddl(reg, "ALTER TABLE orders_v2 RENAME TO orders_v3", "shop")
    assert reg.get("shop", "orders_v3").fieldNames() == ["id", "status", "price"]


def test_create_table_parses_columns_skips_keys():
    [p] = parse_ddl(
        """CREATE TABLE IF NOT EXISTS shop.items (
             id bigint NOT NULL AUTO_INCREMENT,
             name varchar(100) NOT NULL DEFAULT 'x',
             qty int,
             created datetime DEFAULT CURRENT_TIMESTAMP,
             PRIMARY KEY (id),
             KEY idx_name (name)
           ) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4""",
        "shop",
    )
    [op] = p.ops
    assert op.action == "create-table"
    assert op.schema.fieldNames() == ["id", "name", "qty", "created"]
    assert not op.schema["id"].nullable and op.schema["qty"].nullable
    assert isinstance(op.schema["created"].dataType, TimestampType)


def test_create_table_like_copies_schema():
    reg = _registry_with_orders()
    apply_raw_ddl(reg, "CREATE TABLE orders_copy LIKE orders", "shop")
    assert reg.get("shop", "orders_copy") == reg.get("shop", "orders")


def test_drop_truncate_and_multi_statement():
    reg = _registry_with_orders()
    touched = apply_raw_ddl(
        reg, "TRUNCATE TABLE orders; DROP TABLE IF EXISTS orders", "shop"
    )
    assert touched == [("shop", "orders"), ("shop", "orders")]
    assert ("shop", "orders") not in reg._tables


def test_online_ddl_shadow_tracked_and_cutover_lands_schema():
    """The reference applies DDL to online-DDL shadow tables
    (isSyncTable || isOnlineDdlTable, mysql_replication.go:187-226): a
    gh-ost run ALTERs `_t_gho` and the cutover RENAME must land the
    evolved schema under the real name, continuing its version history."""
    reg = _registry_with_orders()
    v_before = reg.current_version("shop", "orders")
    # gh-ost: create shadow like real, alter the shadow
    apply_raw_ddl(reg, "CREATE TABLE _orders_gho LIKE orders", "shop")
    apply_raw_ddl(reg, "ALTER TABLE _orders_gho ADD x int", "shop")
    assert reg.get("shop", "_orders_gho").fieldNames() == ["id", "status", "price", "x"]
    # real table untouched so far
    assert reg.get("shop", "orders").fieldNames() == ["id", "status", "price"]
    # cutover: the evolved shadow becomes the real table, version bumped
    apply_raw_ddl(
        reg, "RENAME TABLE orders TO _orders_del, _orders_gho TO orders", "shop"
    )
    assert reg.get("shop", "orders").fieldNames() == ["id", "status", "price", "x"]
    assert reg.current_version("shop", "orders") == v_before + 1
    # in-flight DML stamped with the pre-cutover version still decodes
    assert reg.get_version("shop", "orders", v_before).fieldNames() == [
        "id",
        "status",
        "price",
    ]


def test_ddl_for_untracked_table_is_noop():
    reg = _registry_with_orders()
    from qin_cdc_spark.cdc.registry import DdlOp

    assert reg.apply_ddl("shop", "never_seen", DdlOp("add-column")) is None
    assert reg.apply_ddl("shop", "_other_gho", DdlOp("drop-table")) is None


def test_alter_attributes_any_order_and_on_update():
    """Round-1 gap: legal attribute orders that the fixed-order regex
    silently dropped must parse (ADVICE r1)."""
    [p] = parse_ddl(
        "ALTER TABLE orders ADD COLUMN c int DEFAULT 0 NOT NULL, "
        'ADD d varchar(10) DEFAULT "x" COMMENT "why", '
        "ADD ts datetime DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP AFTER id",
        "shop",
    )
    assert [op.column for op in p.ops] == ["c", "d", "ts"]
    assert p.ops[2].position == "after:id"
    assert isinstance(p.ops[2].dtype, TimestampType)


def test_alter_parenthesized_multi_add():
    [p] = parse_ddl("ALTER TABLE orders ADD COLUMN (a int, b varchar(5) NOT NULL)", "shop")
    assert [(op.action, op.column) for op in p.ops] == [
        ("add-column", "a"),
        ("add-column", "b"),
    ]
    assert isinstance(p.ops[0].dtype, IntegerType)


def test_unparseable_column_spec_raises():
    """A column-changing spec the parser cannot understand must fail
    loudly (the reference hard-fails, mysql_replication.go:140) — a
    silent drop diverges the registry from the stream."""
    import pytest

    with pytest.raises(ValueError, match="unparseable column-changing"):
        parse_ddl("ALTER TABLE orders ADD COLUMN weird ??bogus??", "shop")
    # schema-neutral churn still parses to zero ops
    [p] = parse_ddl(
        "ALTER TABLE orders ADD PARTITION (PARTITION p1 VALUES LESS THAN (10)), "
        "DROP CHECK c1, ALGORITHM=INPLACE, LOCK=NONE",
        "shop",
    )
    assert p.ops == []


def test_schema_neutral_specs_ignored():
    [p] = parse_ddl("ALTER TABLE orders ADD INDEX idx_s (status), ADD flag tinyint", "shop")
    assert len(p.ops) == 1 and p.ops[0].column == "flag"


def test_handle_ddl_rows_in_envelope_batch(spark):
    """op='ddl' envelope rows mutate the registry in seq order and are
    filtered from the DML flow (reference handleDDLEvent contract)."""
    from qin_cdc_spark.streaming.cdc_stream import handle_ddl_rows

    reg = _registry_with_orders()
    batch = spark.createDataFrame(
        [
            ("shop", "orders", "insert", 1, '{"id": 1}'),
            ("shop", "orders", "ddl", 2, "ALTER TABLE orders ADD note varchar(20)"),
            ("shop", "orders", "insert", 3, '{"id": 2}'),
            ("shop", "orders", "ddl", 4, "ALTER TABLE orders DROP COLUMN note"),
        ],
        "db string, table string, op string, seq long, data string",
    )
    out = handle_ddl_rows(batch, reg)
    assert sorted(r.seq for r in out.collect()) == [1, 3]
    # both DDLs applied, in order: add bumped to v2, drop to v3
    assert reg.current_version("shop", "orders") == 3
    assert reg.get("shop", "orders").fieldNames() == ["id", "status", "price"]
    assert reg.get_version("shop", "orders", 2).fieldNames() == [
        "id",
        "status",
        "price",
        "note",
    ]


def test_render_alter_ops_round_trips_through_parser():
    """The canonical re-render (verbatim forwarding's statement form)
    parses back to the same ops — renames preserved, CHANGE kept as
    rename+retype, positions dropped by design."""
    from qin_cdc_spark.cdc.ddl_parse import parse_ddl
    from qin_cdc_spark.sinks.kafka import render_alter_ops, requalify_alter

    src = (
        "ALTER TABLE `db`.`t` ADD COLUMN `c` bigint AFTER `a`, "
        "RENAME COLUMN `a` TO `b`, CHANGE COLUMN `x` `y` varchar(20), "
        "MODIFY COLUMN `m` double, DROP COLUMN `gone`"
    )
    [parsed] = parse_ddl(src, "db")
    rendered = render_alter_ops("db", "t", parsed.ops)
    assert rendered == (
        "ALTER TABLE `db`.`t` ADD COLUMN `c` bigint, "
        "RENAME COLUMN `a` TO `b`, CHANGE COLUMN `x` `y` varchar(255), "
        "MODIFY COLUMN `m` double, DROP COLUMN `gone`"
    )
    [back] = parse_ddl(rendered, "db")
    assert [(o.action, o.column, o.new_name) for o in back.ops] == [
        ("add-column", "c", None),
        ("rename-column", "a", "b"),
        ("change-column", "x", "y"),
        ("modify-column", "m", None),
        ("drop-column", "gone", None),
    ]
    # table-level ops render nothing (registry concerns, not columns)
    [tbl] = parse_ddl("ALTER TABLE t RENAME TO t2", "db")
    assert render_alter_ops("db", "t", tbl.ops) is None
    # re-qualification swaps only the table prefix
    assert requalify_alter(rendered, "dw", "ods_t").startswith(
        "ALTER TABLE `dw`.`ods_t` ADD COLUMN `c` bigint"
    )


def test_evolve_simple_cols_tolerant_idempotent():
    """The egress residual-diff evolver: tolerant application over
    [[name, simpleString]] pairs — re-applying is a no-op, other
    tables' statements are ignored, CHANGE decomposes."""
    from qin_cdc_spark.cdc.ddl_parse import evolve_simple_cols

    cols = [["k", "bigint"], ["a", "string"]]
    sql = (
        "ALTER TABLE `db`.`t` RENAME COLUMN `a` TO `b`, "
        "ADD COLUMN `c` int, MODIFY COLUMN `k` bigint"
    )
    once = evolve_simple_cols(cols, sql, "db", "t")
    assert once == [["k", "bigint"], ["b", "string"], ["c", "int"]]
    # idempotent: the rename's old name is gone, the add is present
    assert evolve_simple_cols(once, sql, "db", "t") == once
    # a statement for ANOTHER table changes nothing
    assert evolve_simple_cols(cols, sql, "db", "other") == cols
    # CHANGE = retype + rename; DROP removes; multi-statement applies
    out = evolve_simple_cols(
        cols,
        "ALTER TABLE `db`.`t` CHANGE COLUMN `a` `z` double; "
        "ALTER TABLE `db`.`t` DROP COLUMN `k`",
        "db",
        "t",
    )
    assert out == [["z", "double"]]
