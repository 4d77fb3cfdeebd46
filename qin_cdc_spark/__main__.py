"""CLI entry point — the reference's process surface (A37) on Spark.

Reference parity: cmd/qin_cdc.go:13-51 flags (-config, -level, -daemon,
-version; utils/help.go:19-34).  ``--daemon`` is accepted and ignored
(daemonization belongs to the cluster scheduler under spark-submit);
``--level`` maps to the Spark log level.  What the reference gets from
a live MySQL (`show create table`, A8) this CLI gets from sample
parquet files: ``--schema db.table=path`` infers the source StructType,
``--primary-key db.table=col[,col]`` binds MERGE keys.

Usage:
  python -m qin_cdc_spark --config pipe.toml \
      --schema src.orders=/data/samples/orders.parquet \
      --primary-key src.orders=o_orderkey \
      --envelope-dir /data/cdc_envelope --target-root /data/targets \
      --checkpoint-dir /data/ckpt [--mode stream|batch] [--await-seconds N]
"""

from __future__ import annotations

import argparse
import sys

VERSION = "0.1.0"


def _parse_binding(values: list[str]) -> dict[tuple[str, str], str]:
    out: dict[tuple[str, str], str] = {}
    for v in values:
        key, _, val = v.partition("=")
        db, _, table = key.partition(".")
        if not (db and table and val):
            raise SystemExit(f"bad binding {v!r}; expected db.table=value")
        out[(db, table)] = val
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="qin_cdc_spark")
    ap.add_argument("--config", help="pipeline TOML (reference schema)")
    ap.add_argument("--level", default="WARN", help="log level (reference -level)")
    ap.add_argument("--daemon", action="store_true",
                    help="accepted for parity; daemonization is the scheduler's job")
    ap.add_argument("--version", action="store_true")
    ap.add_argument("--schema", action="append", default=[],
                    metavar="db.table=parquet", help="infer source schema from parquet")
    ap.add_argument("--primary-key", action="append", default=[],
                    metavar="db.table=col[,col]")
    ap.add_argument("--envelope-dir",
                    help="CDC envelope source directory (file stand-in source; "
                         "optional when the config's [input] type = kafka)")
    ap.add_argument("--target-root", help="managed target table root")
    ap.add_argument("--checkpoint-dir", help="stream checkpoint location")
    ap.add_argument("--mode", choices=["stream", "batch"], default="stream")
    ap.add_argument("--await-seconds", type=int, default=0,
                    help="0 = run until terminated")
    ap.add_argument("--fsck", metavar="PATH",
                    help="integrity-check the store at PATH (auto-detects the "
                         "versioned/partitioned layout) and exit nonzero on errors; "
                         "driver-side manifest walk, no Spark session")
    ap.add_argument("--fsck-deep", action="store_true",
                    help="with --fsck: also open every referenced parquet footer")
    args = ap.parse_args(argv)

    if args.version:
        print(f"qin_cdc_spark {VERSION}")
        return 0
    if args.fsck:
        import json as _json

        from qin_cdc_spark.streaming.fsck import fsck_path, ok

        rep = fsck_path(args.fsck, deep=args.fsck_deep)
        print(_json.dumps(rep, indent=1))
        return 0 if ok(rep) else 1
    for req in ("config", "target_root"):
        if not getattr(args, req):
            ap.error(f"--{req.replace('_', '-')} is required (unless --version)")
    if args.mode == "stream" and not args.checkpoint_dir:
        ap.error("--checkpoint-dir is required in stream mode")
    if args.mode == "batch" and not args.envelope_dir:
        ap.error("--envelope-dir is required in batch mode")

    from qin_cdc_spark.plans.pipeline import compile_pipeline, envelope_source_from_config
    from qin_cdc_spark.session import get_spark

    spark = get_spark("qin_cdc_spark_cli")
    spark.sparkContext.setLogLevel(args.level.upper())

    schemas = {
        key: spark.read.parquet(path).schema
        for key, path in _parse_binding(args.schema).items()
    }
    primary_keys = {
        key: cols.split(",") for key, cols in _parse_binding(args.primary_key).items()
    }
    pipe = compile_pipeline(
        spark,
        args.config,
        schemas=schemas,
        primary_keys=primary_keys,
        target_root=args.target_root,
    )
    if args.mode == "batch":
        from qin_cdc_spark.cdc.envelope import ENVELOPE_SCHEMA

        pipe.run_batch(spark.read.schema(ENVELOPE_SCHEMA).parquet(args.envelope_dir))
        return 0
    # stream mode: the [input] section picks the transport (kafka →
    # Debezium/Canal decode; anything else → the file envelope stand-in,
    # overridable with --envelope-dir)
    source = envelope_source_from_config(
        spark, pipe.config, envelope_dir=args.envelope_dir, batch_size=pipe.batch_size()
    )
    q = pipe.run_stream(source, checkpoint_dir=args.checkpoint_dir)
    q.awaitTermination(args.await_seconds or None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
