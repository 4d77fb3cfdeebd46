"""Store integrity checker (fsck) — the operational audit for every
manifest-backed store in the engine.

The reference ships a relay with no owned storage to audit; this
engine OWNS state (versioned targets, partitioned facts, MV state,
GSI/CC/BM25/near-dup indexes — all `VersionedBucketedTable` layouts or
compositions of it), and state that can be owned can be corrupted by
operators: a manifest hand-edited, a data dir lost to a partial
restore, a sub-version reclaimed by a sub-level gc while a parent
still references it.  ``fsck_path`` walks a store the way the engine
reads it — manifests first, parquet footers second — and returns a
structured report instead of letting the damage surface as a read-time
stack trace three consumers downstream.

Everything is DRIVER-SIDE manifest/footer walking (zero Spark jobs,
the ``history()`` discipline), so it is safe to run from monitoring at
any frequency and at any table size: cost is O(versions × buckets)
manifest entries + one footer stat per referenced file with
``deep=True``, never a data scan.

Checks (V = versioned store, P = partitioned parent):

* V/P: meta parses; ``current`` is a retained version; version keys
  are ints; ``last_batch_id`` ≥ −1.
* V: every retained manifest's bucket dirs EXIST; bucket ids are
  integers in [0, n_buckets); orphan ``d-*`` dirs reported as a
  warning (legitimate crash residue — the next publish GC's them).
* V deep: every referenced parquet file's footer opens (pyarrow), and
  every file carries the engine columns ``_seq``/``_deleted``.
* P: every partition entry's generation dir exists and is a valid
  versioned store; the referenced sub-version IS retained there (the
  `history(partial=)` inconsistency, caught structurally); partition
  names are path-safe; orphan generation dirs reported as warnings.
* Consumer progress (``fsck_consumer``): a CDF consumer's applied
  version must not be AHEAD of its source's current version (a
  restored-from-backup source with a non-restored consumer — the
  operational mistake that silently freezes refreshes).
* Egress dirs (``fsck_egress_dir``): publications tile [0, hwm] under
  the coverage rule; gaps are errors (lost wire messages), stage
  residue and compaction-subsumed dirs are warnings.
* Coordinator manifests (``fsck_coordinator_path``): coordinates
  parse, per-table versions are monotone across batches, and every
  stamped egress boundary is still wire-reconstructible when the
  publication dirs are supplied.
"""

from __future__ import annotations

import json
import os
import re

from qin_cdc_spark.streaming.partitioned import PART_META_NAME
from qin_cdc_spark.streaming.versioned import META_NAME

_SAFE_PART = re.compile(r"^[A-Za-z0-9_.\-]+$")


def _report(path: str, kind: str) -> dict:
    return {"path": path, "kind": kind, "errors": [], "warnings": []}


def _load_json(path: str, rep: dict) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError) as e:
        rep["errors"].append(f"meta unreadable: {e}")
        return None


def _check_meta_shape(meta: dict, rep: dict) -> bool:
    for k in ("current", "last_batch_id", "versions"):
        if k not in meta:
            rep["errors"].append(f"meta missing key {k!r}")
            return False
    if not isinstance(meta["versions"], dict):
        rep["errors"].append("meta['versions'] is not a mapping")
        return False
    bad = [v for v in meta["versions"] if not str(v).lstrip("-").isdigit()]
    if bad:
        rep["errors"].append(f"non-integer version keys: {bad[:5]}")
    if meta["versions"] and str(meta["current"]) not in meta["versions"]:
        rep["errors"].append(
            f"current version {meta['current']} not retained "
            f"(have {sorted(int(v) for v in meta['versions'])})"
        )
    if meta["versions"]:
        mx = max(int(v) for v in meta["versions"])
        if int(meta["current"]) < mx:
            rep["errors"].append(
                f"current {meta['current']} behind max retained version {mx}"
            )
    if not isinstance(meta["last_batch_id"], int) or meta["last_batch_id"] < -1:
        rep["errors"].append(f"bad last_batch_id: {meta['last_batch_id']!r}")
    return True


def _footer_check(data_dir: str, rep: dict) -> None:
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover — baked into this environment
        rep["warnings"].append("pyarrow unavailable: footer checks skipped")
        return
    for f in sorted(os.listdir(data_dir)):
        if not f.endswith(".parquet"):
            continue
        fp = os.path.join(data_dir, f)
        try:
            schema = pq.ParquetFile(fp).schema_arrow
        except Exception as e:  # noqa: BLE001 — any footer damage is the finding
            rep["errors"].append(f"unreadable parquet footer: {fp}: {e}")
            continue
        missing = {"_seq", "_deleted"} - set(schema.names)
        if missing:
            rep["errors"].append(
                f"{fp}: missing engine columns {sorted(missing)}"
            )


def fsck_versioned_path(path: str, *, deep: bool = False) -> dict:
    """fsck one `VersionedBucketedTable` directory."""
    rep = _report(path, "versioned")
    meta_path = os.path.join(path, META_NAME)
    if not os.path.exists(meta_path):
        rep["errors"].append(f"no {META_NAME} at {path}")
        return rep
    meta = _load_json(meta_path, rep)
    if meta is None or not _check_meta_shape(meta, rep):
        return rep
    live_dirs: set[str] = set()
    for v, man in meta["versions"].items():
        buckets = man.get("buckets")
        if not isinstance(buckets, dict):
            rep["errors"].append(f"version {v}: manifest missing 'buckets'")
            continue
        nb = man.get("n_buckets")
        for b, d in buckets.items():
            live_dirs.add(d)
            if not str(b).isdigit() or (
                isinstance(nb, int) and not (0 <= int(b) < nb)
            ):
                rep["errors"].append(
                    f"version {v}: bucket id {b!r} outside [0, {nb})"
                )
            dd = os.path.join(path, d)
            if not os.path.isdir(dd):
                rep["errors"].append(f"version {v}: data dir missing: {d}")
            elif deep:
                _footer_check(dd, rep)
    for d in sorted(os.listdir(path)):
        if d.startswith("d-") and d not in live_dirs:
            rep["warnings"].append(
                f"orphan data dir {d} (crash residue; next publish GCs it)"
            )
    return rep


def fsck_partitioned_path(path: str, *, deep: bool = False) -> dict:
    """fsck one `PartitionedVersionedTable` parent + all referenced
    sub-stores (each sub-report nests under 'partitions')."""
    rep = _report(path, "partitioned")
    meta_path = os.path.join(path, PART_META_NAME)
    if not os.path.exists(meta_path):
        rep["errors"].append(f"no {PART_META_NAME} at {path}")
        return rep
    meta = _load_json(meta_path, rep)
    if meta is None or not _check_meta_shape(meta, rep):
        return rep
    rep["partitions"] = {}
    referenced: set[tuple[str, str]] = set()
    for v, man in meta["versions"].items():
        if not isinstance(man, dict):
            rep["errors"].append(f"version {v}: manifest is not a mapping")
            continue
        for pstr, ent in man.items():
            if not _SAFE_PART.match(pstr):
                rep["errors"].append(f"version {v}: unsafe partition name {pstr!r}")
                continue
            # hand-edited manifests are exactly what fsck exists to
            # audit: a non-dict entry or one missing gen/v must become
            # an error REPORT, never a traceback out of the walk
            if not isinstance(ent, dict):
                rep["errors"].append(
                    f"version {v}: partition {pstr} entry is not a mapping "
                    f"({type(ent).__name__})"
                )
                continue
            gen, sub_v = ent.get("gen"), ent.get("v")
            if not isinstance(gen, str) or not gen:
                rep["errors"].append(
                    f"version {v}: partition {pstr} entry has no generation "
                    f"('gen' = {gen!r})"
                )
                continue
            if sub_v is None:
                rep["errors"].append(
                    f"version {v}: partition {pstr} entry has no sub-version "
                    "('v' missing)"
                )
                continue
            referenced.add((pstr, gen))
            sub_path = os.path.join(path, f"p={pstr}", gen)
            key = f"{pstr}/{gen}"
            if key not in rep["partitions"]:
                rep["partitions"][key] = fsck_versioned_path(sub_path, deep=deep)
            sub_meta_path = os.path.join(sub_path, META_NAME)
            if os.path.exists(sub_meta_path):
                sub_meta = _load_json(sub_meta_path, rep) or {"versions": {}}
                if str(sub_v) not in sub_meta["versions"]:
                    rep["errors"].append(
                        f"version {v}: partition {pstr} references sub-version "
                        f"{sub_v} of {gen}, which is not retained there "
                        "(reclaimed by a sub-level gc?)"
                    )
    # orphan generation dirs: legitimate after drop_partitions+expire
    # crash windows — warn, never error
    for d in sorted(os.listdir(path)):
        if d.startswith("p="):
            pstr = d[2:]
            for gen in sorted(os.listdir(os.path.join(path, d))):
                if (pstr, gen) not in referenced:
                    rep["warnings"].append(
                        f"orphan generation {d}/{gen} (no retained version "
                        "references it; expire reclaims it)"
                    )
    for sub in rep["partitions"].values():
        rep["errors"].extend(f"[{sub['path']}] {e}" for e in sub["errors"])
    return rep


_PUB_NAME = re.compile(r"^v(\d+)-(\d+)$")


def _egress_ranges_fs(path: str, rep: dict) -> list[tuple[int, int, str]]:
    """Publication ranges under ``path``; malformed names reported."""
    out = []
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if ".stage-" in d:
            rep["warnings"].append(
                f"stage residue {d} (crashed emission; readers ignore it)"
            )
            continue
        if not d.startswith("v") or not os.path.isdir(full):
            continue
        m = _PUB_NAME.match(d)
        if not m:
            rep["errors"].append(f"unparsable publication dir name {d!r}")
            continue
        a, b = int(m.group(1)), int(m.group(2))
        if b <= a:
            rep["errors"].append(f"empty/inverted publication range {d}")
            continue
        out.append((a, b, d))
    return sorted(out, key=lambda t: (t[0], -t[1]))


def fsck_egress_dir(path: str) -> dict:
    """fsck a wire-egress publication dir: range-named publications
    must tile ``[0, hwm]`` contiguously under the coverage rule (widest
    range wins at each boundary).  Stage residue and compaction-
    subsumed dirs are WARNINGS (crash residue the readers already
    skip); a coverage GAP is an ERROR — wire messages are missing and
    no read can reach the high-water mark."""
    rep = _report(path, "egress")
    if not os.path.isdir(path):
        rep["errors"].append("egress dir missing")
        return rep
    end = 0
    for a, b, d in _egress_ranges_fs(path, rep):
        if a == end and b > end:
            end = b
        elif b <= end:
            rep["warnings"].append(
                f"subsumed publication {d} (compaction residue; the "
                "coverage rule skips it)"
            )
        elif a > end:
            rep["errors"].append(
                f"coverage gap [{end}, {a}) before {d} — wire messages lost"
            )
            end = b
        else:  # a < end < b: partial overlap, not plain subsumption
            rep["errors"].append(
                f"publication {d} partially overlaps coverage end {end}"
            )
            end = b
    rep["hwm"] = end
    # schema sidecars (DDL-over-the-wire): a corrupt one is an error
    # (the next emission's schema diff reads it); the coverage TAIL
    # missing one — in a dir where other publications carry sidecars,
    # so the feature is in use — disables DDL detection for the next
    # emission (documented degrade): warn.  Dirs with no sidecars
    # anywhere are pre-feature and stay silent.
    tail_pub = None
    cov_end = 0
    for a, b, d in _egress_ranges_fs(path, _report(path, "egress")):
        if a == cov_end and b > cov_end:
            cov_end = b
            tail_pub = d
    have_sidecar: set[str] = set()
    for d in sorted(os.listdir(path)):
        if not os.path.isdir(os.path.join(path, d)) or ".stage-" in d:
            continue
        sp = os.path.join(path, d, "_egress_schema.json")
        if os.path.exists(sp):
            have_sidecar.add(d)
            try:
                with open(sp) as f:
                    cols = json.load(f)["columns"]
                if not isinstance(cols, list):
                    raise ValueError("'columns' is not a list")
            except (OSError, ValueError, KeyError) as e:
                rep["errors"].append(f"corrupt schema sidecar in {d}: {e}")
    if have_sidecar and tail_pub is not None and tail_pub not in have_sidecar:
        rep["warnings"].append(
            f"coverage tail {tail_pub} has no schema sidecar — the next "
            "emission cannot detect a schema change (heals at the "
            "emission after next)"
        )
    return rep


def _boundary_reconstructible(
    ranges: list[tuple[int, int, str]], v_to: int
) -> bool:
    """A boundary is readable iff the READER can read it — delegates
    to the reader's own coverage rule (``egress_coverage_until``, one
    shared function) instead of re-deriving it: with compaction-crash
    residue (v0-4, v4-6, v6-10 PLUS combined v4-10) the widest-first
    rule hits v4-10 at boundary 6 and the reader raises; a re-derived
    check that tiled via the subsumed narrower dirs would report clean
    exactly while the boundary is unreadable and the next compaction
    makes it permanently so."""
    from qin_cdc_spark.streaming.cdc_stream import egress_coverage_until

    return egress_coverage_until(ranges, v_to)[0] is not None


def fsck_coordinator_path(
    path: str, *, egress_dirs: dict[str, str] | None = None
) -> dict:
    """fsck a ``SnapshotCoordinator`` manifest: batches parse, every
    coordinate maps table → int version, versions are MONOTONE per
    table across batch ids (a decrease means a table was restored
    under a non-restored coordinator), egress stamps are well-formed
    ranges, and — given ``egress_dirs`` — every stamped boundary is
    still WIRE-reconstructible (compaction did not merge across a
    retained coordinate)."""
    rep = _report(path, "coordinator")
    from qin_cdc_spark.streaming.coordinator import (
        COORD_LOG,
        COORD_META,
        _segment_files,
    )

    if not (
        os.path.exists(os.path.join(path, COORD_META))
        or os.path.exists(os.path.join(path, COORD_LOG))
        or _segment_files(path)
    ):
        rep["errors"].append(
            "no _coordinates.json / _coordinates.log / sealed segments"
        )
        return rep
    # the READER's own loader (base JSON + append-only log folded, the
    # expiry floor applied) — fsck must audit what consumers will see
    try:
        from qin_cdc_spark.streaming.coordinator import load_coordinates

        meta = load_coordinates(path)
    except (OSError, ValueError) as e:
        rep["errors"].append(f"meta unreadable: {e}")
        return rep
    batches = meta.get("batches")
    if not isinstance(batches, dict):
        rep["errors"].append("meta['batches'] is not a mapping")
        return rep
    bad = [b for b in batches if not str(b).lstrip("-").isdigit()]
    if bad:
        rep["errors"].append(f"non-integer batch keys: {bad[:5]}")
        return rep
    last: dict[str, int] = {}
    for b in sorted(batches, key=int):
        coord = batches[b]
        if not isinstance(coord, dict):
            rep["errors"].append(f"batch {b}: coordinate is not a mapping")
            continue
        for name, v in coord.items():
            if not isinstance(v, int):
                rep["errors"].append(
                    f"batch {b}: {name} version {v!r} is not an int"
                )
                continue
            if name in last and v < last[name]:
                rep["errors"].append(
                    f"batch {b}: {name} version {v} went BACKWARDS from "
                    f"{last[name]} — table restored under a non-restored "
                    "coordinator?"
                )
            last[name] = v
    egress = meta.get("egress", {})
    if not isinstance(egress, dict):
        rep["errors"].append("meta['egress'] is not a mapping")
        return rep
    # the egress section gets the SAME shape guards as batches: a
    # corrupt manifest is exactly what this checker exists to report,
    # so a non-integer key or non-mapping stamps value must become an
    # error entry, never a ValueError/AttributeError out of the walk
    bad = [b for b in egress if not str(b).lstrip("-").isdigit()]
    if bad:
        rep["errors"].append(f"non-integer egress batch keys: {bad[:5]}")
    cached_ranges: dict[str, list] = {}
    for b in sorted((b for b in egress if b not in bad), key=int):
        stamps = egress[b]
        if not isinstance(stamps, dict):
            rep["errors"].append(
                f"egress batch {b}: stamps value is not a mapping "
                f"({type(stamps).__name__})"
            )
            continue
        for name, rng in stamps.items():
            if (
                not isinstance(rng, (list, tuple))
                or len(rng) != 2
                or not all(isinstance(x, int) for x in rng)
                or rng[0] > rng[1]
            ):
                rep["errors"].append(
                    f"batch {b}: malformed egress stamp {name}={rng!r}"
                )
                continue
            if egress_dirs and name in egress_dirs:
                if name not in cached_ranges:
                    d = egress_dirs[name]
                    cached_ranges[name] = (
                        _egress_ranges_fs(d, _report(d, "egress"))
                        if os.path.isdir(d)
                        else []
                    )
                if not _boundary_reconstructible(
                    cached_ranges[name], rng[1]
                ):
                    rep["errors"].append(
                        f"batch {b}: {name} stamped boundary {rng[1]} is "
                        "not wire-reconstructible (publications compacted "
                        "across a retained coordinate?)"
                    )
    return rep


def fsck_path(path: str, *, deep: bool = False) -> dict:
    """Auto-detect the store layout at ``path`` and fsck it."""
    if os.path.exists(os.path.join(path, PART_META_NAME)):
        return fsck_partitioned_path(path, deep=deep)
    if os.path.exists(os.path.join(path, META_NAME)):
        return fsck_versioned_path(path, deep=deep)
    from qin_cdc_spark.streaming.coordinator import _segment_files

    if (
        os.path.exists(os.path.join(path, "_coordinates.json"))
        or os.path.exists(os.path.join(path, "_coordinates.log"))
        or _segment_files(path)
    ):
        return fsck_coordinator_path(path)
    if os.path.isdir(path) and any(
        _PUB_NAME.match(d) for d in os.listdir(path)
    ):
        return fsck_egress_dir(path)
    rep = _report(path, "unknown")
    rep["errors"].append("no engine manifest found (neither layout)")
    return rep


def fsck_consumer(consumer_applied: int, source_current: int, *, name: str = "consumer") -> dict:
    """Progress sanity for a CDF consumer (MV/GSI/index): applied must
    not run AHEAD of the source (a source restored from backup under a
    non-restored consumer silently freezes every refresh — the guard
    sees 'already applied' forever)."""
    rep = {"name": name, "errors": [], "warnings": []}
    if consumer_applied > source_current:
        rep["errors"].append(
            f"{name}: applied version {consumer_applied} is ahead of the "
            f"source's current {source_current} — restore the consumer to a "
            "snapshot at-or-before the source's, or rebuild it"
        )
    return rep


def ok(report: dict) -> bool:
    return not report["errors"]
