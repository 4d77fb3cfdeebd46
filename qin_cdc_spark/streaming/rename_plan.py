"""Shared rename-step planner for the store-layer ``rename_columns``
implementations (ParquetUpsertTable / VersionedBucketedTable — the
SCD2 and partitioned stores delegate to the versioned one).

The upstream contract (reference: ``metas/mysql_ddl_parse.go`` applies
ALTER ops sequentially against the evolving Table struct) allows DDL
sequences the round-9 snapshot validation rejected (ADVICE r9):

* retype-only ``CHANGE COLUMN a a bigint`` — MySQL's standard retype
  idiom parses with ``new_name == column``; an identity entry must be
  a NO-OP, not a "target already exists" crash;
* ``ADD COLUMN x`` then ``RENAME x TO y`` before any merge
  materialized ``x`` — the store holds NEITHER name; the decode schema
  already evolved, so the merge lands the data under the new name and
  the store-side rename must SKIP, not raise;
* freed-name reuse ``RENAME a TO b; RENAME c TO a`` — sequentially
  legal upstream, but invalid when validated against the pre-rename
  column snapshot.  Entries must validate against an EVOLVING column
  set, in mapping (insertion) order.

``plan_rename_steps`` returns the ordered ``(old, new)`` steps to
apply with ``withColumnRenamed``; raises only on TRUE conflicts (the
old column is live and the target name is occupied by a column this
mapping does not free first — and the mapping is not a full replay).
"""

from __future__ import annotations

from collections.abc import Iterable


def _simulate(
    cols: set[str], entries: list[tuple[str, str]]
) -> tuple[list[tuple[str, str]], list[str], ValueError | None]:
    """Forward-apply ``entries`` against an evolving copy of ``cols``.

    Returns (applied steps, missing olds, error).  Absent-old entries
    with the new name present are silent skips (already-applied
    replay); absent-old AND absent-new entries are collected in
    ``missing`` for the caller to adjudicate (legal
    added-then-renamed-before-materializing vs a plain typo)."""
    work = set(cols)
    steps: list[tuple[str, str]] = []
    missing: list[str] = []
    for old, new in entries:
        if old in work:
            if new in work:
                return steps, missing, ValueError(
                    f"rename_columns: target column {new!r} already exists"
                )
            work.discard(old)
            work.add(new)
            steps.append((old, new))
        elif new not in work:
            missing.append(old)
    return steps, missing, None


def plan_rename_steps(
    cols: Iterable[str], mapping: dict[str, str], *, missing_ok: bool = False
) -> list[tuple[str, str]]:
    """Ordered ``(old, new)`` rename steps for a store whose current
    columns are ``cols``.  Identity entries (old == new) drop out;
    entries whose old name is absent but new name present are skipped
    (already-applied replay); a full replay of a freed-name chain
    (every entry already applied, detected by inverse simulation)
    returns []; a genuine target-name collision raises ValueError.

    Entries where NEITHER name exists raise "not found" by default (a
    blind store-level call with a bogus column must stay loud); with
    ``missing_ok=True`` they are skipped — the route sets it when the
    mapping came from a parsed upstream DDL statement, where the legal
    reading is "added then renamed before any merge materialized it"
    (the decode schema already evolved, so the merge lands the data
    under the new name)."""
    colset = set(cols)
    entries = [(o, n) for o, n in mapping.items() if o != n]
    if not entries:
        return []
    steps, missing, err = _simulate(colset, entries)
    if err is None:
        if missing and not missing_ok:
            old = missing[0]
            raise ValueError(
                f"rename_columns: column {old!r} not found (and "
                f"{mapping[old]!r} absent — not an already-applied replay)"
            )
        return steps
    # Forward simulation hit a target conflict.  That is either a true
    # collision or a REPLAY of a chain that reuses a freed name (after
    # full application, the freed name is live again, so re-running the
    # first entry sees its target occupied).  Distinguish by undoing
    # the chain: if every entry inverts cleanly (new present, old
    # absent) in reverse order AND re-applying the chain to that
    # reconstructed pre-state lands exactly back on the current
    # columns, the mapping was already applied — a no-op replay.
    undo = set(colset)
    for old, new in reversed(entries):
        if new in undo and old not in undo:
            undo.discard(new)
            undo.add(old)
        else:
            raise err
    redo, _, err2 = _simulate(undo, entries)
    if err2 is not None:
        raise err
    post = set(undo)
    for old, new in redo:
        post.discard(old)
        post.add(new)
    if post == colset:
        return []
    raise err
