"""Registry integrity: imports fail LOUDLY and the count is asserted.

VERDICT r7 "what's wrong" #1: the registry used to wrap every operator
module in ``except ImportError: pass`` — a transitive import break
(e.g. numpy missing for similarity) silently dropped dozens of
queries, shifted the driver's 50-slot prefix, and the correctness gate
green-checked the wrong set.  Now a missing required module raises
with its name, and the expected registry size is a test (the
tools/gen_counts.py count assertion, promoted).
"""

from __future__ import annotations

import importlib

import pytest

from qin_cdc_spark.plans.registry import _HEAD, all_oracles, all_queries

# Update BOTH numbers when adding gate queries — that is the point:
# a silent registry shrink (or an unregistered addition) fails here
# before the driver ever green-checks the wrong prefix.
EXPECTED_REGISTRY_SIZE = 240  # round 10: + cdc_mv_rename_follow
EXPECTED_ROWS_ONLY = 0


def test_registry_expected_counts():
    q, o = all_queries(), all_oracles()
    assert len(q) == EXPECTED_REGISTRY_SIZE
    assert len(q) - len(o) == EXPECTED_ROWS_ONLY
    assert set(o) <= set(q)
    assert len(_HEAD) == 50  # the driver prefix contract
    assert [n for n in _HEAD if n not in q] == []


def test_registry_fails_loud_on_missing_module(monkeypatch):
    from qin_cdc_spark.plans import registry

    real = importlib.import_module

    def fake(name, *a, **k):
        if name == "qin_cdc_spark.operators.similarity":
            raise ImportError("No module named 'numpy' (simulated)")
        return real(name, *a, **k)

    monkeypatch.setattr(importlib, "import_module", fake)
    with pytest.raises(RuntimeError, match="similarity.*failed"):
        registry._collect()
