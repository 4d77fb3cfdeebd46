"""gate_tmp composition scoping (ADVICE r8): the deferred-delete
contract is consume-before-next; gate_tmp_scope makes composing two
live gate frames safe and enforces cleanup at scope exit."""

import os

from qin_cdc_spark.testing import cleanup_gate_tmp, gate_tmp, gate_tmp_scope


def test_gate_tmp_deferred_delete_default():
    a = gate_tmp("gatetest_")
    assert os.path.isdir(a)
    b = gate_tmp("gatetest_")  # next query: previous tree deletes
    assert not os.path.isdir(a) and os.path.isdir(b)
    cleanup_gate_tmp()
    assert not os.path.isdir(b)


def test_gate_tmp_scope_suspends_deletion_then_cleans():
    stale = gate_tmp("gatetest_")  # pending from a consumed prior query
    with gate_tmp_scope():
        assert not os.path.isdir(stale)  # flushed on entry
        a = gate_tmp("gatetest_")
        b = gate_tmp("gatetest_")
        # composing: the second allocation must NOT delete the first
        assert os.path.isdir(a) and os.path.isdir(b)
    assert not os.path.isdir(a) and not os.path.isdir(b)  # scope exit cleans


def test_gate_tmp_scope_nests():
    with gate_tmp_scope():
        a = gate_tmp("gatetest_")
        with gate_tmp_scope():
            b = gate_tmp("gatetest_")
            assert os.path.isdir(a) and os.path.isdir(b)
        # inner exit keeps everything: the outer scope still composes
        assert os.path.isdir(a) and os.path.isdir(b)
    assert not os.path.isdir(a) and not os.path.isdir(b)


def test_session_tmp_cleanup():
    from qin_cdc_spark.session import cleanup_session_tmp, session_tmp

    d = session_tmp("land_hygtest_")
    assert os.path.isdir(d)
    cleanup_session_tmp()
    assert not os.path.isdir(d)


def test_landed_stream_self_heals_after_cleanup(spark):
    """The session caches route through session_tmp (VERDICT r8 #1):
    a mid-run cleanup_session_tmp() removes the trees, and the cache
    re-lands on the next request instead of serving a dangling path."""
    from qin_cdc_spark.cdc.queries import landed_stream
    from qin_cdc_spark.session import cleanup_session_tmp

    calls = []

    def build():
        calls.append(1)
        return spark.range(5).selectExpr("id", "id * 2 AS v")

    assert landed_stream(spark, "sfX", "hygtest", build).count() == 5
    landed_stream(spark, "sfX", "hygtest", build)
    assert calls == [1]  # second request served from the cache
    cleanup_session_tmp()
    assert landed_stream(spark, "sfX", "hygtest", build).count() == 5
    assert calls == [1, 1]  # re-landed after the sweep
