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
