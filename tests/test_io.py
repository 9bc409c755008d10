"""TableIO maintenance surface — the engine's O28 analog (reference
clear_all / delete, kg_builder.py:175-187, neo4j_store.py:409-417):
drop, truncate, snapshot expiry, and the append-only read_all path."""

import os

import pytest

from kgspark.io import TableIO


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x int")


def test_drop_and_clear_all(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"))
    io.commit("t1", _df(spark, [1, 2]))
    io.commit("t2", _df(spark, [3]))
    assert io.tables() == ["t1", "t2"]
    io.drop("t1")
    assert io.tables() == ["t2"]
    with pytest.raises(FileNotFoundError):
        io.read(spark, "t1")
    io.clear_all()
    assert io.tables() == []
    io.drop("never_existed")  # idempotent


def test_truncate_resets_but_table_survives(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"))
    io.commit("t", _df(spark, [1]), input_snapshot="corpus_a")
    io.truncate("t")
    assert io.current_snapshot("t") is None
    assert io.find_snapshot("t", "corpus_a") is None  # resume won't match
    with pytest.raises(FileNotFoundError):
        io.read(spark, "t")
    # a fresh commit after truncate works and ids keep advancing
    snap = io.commit("t", _df(spark, [2]))
    assert [r["x"] for r in io.read(spark, "t").collect()] == [2]
    assert snap == "s0000"  # manifest was reset


def test_expire_snapshots_keeps_current_blocks_stale_resume(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"))
    s0 = io.commit("t", _df(spark, [1]), input_snapshot="in_a")
    s1 = io.commit("t", _df(spark, [2]), input_snapshot="in_b")
    s2 = io.commit("t", _df(spark, [3]), input_snapshot="in_c")
    expired = io.expire_snapshots("t", keep_last=1)
    assert expired == [s0, s1]
    # current snapshot still readable; expired ones are not
    assert [r["x"] for r in io.read(spark, "t").collect()] == [3]
    with pytest.raises(FileNotFoundError):
        io.read(spark, "t", snapshot=s0)
    # resume checks no longer match expired lineage
    assert io.find_snapshot("t", "in_a") is None
    assert io.find_snapshot("t", "in_c") == s2
    # data dirs really gone
    assert not os.path.exists(os.path.join(str(tmp_path / "wh"), "t", s0))
    # idempotent: nothing further to expire
    assert io.expire_snapshots("t", keep_last=1) == []
    # snapshot ids never reused after expiry
    s3 = io.commit("t", _df(spark, [4]))
    assert s3 == "s0003"


def test_read_all_unions_snapshots_skips_expired(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"))
    io.commit("log", _df(spark, [1]))
    io.commit("log", _df(spark, [2, 3]))
    assert sorted(r["x"] for r in io.read_all(spark, "log").collect()) == [1, 2, 3]
    # read (no snapshot arg) still returns only the current delta
    assert sorted(r["x"] for r in io.read(spark, "log").collect()) == [2, 3]
    io.expire_snapshots("log", keep_last=1)
    assert sorted(r["x"] for r in io.read_all(spark, "log").collect()) == [2, 3]
