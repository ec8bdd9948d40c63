"""ReplacingMergeTree / VersionedCollapsingMergeTree / TTL engine semantics
(sources/storage.py r06 additions)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.sources.storage import (
    apply_ttl,
    collapse_versioned,
    compact_collapsing,
    compact_replacing,
    read_replacing_final,
    read_table,
    write_sorted,
)


def _upserts(spark):
    # key "a": three versions; key "b": version tie broken by seq; key "c": one
    rows = [
        ("a", 1, 0, "v1"),
        ("a", 3, 1, "v3"),
        ("a", 2, 2, "v2"),
        ("b", 5, 1, "old-tie"),
        ("b", 5, 2, "new-tie"),
        ("c", 9, 0, "only"),
    ]
    return spark.createDataFrame(rows, "k string, ver int, seq int, payload string")


def test_replacing_final_read_and_compaction_agree(spark, tmp_path):
    df = _upserts(spark)
    expect = {("a", "v3"), ("b", "new-tie"), ("c", "only")}

    # FINAL read over the raw upsert log
    got = {
        (r["k"], r["payload"])
        for r in read_replacing_final(df, ["k"], "ver", ["seq"]).collect()
    }
    assert got == expect

    # background merge: stored rows collapse, FINAL read unchanged
    path = str(tmp_path / "t")
    df.write.parquet(path)
    compact_replacing(spark, path, keys=["k"], version_col="ver", tiebreak=["seq"])
    back = read_table(spark, path)
    assert back.count() == 3  # one row per key remains on disk
    got2 = {
        (r["k"], r["payload"])
        for r in read_replacing_final(back, ["k"], "ver", ["seq"]).collect()
    }
    assert got2 == expect


def test_replacing_partitioned_keeps_layout(spark, tmp_path):
    df = _upserts(spark)
    path = str(tmp_path / "p")
    df.write.partitionBy("k").parquet(path)
    compact_replacing(
        spark,
        path,
        keys=["k", "ver"],  # version within partition key set is allowed
        version_col="seq",
        partition_cols=["k"],
    )
    assert sorted(d for d in os.listdir(path) if d.startswith("k=")) == [
        "k=a",
        "k=b",
        "k=c",
    ]


def test_collapse_versioned_annihilates_matched_pairs(spark):
    rows = [
        # key a, version 1: matched pair -> vanishes
        ("a", 1, 1, 10),
        ("a", 1, -1, 10),
        # key a, version 2: unmatched state survives
        ("a", 2, 1, 20),
        # key b, version 1: unmatched cancel survives with sign -1
        ("b", 1, -1, 5),
        # key c, version 1: two states, one cancel -> +1 survivor, mult 1
        ("c", 1, 1, 7),
        ("c", 1, 1, 8),
        ("c", 1, -1, 7),
    ]
    df = spark.createDataFrame(rows, "k string, ver int, sign int, v int")
    out = {
        (r["k"], r["ver"]): (r["sign"], r["multiplicity"], r["v"])
        for r in collapse_versioned(df, ["k"], "sign", "ver", ["v"]).collect()
    }
    assert ("a", 1) not in out
    assert out[("a", 2)] == (1, 1, 20)
    assert out[("b", 1)] == (-1, 1, 5)
    # winning sign +1, max-tiebreak payload (v=8), multiplicity |2-1|=1
    assert out[("c", 1)] == (1, 1, 8)


def test_compact_collapsing_roundtrip_and_idempotence(spark, tmp_path):
    rows = [
        ("u", 1, 1, 100),
        ("u", 1, -1, 100),
        ("u", 2, 1, 250),
    ]
    df = spark.createDataFrame(rows, "k string, ver int, sign int, bal int")
    path = str(tmp_path / "c")
    df.write.parquet(path)
    compact_collapsing(spark, path, keys=["k"], sign_col="sign", version_col="ver")
    first = [r.asDict() for r in read_table(spark, path).collect()]
    assert len(first) == 1 and first[0]["bal"] == 250

    # a second merge over the already-collapsed table is a no-op
    compact_collapsing(spark, path, keys=["k"], sign_col="sign", version_col="ver")
    again = [r.asDict() for r in read_table(spark, path).collect()]
    assert again == first


def test_apply_ttl_partition_drop_fast_path(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, f"2024-01-{d:02d} {h:02d}:00:00") for i, (d, h) in enumerate(
            [(1, 5), (1, 20), (2, 3), (2, 18), (3, 4), (3, 23)]
        )],
        "id long, s string",
    ).select("id", F.col("s").cast("timestamp").alias("ts"), F.to_date("s").alias("day"))
    path = str(tmp_path / "ttl")
    write_sorted(ev, path, sort_cols=["ts"], partition_cols=["day"])

    # record the live day's file identities: the fast path must not rewrite it
    live_dir = os.path.join(path, "day=2024-01-03")
    before = sorted(os.listdir(live_dir))

    stats = apply_ttl(spark, path, "ts", "2024-01-02 12:00:00", partition_day_col="day")
    assert stats == {"dropped_dirs": 1, "rewritten": 1}
    assert not os.path.exists(os.path.join(path, "day=2024-01-01"))
    assert sorted(os.listdir(live_dir)) == before  # untouched bytes

    kept = sorted(r["id"] for r in read_table(spark, path).collect())
    assert kept == [3, 4, 5]  # 01-02 18:00 survives the mid-day cutoff


def test_apply_ttl_unpartitioned_rewrite(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-02-01 00:00:00")], "id long, s string"
    ).select("id", F.col("s").cast("timestamp").alias("ts"))
    path = str(tmp_path / "flat")
    df.write.parquet(path)
    stats = apply_ttl(spark, path, "ts", "2024-01-15 00:00:00")
    assert stats == {"dropped_dirs": 0, "rewritten": 1}
    assert [r["id"] for r in read_table(spark, path).collect()] == [2]


def test_apply_ttl_skips_unparsable_partition_dirs(spark, tmp_path):
    # NULL-ts rows produce day=__HIVE_DEFAULT_PARTITION__; crashed swaps
    # can leave day=<d>_old debris — neither may fail the TTL pass
    ev = spark.createDataFrame(
        [(1, "2024-01-01 05:00:00"), (2, "2024-01-03 05:00:00"), (3, None)],
        "id long, s string",
    ).select("id", F.col("s").cast("timestamp").alias("ts"), F.to_date("s").alias("day"))
    path = str(tmp_path / "ttlx")
    write_sorted(ev, path, sort_cols=["ts"], partition_cols=["day"])
    os.makedirs(os.path.join(path, "day=2024-01-03_old"))

    stats = apply_ttl(spark, path, "ts", "2024-01-02 00:00:00", partition_day_col="day")
    assert stats == {"dropped_dirs": 1, "rewritten": 0}
    kept = sorted(
        r["id"] for r in read_table(spark, path).filter(F.col("ts").isNotNull()).collect()
    )
    assert kept == [2]  # NULL-ts row also survives in the default partition


def test_snapshot_diff_feeds_the_collapse_back_to_new(spark):
    """The CDC contract: old + snapshot_diff(old, new) collapses to new —
    including multiset duplicates — and an unchanged table diffs empty."""
    from apache_kafka_clickhouse_demo_spark.sources.storage import snapshot_diff

    old = spark.createDataFrame(
        [("a", 1), ("b", 2), ("dup", 9), ("dup", 9)], "k string, v int"
    )
    new = spark.createDataFrame(
        [("a", 5), ("b", 2), ("dup", 9), ("c", 7)], "k string, v int"
    )
    diff = snapshot_diff(old, new)
    got = {(r["k"], r["v"], r["sign"]) for r in diff.collect()}
    assert got == {("a", 1, -1), ("a", 5, 1), ("dup", 9, -1), ("c", 7, 1)}

    # applying the log: old(+1) union diff, net-summed per full row == new
    applied = (
        old.withColumn("sign", F.lit(1))
        .unionByName(diff)
        .groupBy("k", "v")
        .agg(F.sum("sign").alias("net"))
        .filter(F.col("net") > 0)
    )
    rebuilt = sorted(
        (r["k"], r["v"]) for r in applied.collect() for _ in range(r["net"])
    )
    assert rebuilt == sorted((r["k"], r["v"]) for r in new.collect())

    assert snapshot_diff(new, new).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        snapshot_diff(old, new.select("v", "k"))  # column order matters

    signed = old.withColumn("sign", F.lit(-1))
    with _pytest.raises(ValueError):  # sign-carrying inputs are rejected
        snapshot_diff(signed, signed)


def _upserts_with_deletes(spark):
    # key "a": live v1, DELETED at v3, late replay of older v2 must not
    # resurrect; key "b": deleted then re-created at a higher version;
    # key "c": never deleted
    rows = [
        ("a", 1, 0, "v1", 0),
        ("a", 3, 0, "gone", 1),
        ("a", 2, 0, "v2-replay", 0),
        ("b", 1, 0, "b1", 0),
        ("b", 2, 0, "b-gone", 1),
        ("b", 4, 0, "b-back", 0),
        ("c", 9, 0, "only", 0),
    ]
    return spark.createDataFrame(
        rows, "k string, ver int, seq int, payload string, is_deleted int"
    )


def test_replacing_is_deleted_final_read(spark):
    """ReplacingMergeTree(ver, is_deleted): a key whose WINNING version is
    a tombstone is absent from FINAL; older live versions do not
    resurrect it; a re-create above the tombstone wins again."""
    got = {
        (r["k"], r["payload"])
        for r in read_replacing_final(
            _upserts_with_deletes(spark), ["k"], "ver", ["seq"], deleted_col="is_deleted"
        ).collect()
    }
    assert got == {("b", "b-back"), ("c", "only")}


def test_replacing_merge_keeps_tombstones_unless_cleanup(spark, tmp_path):
    """Default merge keeps each key's winning tombstone (a later replay of
    an OLDER version must still lose to it); cleanup=True reclaims it; the
    FINAL answer is identical through every state."""
    df = _upserts_with_deletes(spark)
    expect = {("b", "b-back"), ("c", "only")}
    path = str(tmp_path / "t")
    df.write.parquet(path)

    compact_replacing(
        spark, path, keys=["k"], version_col="ver", tiebreak=["seq"],
        deleted_col="is_deleted",
    )
    back = read_table(spark, path)
    assert back.count() == 3  # a's tombstone retained, b-back, c
    # the retained tombstone still suppresses a post-merge older replay
    replay = spark.createDataFrame(
        [("a", 2, 9, "late-replay", 0)],
        "k string, ver int, seq int, payload string, is_deleted int",
    )
    merged = back.unionByName(replay)
    got = {
        (r["k"], r["payload"])
        for r in read_replacing_final(
            merged, ["k"], "ver", ["seq"], deleted_col="is_deleted"
        ).collect()
    }
    assert got == expect

    compact_replacing(
        spark, path, keys=["k"], version_col="ver", tiebreak=["seq"],
        deleted_col="is_deleted", cleanup=True,
    )
    back2 = read_table(spark, path)
    assert back2.count() == 2  # tombstone physically reclaimed
    got2 = {
        (r["k"], r["payload"])
        for r in read_replacing_final(
            back2, ["k"], "ver", ["seq"], deleted_col="is_deleted"
        ).collect()
    }
    assert got2 == expect


def test_replacing_cleanup_requires_deleted_col(spark, tmp_path):
    import pytest as _pytest

    df = _upserts(spark)
    path = str(tmp_path / "t")
    df.write.parquet(path)
    with _pytest.raises(ValueError):
        compact_replacing(
            spark, path, keys=["k"], version_col="ver", cleanup=True
        )


def test_replacing_null_tombstone_flag_is_live(spark):
    """Review r7: a CDC row missing the is_deleted flag (NULL) is neither
    live nor deleted under a bare `== 0` filter — the key silently
    vanishes.  NULL must read as LIVE (ClickHouse's is_deleted is a
    non-nullable UInt8; a feed that omits it means 'no delete')."""
    rows = [
        ("a", 1, 1, "a-v1", None),   # NULL flag on the winning version
        ("b", 1, 2, "b-v1", 0),
        ("b", 2, 3, "b-gone", 1),    # real tombstone still deletes
    ]
    df = spark.createDataFrame(
        rows, "k string, ver int, seq int, payload string, is_deleted int"
    )
    got = {
        (r["k"], r["payload"])
        for r in read_replacing_final(
            df, ["k"], "ver", ["seq"], deleted_col="is_deleted"
        ).collect()
    }
    assert got == {("a", "a-v1")}
