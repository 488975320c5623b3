"""Versioned parquet tables (plans/versioned.py): snapshot isolation,
time travel, atomic pointer swap, rollback, vacuum."""

from __future__ import annotations

import json
import os

import pytest

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.versioned import (
    commit_version,
    history,
    latest_version,
    read_version,
    rollback,
    vacuum,
)


def _vals(df):
    return sorted(r.v for r in df.collect())


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


class TestVersioned:
    def test_overwrite_append_time_travel(self, spark, table):
        assert latest_version(table) is None
        v1 = commit_version(spark.range(3).selectExpr("id AS v"), table)
        v2 = commit_version(
            spark.range(10, 12).selectExpr("id AS v"), table, mode="append"
        )
        v3 = commit_version(
            spark.range(100, 101).selectExpr("id AS v"), table, mode="overwrite"
        )
        assert (v1, v2, v3) == (1, 2, 3)
        assert _vals(read_version(spark, table, 1)) == [0, 1, 2]
        assert _vals(read_version(spark, table, 2)) == [0, 1, 2, 10, 11]
        assert _vals(read_version(spark, table, 3)) == [100]
        assert _vals(read_version(spark, table)) == [100]
        assert [h["mode"] for h in history(table)] == [
            "overwrite", "append", "overwrite",
        ]

    def test_snapshot_isolation_under_later_commits(self, spark, table):
        commit_version(spark.range(5).selectExpr("id AS v"), table)
        pinned = read_version(spark, table, 1)
        commit_version(
            spark.range(50, 55).selectExpr("id AS v"), table, mode="overwrite"
        )
        # the pinned frame still reads version 1's exact files
        assert _vals(pinned) == [0, 1, 2, 3, 4]

    def test_unreferenced_data_files_are_invisible(self, spark, table):
        commit_version(spark.range(2).selectExpr("id AS v"), table)
        # simulate a crashed commit: data files exist, no manifest
        orphan = os.path.join(table, "data", "deadbeef")
        spark.range(1000, 1003).selectExpr("id AS v").write.parquet(orphan)
        assert _vals(read_version(spark, table)) == [0, 1]

    def test_rollback_writes_no_data(self, spark, table):
        commit_version(spark.range(3).selectExpr("id AS v"), table)
        commit_version(
            spark.range(7, 9).selectExpr("id AS v"), table, mode="overwrite"
        )
        v3 = rollback(table, 1)
        assert v3 == 3
        assert _vals(read_version(spark, table)) == [0, 1, 2]
        # rollback manifest references version 1's files verbatim
        m1 = json.load(open(os.path.join(table, "_versions", "v0000000001.json")))
        m3 = json.load(open(os.path.join(table, "_versions", "v0000000003.json")))
        assert m1["files"] == m3["files"]

    def test_append_never_rewrites_existing_files(self, spark, table):
        commit_version(spark.range(3).selectExpr("id AS v"), table)
        m1 = json.load(open(os.path.join(table, "_versions", "v0000000001.json")))
        mtimes = {f: os.path.getmtime(f) for f in m1["files"]}
        commit_version(
            spark.range(3, 6).selectExpr("id AS v"), table, mode="append"
        )
        for f, t in mtimes.items():
            assert os.path.getmtime(f) == t

    def test_vacuum_removes_only_expired(self, spark, table):
        commit_version(spark.range(2).selectExpr("id AS v"), table)
        commit_version(
            spark.range(5, 7).selectExpr("id AS v"), table, mode="overwrite"
        )
        deleted = vacuum(table, keep_versions=1)
        assert deleted  # version 1's files are gone
        assert _vals(read_version(spark, table)) == [5, 6]
        with pytest.raises(FileNotFoundError):
            read_version(spark, table, 1)

    def test_pointer_swap_is_atomic_artifact(self, spark, table):
        commit_version(spark.range(1).selectExpr("id AS v"), table)
        # no temp pointer files left behind
        leftovers = [f for f in os.listdir(table) if f.startswith("_latest.tmp")]
        assert leftovers == []
        assert latest_version(table) == 1


class TestMergeCommit:
    def test_upsert_with_history(self, spark, table):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.versioned import (
            merge_commit,
        )

        base = spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k int, val string, seq int"
        ).drop("seq")
        assert merge_commit(spark, base, table, ["k"]) == 1
        # batch updates k=2 twice (last wins on seq) and inserts k=4
        upd = spark.createDataFrame(
            [(2, "B0", 1), (2, "B1", 2), (4, "d", 1)], "k int, val string, seq int"
        )
        assert merge_commit(spark, upd, table, ["k"], order_col="seq") == 2
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.versioned import (
            read_version,
        )

        v2 = {(r.k, r.val) for r in read_version(spark, table).collect()}
        assert v2 == {(1, "a"), (2, "B1"), (3, "c"), (4, "d")}
        # time travel: version 1 still has the pre-merge row
        v1 = {(r.k, r.val) for r in read_version(spark, table, 1).collect()}
        assert v1 == {(1, "a"), (2, "b"), (3, "c")}

    def test_idempotent_replay(self, spark, table):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.versioned import (
            merge_commit,
            read_version,
        )

        base = spark.createDataFrame([(1, "a")], "k int, val string")
        merge_commit(spark, base, table, ["k"])
        upd = spark.createDataFrame([(1, "A"), (2, "b")], "k int, val string")
        merge_commit(spark, upd, table, ["k"])
        merge_commit(spark, upd, table, ["k"])  # replayed batch
        rows = {(r.k, r.val) for r in read_version(spark, table).collect()}
        assert rows == {(1, "A"), (2, "b")}


class TestDqReport:
    def test_predicate_and_unique_rules(self, spark):
        from pyspark.sql import functions as F

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.quality import (
            dq_report,
            dq_unique_report,
        )

        df = spark.createDataFrame(
            [(1, 5.0), (2, -1.0), (2, None), (3, 0.0)], "k int, v double"
        )
        rep = {
            r.rule: (r.n_violations, r.n_rows)
            for r in dq_report(
                df,
                {
                    "v_nonnull": F.col("v").isNull(),
                    "v_positive": F.col("v") <= 0,
                },
            ).collect()
        }
        # v <= 0 is NULL for the null row -> not counted as a violation
        # of positivity (it has its own rule)
        assert rep == {"v_nonnull": (1, 4), "v_positive": (2, 4)}
        uniq = dq_unique_report(df, ["k"]).collect()[0]
        assert (uniq.rule, uniq.n_violations, uniq.n_rows) == ("unique_k", 1, 4)

    def test_empty_input(self, spark):
        from pyspark.sql import functions as F

        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.quality import (
            dq_report,
            dq_unique_report,
        )

        df = spark.createDataFrame([], "k int, v double")
        rep = dq_report(df, {"v_nonnull": F.col("v").isNull()}).collect()
        assert [(r.rule, r.n_violations is None or r.n_violations == 0, r.n_rows) for r in rep] == [
            ("v_nonnull", True, 0)
        ]
        uniq = dq_unique_report(df, ["k"]).collect()[0]
        assert (uniq.n_violations, uniq.n_rows) == (0, 0)


class TestPsiDrift:
    def test_identical_distributions_score_zero(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.quality import (
            psi_drift,
        )

        df = spark.range(1000).selectExpr(
            "'k' AS g", "CAST(id % 100 AS DOUBLE) * 10.0 AS v"
        )
        r = psi_drift(df, df, "v", keys=["g"], bins=20, lo=0.0, hi=1000.0).collect()[0]
        assert r.psi == 0.0 and r.n_base == 1000 and r.n_current == 1000

    def test_shifted_distribution_scores_high(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.quality import (
            psi_drift,
        )

        a = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
        b = spark.range(1000).selectExpr("CAST(500 + id % 100 AS DOUBLE) AS v")
        r = psi_drift(a, b, "v", bins=20, lo=0.0, hi=1000.0).collect()[0]
        assert r.psi > 0.25  # disjoint histograms -> strong drift

    def test_partition_count_invariant(self, spark):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.quality import (
            psi_drift,
        )

        a = spark.range(3000).selectExpr("CAST((id * 37) % 997 AS DOUBLE) AS v")
        b = spark.range(2000).selectExpr("CAST((id * 61) % 997 AS DOUBLE) AS v")
        r1 = psi_drift(a, b, "v").collect()[0].psi
        r2 = psi_drift(a.repartition(17), b.repartition(3), "v").collect()[0].psi
        assert r1 == r2


class TestClusteredLayout:
    def test_disjoint_file_ranges_enable_skipping(self, spark, tmp_path):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.layout import (
            file_stats,
            write_clustered,
        )

        df = spark.range(100_000).selectExpr(
            "CAST(id * 2654435761 % 100000 AS BIGINT) AS k", "id AS payload"
        )
        clustered = str(tmp_path / "clustered")
        unclustered = str(tmp_path / "plain")
        write_clustered(df, clustered, ["k"], n_files=8)
        df.repartition(8).write.parquet(unclustered)

        cstats = [s for s in file_stats(clustered, "k") if s[1] is not None]
        ustats = [s for s in file_stats(unclustered, "k") if s[1] is not None]
        assert len(cstats) >= 4
        # clustered: file ranges are (near-)disjoint -> a point/range
        # predicate overlaps ~1 file; unclustered: every file spans
        # nearly the whole domain -> zero skipping
        cstats.sort(key=lambda s: s[1])
        for (_, _, hi), (_, lo2, _) in zip(cstats, cstats[1:]):
            assert hi <= lo2
        probe = 50_000
        c_hits = sum(1 for _, lo, hi in cstats if lo <= probe <= hi)
        u_hits = sum(1 for _, lo, hi in ustats if lo <= probe <= hi)
        assert c_hits <= 2 and u_hits == len(ustats)

    def test_roundtrip_content_identical(self, spark, tmp_path):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.layout import (
            write_clustered,
        )

        df = spark.range(5000).selectExpr("id % 97 AS k", "id AS v")
        p = str(tmp_path / "t")
        write_clustered(df, p, ["k", "v"], n_files=4)
        back = spark.read.parquet(p)
        assert back.count() == 5000
        assert sorted((r.k, r.v) for r in back.collect()) == sorted(
            (r.k, r.v) for r in df.collect()
        )


def test_merge_commit_schema_mismatch_is_clear_error(spark, tmp_path):
    """An update batch whose post-drop schema diverges from the stored
    snapshot fails fast with a ValueError naming the columns — not a
    mid-job unionByName failure (and the order column never leaks into
    the stored schema)."""
    import pytest

    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.versioned import (
        merge_commit,
        read_version,
    )

    table = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a", 0)], "k long, v string, seq long")
    # first commit via merge_commit WITH order_col: seq must be dropped
    merge_commit(spark, base, table, ["k"], order_col="seq")
    assert read_version(spark, table).columns == ["k", "v"]

    # matching updates merge fine
    up = spark.createDataFrame([(1, "b", 1)], "k long, v string, seq long")
    merge_commit(spark, up, table, ["k"], order_col="seq")
    assert {(r["k"], r["v"]) for r in read_version(spark, table).collect()} == {
        (1, "b")
    }

    # a batch with an extra column errors with the column named
    bad = spark.createDataFrame([(2, "c", "oops")], "k long, v string, extra string")
    with pytest.raises(ValueError, match="extra=\\['extra'\\]"):
        merge_commit(spark, bad, table, ["k"])

    # a batch missing a column errors too
    bad2 = spark.createDataFrame([(2,)], "k long")
    with pytest.raises(ValueError, match="missing=\\['v'\\]"):
        merge_commit(spark, bad2, table, ["k"])


def test_hadoop_io_route_full_lifecycle(spark, tmp_path, monkeypatch):
    """The Hadoop FileSystem metadata route (used for non-local table
    paths in cluster mode) exercised end-to-end against the local FS:
    commit/append/read/history/rollback/vacuum through py4j I/O must
    behave identically to the os fast path."""
    from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans import (
        versioned as V,
    )

    monkeypatch.setattr(V, "_io", lambda table_dir: V._HadoopIO(table_dir))

    table = str(tmp_path / "htbl")
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    df2 = spark.createDataFrame([(2, "b")], "k long, v string")
    v1 = V.commit_version(df1, table, note="first")
    v2 = V.commit_version(df2, table, mode="append", note="second")
    assert (v1, v2) == (1, 2)
    assert V.latest_version(table) == 2
    assert V.read_version(spark, table, 1).count() == 1
    assert V.read_version(spark, table, 2).count() == 2
    hist = V.history(table)
    assert [h["version"] for h in hist] == [1, 2]
    v3 = V.rollback(table, 1)
    assert V.read_version(spark, table, v3).count() == 1
    deleted = V.vacuum(table, keep_versions=1)
    # v2's extra file became unreferenced after the rollback kept v1's
    assert all(p.endswith(".parquet") for p in deleted)
    assert V.read_version(spark, table).count() == 1


class TestZOrderLayout:
    def test_zorder_files_bound_both_dimensions(self, spark, tmp_path):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.layout import (
            file_stats,
            write_zordered,
            write_clustered,
        )

        # 2D uniform grid: x and y independent
        df = spark.range(65_536).selectExpr(
            "CAST(id % 256 AS BIGINT) AS x",
            "CAST(CAST(id / 256 AS BIGINT) % 256 AS BIGINT) AS y",
            "id AS payload",
        )
        zpath = str(tmp_path / "zorder")
        lpath = str(tmp_path / "lex")
        write_zordered(df, zpath, ["x", "y"], n_files=16)
        write_clustered(df, lpath, ["x", "y"], n_files=16)

        def spans(path, col):
            return [
                (hi - lo)
                for _, lo, hi in file_stats(path, col)
                if lo is not None
            ]

        # lexicographic: x is clustered, y spans ~the whole domain per file
        # z-order: BOTH dimensions bounded per file
        z_y = spans(zpath, "y")
        l_y = spans(lpath, "y")
        assert sum(z_y) / len(z_y) < 0.6 * (sum(l_y) / len(l_y))

        # a y-only box predicate overlaps fewer z-ordered files
        def hits(path, col, lo_p, hi_p):
            return sum(
                1
                for _, lo, hi in file_stats(path, col)
                if lo is not None and not (hi < lo_p or lo > hi_p)
            )

        z_hits = hits(zpath, "y", 10, 20)
        l_hits = hits(lpath, "y", 10, 20)
        assert z_hits < l_hits

    def test_zorder_roundtrip_content(self, spark, tmp_path):
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.plans.layout import (
            write_zordered,
        )

        df = spark.range(1000).selectExpr(
            "CAST(id % 37 AS BIGINT) x", "CAST(id % 53 AS BIGINT) y", "id p"
        )
        path = str(tmp_path / "z")
        write_zordered(df, path, ["x", "y"], n_files=4)
        back = spark.read.parquet(path)
        assert sorted(back.columns) == ["p", "x", "y"]
        assert back.count() == 1000
        assert back.selectExpr("sum(p)").collect()[0][0] == 999 * 1000 // 2
