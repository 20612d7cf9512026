"""Z-order layout: the clustered files must actually enable
multi-dimensional skipping — measured from real per-file min-max stats,
the same stats a parquet reader prunes with."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_hadoop_flightsearch_spark.sources.catalog import load_table
from hbase_hadoop_flightsearch_spark.sources.layout import write_zordered

SF = "/root/testdata/sf0.01"
N_FILES = 16


def _file_stats(spark, path):
    """Per-file [min,max] of the two predicate columns."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("o_custkey").alias("ck_lo"),
            F.max("o_custkey").alias("ck_hi"),
            F.min("o_totalprice").alias("tp_lo"),
            F.max("o_totalprice").alias("tp_hi"),
        )
        .collect()
    )


def _overlapping(stats, ck=None, tp=None):
    n = 0
    for r in stats:
        ok = True
        if ck is not None:
            ok &= r["ck_lo"] <= ck[1] and r["ck_hi"] >= ck[0]
        if tp is not None:
            ok &= r["tp_lo"] <= tp[1] and r["tp_hi"] >= tp[0]
        n += ok
    return n


def test_zorder_skips_files_on_both_dimensions(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    zpath = str(tmp_path / "orders_z")
    lpath = str(tmp_path / "orders_linear")

    # z-order on (custkey, price bucket) — same key the registry query uses
    with_b = orders.withColumn(
        "price_bucket", F.floor(F.col("o_totalprice") / 8).cast("long")
    )
    write_zordered(with_b, zpath, "o_custkey", "price_bucket", N_FILES)
    # baseline: classic 1-D sort by custkey
    (
        orders.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    z_stats = _file_stats(spark, zpath)
    l_stats = _file_stats(spark, lpath)
    assert len(z_stats) == N_FILES and len(l_stats) == N_FILES

    # Price-only predicate (a ~6% slab): the custkey-sorted layout can
    # prune nothing; z-order confines the slab to a minority of files.
    tp = (100000.0, 130000.0)
    z_hit = _overlapping(z_stats, tp=tp)
    l_hit = _overlapping(l_stats, tp=tp)
    assert l_hit == N_FILES  # 1-D layout: price spans every file
    assert z_hit <= N_FILES // 2, (z_hit, l_hit)

    # 2-D box: a narrow custkey range is the 1-D layout's BEST case, so
    # z-order only needs to stay comparable here (its win is the off-axis
    # slab above). repartitionByRange boundaries are sampled, so the
    # z-side overlap wobbles by a file or two run-to-run (measured 2-3 vs
    # a stable 2) — allow that slack rather than asserting strict <=.
    ck = (300, 450)
    z_box = _overlapping(z_stats, ck=ck, tp=tp)
    l_box = _overlapping(l_stats, ck=ck, tp=tp)
    assert z_box <= l_box + 2, (z_box, l_box)

    # And the layout is lossless: same rows back.
    assert (
        spark.read.parquet(zpath).drop("price_bucket").count()
        == orders.count()
    )


def test_bucketed_join_has_no_exchange(spark):
    """The bucketed-pair layout must let the custkey equi-join run with
    ZERO Exchange nodes even when broadcast is disabled — the pre-
    shuffled-on-disk contract that amortizes the fact-table shuffle at
    100 TB. Also: re-writing is idempotent (overwrite) and the bucketed
    result matches the plain parquet join exactly."""
    from hbase_hadoop_flightsearch_spark.sources.layout import (
        write_bucketed_pair,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t_orders, t_cust = write_bucketed_pair(spark, SF)
        t_orders2, _ = write_bucketed_pair(spark, SF)  # idempotent
        assert t_orders2 == t_orders
        o, c = spark.table(t_orders), spark.table(t_cust)
        joined = o.join(c, o["o_custkey"] == c["c_custkey"])
        plan = (
            joined._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
        plain = load_table(spark, SF, "orders").join(
            load_table(spark, SF, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_time_travel_matches_naive_log_replay(spark):
    """The delta-sweep snapshot counts must equal the naive per-version
    liveness predicate (added <= v AND (never removed OR removed > v))
    computed directly over the synthesized log at sf0.001."""
    import duckdb

    from hbase_hadoop_flightsearch_spark.sources.layout import (
        TT_VERSIONS,
        layout_snapshot_time_travel,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["version"]: (r["live_files"], r["live_bytes"])
        for r in layout_snapshot_time_travel(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM"
        f" read_parquet('{sf}/orders.parquet')"
    )
    naive = con.execute(f"""
        WITH log AS (
          SELECT o_orderkey % 7 AS add_v,
                 CASE WHEN o_orderkey % 2 = 0
                      THEN o_orderkey % 7 + 1 + o_orderkey % 3 END AS rem_v,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS bytes
          FROM orders
        ), v AS (SELECT unnest(range({TT_VERSIONS})) AS version)
        SELECT version, COUNT(*) FILTER (WHERE add_v <= version
                 AND (rem_v IS NULL OR rem_v > version)),
               COALESCE(SUM(bytes) FILTER (WHERE add_v <= version
                 AND (rem_v IS NULL OR rem_v > version)), 0)
        FROM v LEFT JOIN log ON TRUE GROUP BY version
    """).fetchall()
    assert len(got) == TT_VERSIONS
    for version, files, bytes_ in naive:
        assert got[version] == (files, bytes_), version
