"""IO layer tests: CSV round-trip with explicit schema, partitioned
parquet writes + partition pruning, timestamped side-output, JSON
report, approx-distinct error bound."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType


def test_csv_roundtrip_explicit_schema(spark, sf_dir, tmp_path):
    from nyc_taxi_etl_dashboard_spark.sources import read_csv, read_table, write_csv

    nation = read_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    schema = StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    )
    back = read_csv(spark, path, schema=schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """S4 + the index replacement (SURVEY §4.1): date-partitioned writes
    give partition pruning — the scan of one partition must read only
    that directory."""
    from nyc_taxi_etl_dashboard_spark.sources import read_table, write_parquet

    orders = read_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=["o_year"])
    back = spark.read.parquet(path).filter(F.col("o_year") == 1995)
    plan = back._jdf.queryExecution().executedPlan().toString()
    want = orders.filter(F.col("o_year") == 1995).count()
    assert back.count() == want
    assert "PartitionFilters: [isnotnull(o_year" in plan or "o_year#" in plan


def test_timestamped_side_output(spark, sf_dir, tmp_path):
    from nyc_taxi_etl_dashboard_spark.sources import read_table, write_parquet_timestamped

    nation = read_table(spark, sf_dir, "nation")
    path = write_parquet_timestamped(nation, str(tmp_path), "anomalies")
    assert "anomalies_" in path
    assert spark.read.parquet(path).count() == 25


def test_json_report_sink(tmp_path):
    from nyc_taxi_etl_dashboard_spark.sources import write_json_report

    path = str(tmp_path / "report.json")
    write_json_report({"total": 100, "rate": "10.60%"}, path)
    assert json.load(open(path)) == {"total": 100, "rate": "10.60%"}


def test_approx_distinct_error_bound(spark, sf_dir):
    """a21 invariant: HLL++ at rsd=0.02 stays within 5x the target rsd
    of the exact cardinality (generous, deterministic bound)."""
    from nyc_taxi_etl_dashboard_spark.sources import read_table

    li = read_table(spark, sf_dir, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    approx = li.agg(F.approx_count_distinct("l_partkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.10


def test_star_schema_ddl_runs(spark, tmp_path):
    """S11: the managed-table DDL parses and creates queryable tables."""
    from nyc_taxi_etl_dashboard_spark.sources.writers import create_star_schema_sql

    spark.sql(f"CREATE DATABASE IF NOT EXISTS ddl_test LOCATION '{tmp_path / 'wh'}'")
    spark.catalog.setCurrentDatabase("ddl_test")
    try:
        for ddl in create_star_schema_sql():
            spark.sql(ddl)
        assert spark.sql("SELECT * FROM fact_trips").count() == 0
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP DATABASE ddl_test CASCADE")


def test_jdbc_roundtrip_and_upsert_embedded_derby(spark, sf_dir, tmp_path):
    """S8/S9/S10/S12 against the Derby embedded DB bundled with Spark:
    append sink, key-lookup scan, and the left-anti-join upsert
    (ON CONFLICT DO NOTHING equivalent) end to end over a real JDBC
    boundary."""
    from nyc_taxi_etl_dashboard_spark.sources import (
        read_jdbc,
        read_table,
        write_jdbc_append,
        write_jdbc_upsert,
    )

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    nation = read_table(spark, sf_dir, "nation")
    # S8 append
    write_jdbc_append(nation.coalesce(1), url, "nation_dw", props)
    # S10/S12 scan back
    back = read_jdbc(spark, url, "nation_dw", props)
    assert back.count() == 25
    # S9 upsert, three states: bootstrap (no table), partial overlap,
    # full overlap (idempotent no-op)
    evens = nation.filter(F.col("n_nationkey") % 2 == 0)
    write_jdbc_upsert(spark, evens, url, "nation_dw2", ["n_nationkey"], props)
    assert read_jdbc(spark, url, "nation_dw2", props).count() == 13
    write_jdbc_upsert(spark, nation, url, "nation_dw2", ["n_nationkey"], props)
    merged = read_jdbc(spark, url, "nation_dw2", props)
    assert merged.count() == 25
    assert merged.select("n_nationkey").distinct().count() == 25  # no dupes
    write_jdbc_upsert(spark, nation, url, "nation_dw2", ["n_nationkey"], props)
    assert read_jdbc(spark, url, "nation_dw2", props).count() == 25


def test_merge_parquet_full_table(spark, tmp_path):
    """MERGE semantics on unpartitioned parquet: matched keys replaced,
    unmatched inserted, untouched rows survive the staging swap."""
    from nyc_taxi_etl_dashboard_spark.sources.writers import merge_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id int, tag string, v double"
    )
    counts = merge_parquet(spark, path, base, keys=["id"])
    assert counts == {"inserted_or_updated": 3, "kept": 0}
    src = spark.createDataFrame(
        [(2, "B2", 22.0), (4, "d", 40.0)], "id int, tag string, v double"
    )
    counts = merge_parquet(spark, path, src, keys=["id"])
    assert counts == {"inserted_or_updated": 2, "kept": 2}
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == [(1, "a", 10.0), (2, "B2", 22.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_merge_parquet_partition_scoped(spark, tmp_path):
    """Partitioned MERGE rewrites ONLY churned partitions (dynamic
    partition overwrite): the untouched partition's data files survive
    byte-identical."""
    import glob

    from nyc_taxi_etl_dashboard_spark.sources.writers import merge_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0), (3, "2024-01-02", 30.0)],
        "id int, d string, v double",
    )
    merge_parquet(spark, path, base, keys=["id"], partition_by=["d"])
    untouched_before = sorted(glob.glob(f"{path}/d=2024-01-02/*.parquet"))
    src = spark.createDataFrame([(2, "2024-01-01", 22.0)], "id int, d string, v double")
    counts = merge_parquet(spark, path, src, keys=["id"], partition_by=["d"])
    assert counts == {"inserted_or_updated": 1, "kept": 1}
    got = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    assert got == [(1, 10.0), (2, 22.0), (3, 30.0)]
    untouched_after = sorted(glob.glob(f"{path}/d=2024-01-02/*.parquet"))
    assert untouched_before == untouched_after  # partition not rewritten


def test_merge_parquet_key_partition_migration(spark, tmp_path):
    """A matched key whose source row lands in a DIFFERENT partition
    than its target row must not leave the stale row behind: the
    affected-partition set includes partitions of target rows matching
    source keys, so the old partition is rewritten and the key stays
    unique."""
    from nyc_taxi_etl_dashboard_spark.sources.writers import merge_parquet

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0)],
        "id int, d string, v double",
    )
    merge_parquet(spark, path, base, keys=["id"], partition_by=["d"])
    # key 1 migrates from d=2024-01-01 to d=2024-01-03
    src = spark.createDataFrame([(1, "2024-01-03", 11.0)], "id int, d string, v double")
    merge_parquet(spark, path, src, keys=["id"], partition_by=["d"])
    got = sorted(
        map(
            tuple,
            spark.read.parquet(path)
            # partition-dir inference reads d back as DATE; normalize
            .select("id", F.col("d").cast("string").alias("d"), "v")
            .collect(),
        )
    )
    assert got == [(1, "2024-01-03", 11.0), (2, "2024-01-02", 20.0)]


def test_cluster_by_writes_disjoint_ranges(spark, sf_dir, tmp_path):
    """cluster_by lays files out as disjoint sorted ranges: parquet
    row-group min/max stats must form non-overlapping intervals (the
    property scan-time range-predicate skipping relies on), unlike the
    default layout where ranges overlap."""
    import glob

    import pyarrow.parquet as pq

    from nyc_taxi_etl_dashboard_spark.sources import read_table
    from nyc_taxi_etl_dashboard_spark.sources.writers import write_parquet

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")

    def ranges(path):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(1)  # l_extendedprice
                out.append((col.statistics.min, col.statistics.max))
        return sorted(out)

    clustered = str(tmp_path / "clustered")
    write_parquet(
        li.repartition(8), clustered, cluster_by=["l_extendedprice"], cluster_partitions=8
    )
    plain = str(tmp_path / "plain")
    write_parquet(li.repartition(8), plain)

    cr = ranges(clustered)
    assert len(cr) >= 2, "need multiple files/row-groups to show disjointness"
    for (lo1, hi1), (lo2, hi2) in zip(cr, cr[1:]):
        assert hi1 <= lo2, f"clustered ranges overlap: {(lo1, hi1)} vs {(lo2, hi2)}"
    pr = ranges(plain)
    overlaps = sum(1 for (l1, h1), (l2, h2) in zip(pr, pr[1:]) if h1 > l2)
    assert overlaps > 0, "default layout unexpectedly disjoint — test fixture too small?"


def test_zorder_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Morton layout tightens file min/max stats on EVERY participating
    column: a bottom-10% range box must skip files on BOTH dims, while
    single-key range clustering serves only its sort key (all files
    overlap the box on the other dim). Measured at sf0.001: zorder hits
    4/8 (price) and 3/8 (qty); range-cluster hits 1/8 and 8/8."""
    import glob

    import pyarrow.parquet as pq

    from nyc_taxi_etl_dashboard_spark.sources import read_table
    from nyc_taxi_etl_dashboard_spark.sources.writers import write_parquet

    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice", "l_quantity")

    def hit_count(path, colidx):
        ranges = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(colidx).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            ranges.append((lo, hi))
        gmin, gmax = min(r[0] for r in ranges), max(r[1] for r in ranges)
        box_hi = gmin + (gmax - gmin) * 0.1
        return sum(1 for lo, hi in ranges if lo <= box_hi), len(ranges)

    zp, cp = str(tmp_path / "z"), str(tmp_path / "c")
    write_parquet(
        li.repartition(8), zp,
        zorder_by=["l_extendedprice", "l_quantity"], cluster_partitions=8,
    )
    write_parquet(
        li.repartition(8), cp, cluster_by=["l_extendedprice"], cluster_partitions=8
    )
    for colidx in (0, 1):
        hit, n = hit_count(zp, colidx)
        assert n == 8
        # 4-5 of 8 depending on range-sampler boundaries; the property
        # is that BOTH dims skip a meaningful share of files
        assert hit <= 5, f"zorder dim {colidx}: {hit}/{n} files hit"
    hit_price, _ = hit_count(cp, 0)
    hit_qty, n = hit_count(cp, 1)
    assert hit_price <= 2  # the sort key skips hard...
    assert hit_qty == n  # ...but the other dimension gets nothing


def test_python_datasource_synthetic_events(spark):
    """Spark-4 Python DataSource: partition-parallel deterministic
    generation — same (seed, numRows) => identical data regardless of
    partitioning (task retries and different parallelism agree), schema
    interoperates with the events queries."""
    from nyc_taxi_etl_dashboard_spark.sources import pydatasource

    pydatasource.register(spark)

    def load(parts):
        return (
            spark.read.format("synthetic_events")
            .option("numRows", 200)
            .option("numPartitions", parts)
            .option("seed", 7)
            .load()
        )

    df = load(4)
    assert df.rdd.getNumPartitions() == 4
    rows4 = sorted(tuple(r) for r in df.collect())
    rows2 = sorted(tuple(r) for r in load(2).collect())
    assert len(rows4) == 200
    assert rows4 == rows2  # partitioning-invariant content
    assert {r[3] for r in rows4} <= set(pydatasource.EVENT_TYPES)
    # generated stream slots into the existing event operators
    from pyspark.sql import functions as F

    agg = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r.n for r in agg) == 200


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """Additive schema evolution: files written before a column existed
    read back with nulls for it; content of both eras preserved."""
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.sources import read_table
    from nyc_taxi_etl_dashboard_spark.sources.readers import read_parquet_evolving

    path = str(tmp_path / "evolving")
    old = read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    old.write.parquet(path)
    new = read_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name", F.lit("v2").alias("era")
    )
    new.write.mode("append").parquet(path)
    merged = read_parquet_evolving(spark, path)
    assert set(merged.columns) == {"r_regionkey", "r_name", "era"}
    assert merged.count() == old.count() * 2
    assert merged.filter(F.col("era").isNull()).count() == old.count()
    assert merged.filter(F.col("era") == "v2").count() == old.count()


def test_compact_parquet_preserves_content(spark, sf_dir, tmp_path):
    """Compaction collapses a sprawl of tiny files without changing a
    row; output file count is sized from actual bytes."""
    from nyc_taxi_etl_dashboard_spark.sources import read_table
    from nyc_taxi_etl_dashboard_spark.sources.writers import compact_parquet

    path = str(tmp_path / "sprawl")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    li.repartition(40).write.parquet(path)  # simulate streaming sprawl
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["files_before"] >= 40
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 1  # tiny fixture -> one right-sized file
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before


def test_postgres_dialect_ddl_and_type_mapping(spark):
    """The Derby↔Postgres seam, pinned by code instead of prose
    (VERDICT r13 item 7). Two layers: (a) the DEPLOYMENT DDL
    `create_star_schema_sql("postgres")` carries the reference's types
    and CHECK/UNIQUE/REFERENCES backstops (load.py:19-59) with
    engine-minted BIGINT keys (no SERIAL — no sequence semantics differ
    between test and prod); (b) the column types Spark's own
    PostgresDialect / DerbyDialect choose for the JDBC writer's
    DataFrame schema — the actual mapping the S8 append rides — match
    the documented pairs, so a Spark upgrade that changes the mapping
    fails here, not in production."""
    from nyc_taxi_etl_dashboard_spark.sources.writers import create_star_schema_sql

    pg = "\n".join(create_star_schema_sql("postgres"))
    assert "SERIAL" not in pg  # keys are engine-minted on every backend
    for frag in (
        "time_pk BIGINT PRIMARY KEY",
        "hour SMALLINT NOT NULL CHECK (hour BETWEEN 0 AND 23)",
        "borough VARCHAR(50) NOT NULL DEFAULT 'Inconnu'",
        "payment_type VARCHAR(20) UNIQUE NOT NULL",
        "REFERENCES dim_location(location_pk)",
        "trip_distance NUMERIC(8,2) CHECK (trip_distance > 0)",
    ):
        assert frag in pg, frag
    # spark-dialect DDL unchanged and CHECK-free (engine-side quarantine)
    sp = "\n".join(create_star_schema_sql())
    assert "USING PARQUET" in sp and "CHECK" not in sp
    import pytest as _pytest

    with _pytest.raises(ValueError):
        create_star_schema_sql("oracle")

    # (b) the JDBC writer's dialect-chosen column types, no server needed
    jvm = spark._jvm
    T = jvm.org.apache.spark.sql.types.DataTypes

    def mapping(url):
        d = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(url)
        out = {}
        for name, dt in (
            ("string", T.StringType),
            ("double", T.DoubleType),
            ("short", T.ShortType),
            ("decimal", T.createDecimalType(8, 2)),
        ):
            opt = d.getJDBCType(dt)
            out[name] = (
                opt.get().databaseTypeDefinition() if not opt.isEmpty() else None
            )
        return out

    pg_map = mapping("jdbc:postgresql://host/db")
    assert pg_map == {
        "string": "TEXT",
        "double": "FLOAT8",  # Postgres alias of DOUBLE PRECISION
        "short": "SMALLINT",
        "decimal": "NUMERIC(8,2)",
    }
    derby_map = mapping("jdbc:derby:memory:x")
    assert derby_map == {
        "string": "CLOB",
        "double": None,  # dialect defers to Spark's generic DOUBLE
        "short": "SMALLINT",
        "decimal": "DECIMAL(8,2)",
    }


def test_compact_parquet_preserves_hive_partitioning(spark, tmp_path):
    """Compacting a batch_id-partitioned state warehouse must keep the
    col=value directory layout — a flat rewrite would strand plain
    part-files next to partition dirs and Spark's partition discovery
    rejects the mix, breaking every later partition-scoped merge."""
    import os

    from nyc_taxi_etl_dashboard_spark.sources.writers import (
        compact_parquet,
        merge_parquet,
    )

    path = str(tmp_path / "state")
    for b in range(4):  # four batches of sprawl, several files each
        rows = spark.createDataFrame(
            [(f"tok{b}_{i}", b, i) for i in range(50)],
            "token string, batch_id int, cnt long",
        )
        rows.repartition(5).write.mode("append").partitionBy("batch_id").parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["files_after"] < stats["files_before"]
    # layout preserved: batch_id= dirs, no stray flat part-files
    entries = os.listdir(path)
    assert sorted(d for d in entries if d.startswith("batch_id=")) == [
        f"batch_id={b}" for b in range(4)
    ]
    assert not any(e.endswith(".parquet") for e in entries)
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before
    # and a partition-scoped merge still lands cleanly afterward
    inc = spark.createDataFrame(
        [(f"tok9_{i}", 9, i) for i in range(10)],
        "token string, batch_id int, cnt long",
    )
    merge_parquet(
        spark, path, inc, ["token", "batch_id"],
        partition_by=["batch_id"], stable_partition_keys=True,
    )
    got = spark.read.parquet(path)
    assert got.count() == 4 * 50 + 10
    assert got.filter(F.col("batch_id") == 9).count() == 10


def test_staging_name_bounded_and_deterministic():
    """Staging identifiers stay within PostgreSQL's 63-byte NAMEDATALEN
    (silent truncation there would let two long-named targets collide);
    past the limit the name collapses to a deterministic hash form so
    the retry-with-stable-run_id contract survives (ADVICE r14)."""
    from nyc_taxi_etl_dashboard_spark.sources.writers import _staging_name

    # short names keep the readable <table>_staging_<run_id> form
    assert _staging_name("Fact_Trips", "r1") == "Fact_Trips_staging_r1"
    long_table = "analytics_" + "x" * 60
    a = _staging_name(long_table, "retry_run")
    b = _staging_name(long_table, "retry_run")
    c = _staging_name(long_table, "other_run")
    d = _staging_name(long_table + "y", "retry_run")
    assert a == b, "same (table, run_id) must reuse the same staging name"
    assert len({a, c, d}) == 3, "distinct inputs must not collide"
    for name in (a, c, d):
        assert len(name) <= 63 and name.startswith("stg_")


def test_upsert_pushdown_sql_pinned():
    """S9 pushdown (VERDICT r12 item 4): the emitted single-round-trip
    statements are pinned VERBATIM — no Postgres server exists here, so
    the SQL string is the contract."""
    from nyc_taxi_etl_dashboard_spark.sources.writers import upsert_pushdown_sql

    stmts = upsert_pushdown_sql(
        "fact_trips", "fact_trips_staging",
        ["trip_id", "fare_amount"], ["trip_id"],
    )
    assert stmts == [
        'INSERT INTO fact_trips ("trip_id", "fare_amount") '
        'SELECT "trip_id", "fare_amount" FROM fact_trips_staging '
        'ON CONFLICT ("trip_id") DO NOTHING',
        "DROP TABLE fact_trips_staging",
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        upsert_pushdown_sql("t", "s", ["a"], ["a"], dialect="derby")
    # COLUMN identifiers are quoted (ADVICE r13): mixed-case and
    # reserved-word columns survive (Spark's JDBC writer creates the
    # staging columns quoted, so quoting here matches the staged DDL);
    # embedded quotes are doubled, control chars raise. TABLE names
    # pass VERBATIM (the writer interpolates the staging name unquoted
    # into its CREATE TABLE, so the database case-folds it — quoting
    # here would reference a different relation for mixed-case names)
    # but are validated against a safe-table-reference pattern,
    # including schema qualification.
    mixed = upsert_pushdown_sql(
        "analytics.Fact_Trips", "Fact_Trips_staging_r1", ['we"ird', "select"], ["select"]
    )
    assert mixed[0] == (
        'INSERT INTO analytics.Fact_Trips ("we""ird", "select") '
        'SELECT "we""ird", "select" FROM Fact_Trips_staging_r1 '
        'ON CONFLICT ("select") DO NOTHING'
    )
    for bad in ("t\n--", "t; DROP TABLE x", 't"t', "a.b.c", "ta ble"):
        with _pytest.raises(ValueError):
            upsert_pushdown_sql(bad, "s", ["a"], ["a"])
        with _pytest.raises(ValueError):
            upsert_pushdown_sql("t", bad, ["a"], ["a"])


def test_upsert_pushdown_sql_semantics_vs_anti_join(duck):
    """The emitted ON CONFLICT statements, executed by DuckDB (same
    dialect as Postgres for this construct), must produce EXACTLY the
    anti-join path's semantics: existing keys keep their original rows,
    fresh keys insert, reapplication is a no-op."""
    from nyc_taxi_etl_dashboard_spark.sources.writers import upsert_pushdown_sql

    con = duck.cursor()
    con.execute(
        "CREATE TABLE push_tgt (k INTEGER PRIMARY KEY, v VARCHAR)"
    )
    con.execute("INSERT INTO push_tgt VALUES (0,'old0'), (2,'old2'), (4,'old4')")
    con.execute("CREATE TABLE push_tgt_staging (k INTEGER, v VARCHAR)")
    con.execute(
        "INSERT INTO push_tgt_staging SELECT range, 'new' || range FROM range(6)"
    )
    for sql in upsert_pushdown_sql("push_tgt", "push_tgt_staging", ["k", "v"], ["k"]):
        con.execute(sql)
    got = con.execute("SELECT k, v FROM push_tgt ORDER BY k").fetchall()
    # anti-join semantics: 0/2/4 keep their ORIGINAL rows; 1/3/5 insert
    assert got == [
        (0, "old0"), (1, "new1"), (2, "old2"),
        (3, "new3"), (4, "old4"), (5, "new5"),
    ]
    # staging dropped by the transaction's second statement
    assert con.execute(
        "SELECT count(*) FROM information_schema.tables WHERE table_name='push_tgt_staging'"
    ).fetchone()[0] == 0
    # idempotent reapply: full-overlap staging inserts nothing
    con.execute("CREATE TABLE push_tgt_staging AS SELECT k, 'again' || k AS v FROM push_tgt")
    for sql in upsert_pushdown_sql("push_tgt", "push_tgt_staging", ["k", "v"], ["k"]):
        con.execute(sql)
    assert con.execute("SELECT k, v FROM push_tgt ORDER BY k").fetchall() == got


def test_execute_jdbc_transaction_atomic_on_derby(spark, tmp_path):
    """The driver-side transaction runner over a REAL JDBC boundary
    (embedded Derby): multi-statement commit lands atomically, and a
    failing statement rolls back everything before it."""
    import pytest as _pytest

    from nyc_taxi_etl_dashboard_spark.sources.readers import read_jdbc
    from nyc_taxi_etl_dashboard_spark.sources.writers import execute_jdbc_transaction

    url = f"jdbc:derby:{tmp_path}/txdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    execute_jdbc_transaction(
        spark, url,
        [
            "CREATE TABLE tx_demo (k INT PRIMARY KEY, v VARCHAR(10))",
            "INSERT INTO tx_demo VALUES (1, 'a')",
            "INSERT INTO tx_demo VALUES (2, 'b')",
        ],
        props,
    )
    assert read_jdbc(spark, url, "tx_demo", props).count() == 2
    # second tx: a valid insert followed by a PK violation -> NOTHING of
    # the tx survives (the anti-join form cannot make this guarantee)
    with _pytest.raises(Exception):
        execute_jdbc_transaction(
            spark, url,
            ["INSERT INTO tx_demo VALUES (3, 'c')",
             "INSERT INTO tx_demo VALUES (1, 'dup')"],
            props,
        )
    got = sorted(
        map(tuple, read_jdbc(spark, url, "tx_demo", props).collect())
    )
    assert got == [(1, "a"), (2, "b")]


def test_write_jdbc_upsert_pushdown_stages_and_requires_on_conflict(spark, tmp_path):
    """write_jdbc_upsert_pushdown end-to-end up to the dialect boundary:
    the staging write lands over real JDBC (Derby), and the pushdown
    transaction then fails on Derby's missing ON CONFLICT support with
    the staging table still present (nothing half-applied to the
    target) — the documented reason the anti-join form stays the
    default for non-Postgres URLs."""
    import pytest as _pytest

    from nyc_taxi_etl_dashboard_spark.sources.readers import read_jdbc
    from nyc_taxi_etl_dashboard_spark.sources.writers import (
        execute_jdbc_transaction,
        write_jdbc_upsert_pushdown,
    )

    url = f"jdbc:derby:{tmp_path}/pddb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    execute_jdbc_transaction(
        spark, url,
        ["CREATE TABLE tgt (k INT PRIMARY KEY, v VARCHAR(10))",
         "INSERT INTO tgt VALUES (1, 'old')"],
        props,
    )
    df = spark.createDataFrame([(1, "new"), (2, "b")], "k int, v string")
    # unsafe run_id rejected BEFORE any staging write (it names a table
    # in unquoted DDL)
    with _pytest.raises(ValueError):
        write_jdbc_upsert_pushdown(
            spark, df, url, "tgt", ["k"], props, run_id="2026-08-15 batch#1"
        )
    with _pytest.raises(Exception):
        write_jdbc_upsert_pushdown(
            spark, df, url, "tgt", ["k"], props, run_id="r14test"
        )
    # target untouched, staging table present with the full frame under
    # the caller-supplied per-invocation name (ADVICE r13)
    assert sorted(
        map(tuple, read_jdbc(spark, url, "tgt", props).collect())
    ) == [(1, "old")]
    assert read_jdbc(spark, url, "tgt_staging_r14test", props).count() == 2


def test_concurrent_upserts_distinct_run_ids_no_clobber(spark, tmp_path):
    """VERDICT r14 item 5: prove the per-invocation run_id staging fix's
    concurrency claim (writers.py docstring) instead of asserting it.
    Two threads upsert DIFFERENT frames into the SAME Derby target with
    distinct run_ids, truly concurrently.

    Leg 1 — staging isolation: Derby lacks ON CONFLICT, so the real
    function's pushdown transaction fails at the dialect boundary with
    staging intact (the pinned failure semantics) — which lets us
    inspect both staged tables: each must hold exactly ITS OWN frame
    (the r13 bug — a shared `<table>_staging` + mode=overwrite — made
    one thread's stage clobber the other's), and the target untouched.

    Leg 2 — both commit: the same two staged tables then flow through
    the same single-transaction shape in Derby's dialect (MERGE INTO =
    its ON CONFLICT DO NOTHING), still one thread each, concurrently:
    both transactions commit, the target ends with the union minus key
    conflicts, and neither staging table survives (no orphans)."""
    import threading

    import pytest as _pytest

    from nyc_taxi_etl_dashboard_spark.sources.readers import read_jdbc
    from nyc_taxi_etl_dashboard_spark.sources.writers import (
        execute_jdbc_transaction,
        write_jdbc_upsert_pushdown,
    )

    url = f"jdbc:derby:{tmp_path}/ccdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    execute_jdbc_transaction(
        spark, url,
        ["CREATE TABLE tgt (k INT PRIMARY KEY, v VARCHAR(10))",
         "INSERT INTO tgt VALUES (0, 'seed')"],
        props,
    )
    frames = {
        "a": spark.createDataFrame([(1, "a1"), (2, "a2")], "k int, v string"),
        "b": spark.createDataFrame([(3, "b3"), (0, "dup")], "k int, v string"),
    }
    errs: dict[str, Exception] = {}

    def upsert(tag: str) -> None:
        try:
            write_jdbc_upsert_pushdown(
                spark, frames[tag], url, "tgt", ["k"], props, run_id=f"cc_{tag}"
            )
        except Exception as exc:  # noqa: BLE001 - asserted below
            errs[tag] = exc

    threads = [threading.Thread(target=upsert, args=(t,)) for t in frames]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # both hit the Derby dialect boundary (ON CONFLICT unsupported) ...
    assert set(errs) == {"a", "b"}
    # ... with each staging table holding exactly its own frame
    assert sorted(
        map(tuple, read_jdbc(spark, url, "tgt_staging_cc_a", props).collect())
    ) == [(1, "a1"), (2, "a2")]
    assert sorted(
        map(tuple, read_jdbc(spark, url, "tgt_staging_cc_b", props).collect())
    ) == [(0, "dup"), (3, "b3")]
    # and the target untouched
    assert sorted(map(tuple, read_jdbc(spark, url, "tgt", props).collect())) == [
        (0, "seed")
    ]

    merge_errs: dict[str, Exception] = {}

    def merge(tag: str) -> None:
        stg = f"tgt_staging_cc_{tag}"
        try:
            execute_jdbc_transaction(
                spark, url,
                [
                    # staging columns are quoted-lowercase (Spark's JDBC
                    # writer quotes identifiers — the same reason
                    # upsert_pushdown_sql quotes every column)
                    f'MERGE INTO tgt t USING {stg} s ON t.k = s."k" '
                    'WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s."k", s."v")',
                    f"DROP TABLE {stg}",
                ],
                props,
            )
        except Exception as exc:  # noqa: BLE001 - asserted below
            merge_errs[tag] = exc

    threads = [threading.Thread(target=merge, args=(t,)) for t in frames]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not merge_errs, merge_errs
    assert sorted(map(tuple, read_jdbc(spark, url, "tgt", props).collect())) == [
        (0, "seed"), (1, "a1"), (2, "a2"), (3, "b3")
    ]
    # no orphan staging: both tables dropped inside their transactions
    for tag in frames:
        with _pytest.raises(Exception):
            read_jdbc(spark, url, f"tgt_staging_cc_{tag}", props).schema
