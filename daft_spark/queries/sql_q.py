"""SQL-surface queries — the ``daft.sql`` parity path (reference:
``daft/sql/sql.py:77``, planner ``src/daft-sql/``; statement coverage
``src/daft-sql/src/statement.rs:13-107``: CTEs, joins, subqueries,
EXISTS/IN, HAVING, positional ORDER BY).

Each query here is ONE dialect-shared ANSI string executed through
``spark.sql`` (after temp-view registration) AND used verbatim as the
DuckDB oracle — the strongest possible SQL-frontend parity check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daft_spark.io.readers import register_views
from daft_spark.queries import register


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


def _shared(name: str, query: str):
    @register(name, query)
    def runner(spark: SparkSession, sf_dir: str, _q=query) -> DataFrame:
        return _sql(spark, sf_dir, _q)

    runner.__doc__ = f"Shared-dialect SQL: {name}"
    return runner


_shared(
    "sql_cte_join",
    """
    WITH big_orders AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_totalprice > 200000
    ),
    cust AS (
      SELECT c_custkey, c_name, c_mktsegment FROM customer
    )
    SELECT c_mktsegment, count(*) AS n, sum(o_totalprice) AS total
    FROM big_orders JOIN cust ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)

_shared(
    "sql_exists_subquery",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey AND l_quantity > 49
    )
    ORDER BY s_suppkey
    """,
)

_shared(
    "sql_in_subquery",
    """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    )
    ORDER BY c_custkey
    """,
)

_shared(
    "sql_scalar_subquery",
    """
    SELECT n_name,
           (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
    FROM nation
    ORDER BY n_name
    """,
)

_shared(
    "sql_window_in_sql",
    """
    SELECT l_orderkey, l_linenumber,
           sum(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_price,
           rank() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS price_rank
    FROM lineitem
    WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
)

_shared(
    "sql_having_positional",
    """
    SELECT l_returnflag, count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    HAVING count(*) > 10
    ORDER BY 2 DESC, 1
    """,
)

_shared(
    "sql_case_cast_union",
    """
    SELECT kind, CAST(sum(v) AS DOUBLE) AS total FROM (
      SELECT CASE WHEN o_totalprice > 250000 THEN 'large' ELSE 'small' END AS kind,
             o_totalprice AS v
      FROM orders
      UNION ALL
      SELECT 'lineitem' AS kind, l_extendedprice AS v
      FROM lineitem WHERE l_orderkey < 100
    ) u
    GROUP BY kind
    ORDER BY kind
    """,
)

_shared(
    "sql_grouping_sets",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           sum(l_quantity) AS q, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
    ORDER BY rf, ls
    """,
)

_shared(
    "sql_not_in_anti",
    """
    SELECT count(*) AS n_without_orders
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)


@register(
    "sql_table_function",
    """
    SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_nation
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table function in FROM position (reference
    src/daft-sql/src/table_provider/, tests/sql/test_sql_table_functions.py):
    daft_spark.sql rewrites read_parquet('...') into a reader-backed temp
    view. The oracle reads the same table through DuckDB's registered
    view — identical rows prove the table-function path."""
    from daft_spark.sql import sql as dsql

    return dsql(
        f"""
        SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_nation
        FROM read_parquet('{sf_dir}/nation.parquet')
        GROUP BY n_regionkey
        ORDER BY n_regionkey
        """,
        spark=spark,
    )


@register(
    "sql_expr_battery",
    """
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_totalprice * 0.9 AS DOUBLE) AS discounted,
           CASE WHEN o_orderstatus = 'F' THEN 'final' ELSE 'open' END AS status_label,
           CAST(year(o_orderdate) AS INT) AS yr
    FROM orders
    WHERE o_orderkey < 400
    ORDER BY o_orderkey
    """,
)
def sql_expr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sql_expr(): scalar SQL snippets parsed to Columns and mixed into
    a DataFrame plan (reference daft.sql.sql_expr) — each expression is
    restated in the oracle."""
    from pyspark.sql import functions as F

    from daft_spark.io.readers import load_table
    from daft_spark.sql import sql_expr

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return o.select(
        F.col("o_orderkey"),
        sql_expr("CAST(o_totalprice * 0.9 AS DOUBLE)").alias("discounted"),
        sql_expr("CASE WHEN o_orderstatus = 'F' THEN 'final' ELSE 'open' END").alias(
            "status_label"
        ),
        sql_expr("CAST(year(o_orderdate) AS INT)").alias("yr"),
    ).orderBy("o_orderkey")


@register(
    "sql_session_catalog",
    """
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def sql_session_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session/Catalog surface end-to-end (reference daft/session.py:86,
    attach surface :176-404): attach_table two parquet-backed tables
    under ALIASED names, then run session.sql over the attached names —
    resolution goes through the session's temp-table registry, not
    pre-registered global views. The oracle restates the join over the
    raw tables."""
    from daft_spark.io.readers import load_table
    from daft_spark.session import Session

    sess = Session(spark)
    sess.attach_table(load_table(spark, sf_dir, "customer"), alias="cust_att")
    sess.attach_table(load_table(spark, sf_dir, "nation"), alias="nat_att")
    try:
        return sess.sql(
            """
            SELECT n_name,
                   count(*) AS n_customers,
                   round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS total_bal
            FROM cust_att JOIN nat_att ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
            """
        )
    finally:
        sess.detach_table("cust_att")
        sess.detach_table("nat_att")


@register(
    "sql_rest_catalog",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
    FROM orders WHERE o_orderkey < 2000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def sql_rest_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg REST catalog protocol end-to-end (reference
    daft/catalog/__iceberg.py; wire contract apache/iceberg
    rest-catalog-open-api.yaml): an in-process HTTP server fronts a
    filesystem warehouse; Catalog.from_iceberg("http://...") performs
    the config handshake, createNamespace/createTable/loadTable all go
    over the wire, and the loaded table (metadata-location from the
    LoadTableResult) is read back through the pure-Python Iceberg scan
    and aggregated. The oracle restates the aggregate from the raw
    parquet — a protocol fault (lost table, stale metadata location)
    surfaces as a hash mismatch."""
    import shutil

    from daft_spark.io.iceberg_rest import IcebergRestCatalogServer
    from daft_spark.io.readers import load_table
    from daft_spark.session import Catalog, Session

    wh = os.path.join(
        "/tmp/daft_spark_rest_wh", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(wh, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).filter(F.col("o_orderkey") < 2000)
    with IcebergRestCatalogServer(wh) as srv:
        cat = Catalog.from_iceberg(srv.uri, name="restcat")
        cat.create_namespace("sales")
        cat.create_table("sales.orders_slice", o)
        if cat.list_tables() != ["sales.orders_slice"]:
            raise AssertionError(f"REST listTables wrong: {cat.list_tables()}")
        sess = Session(spark)
        sess.attach_catalog(cat, "restcat")
        back = cat.read_table("sales.orders_slice")
        return (
            back.groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("o_totalprice").cast("double"), 2).alias("total"),
            )
            .orderBy("o_orderstatus")
        )


@register(
    "sql_unity_catalog",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS balance
    FROM customer WHERE c_custkey < 1500
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def sql_unity_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OSS Unity Catalog REST protocol end-to-end (reference client
    daft/catalog/__unity/_client.py — /api/2.1/unity-catalog, paged
    catalogs/schemas/tables listing, tables/{full_name} retrieve,
    temporary-table-credentials before reading storage_location as
    Delta): an in-process bearer-token-authenticated server fronts a
    filesystem warehouse; Catalog.from_unity("http://...", token=...)
    creates catalog.schema namespaces and a MANAGED DELTA table over
    the wire, lists it back with a 1-row page size (forcing real
    next_page_token pagination), and reads it through the two-step
    retrieve + temp-credentials load. The oracle restates the aggregate
    from raw parquet — a protocol fault (lost table, wrong
    storage_location, auth bypass) surfaces as a hash mismatch."""
    import shutil

    from daft_spark.io.readers import load_table
    from daft_spark.io.unity_rest import UnityCatalogServer
    from daft_spark.session import Catalog

    wh = os.path.join(
        "/tmp/daft_spark_unity_wh", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(wh, ignore_errors=True)
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    ).filter(F.col("c_custkey") < 1500)
    with UnityCatalogServer(wh, token="s3cret") as srv:
        cat = Catalog.from_unity(srv.uri, token="s3cret", name="unitycat")
        cat.create_namespace("main.sales")
        cat.create_table("main.sales.cust_slice", c)
        # paged listing must reassemble the full identifier list
        if cat.list_tables("main.sales") != ["main.sales.cust_slice"]:
            raise AssertionError(f"Unity listTables wrong: {cat.list_tables()}")
        back = cat.read_table("main.sales.cust_slice")
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("c_acctbal").cast("double"), 2).alias("balance"),
            )
            .orderBy("c_mktsegment")
        )


@register(
    "sql_glue_catalog",
    """
    SELECT s_nationkey AS nation,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(s_acctbal) AS DOUBLE), 2) AS balance
    FROM supplier
    GROUP BY s_nationkey ORDER BY nation
    """,
)
def sql_glue_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AWS Glue Data Catalog protocol end-to-end (reference
    daft/catalog/__glue.py — boto3/botocore Glue client, table dispatch
    on Parameters.table_type=ICEBERG via metadata_location): the REAL
    AWS SDK core (botocore) signs requests with SigV4 against an
    in-process Glue server that VERIFIES every signature by recomputing
    it per the public SigV4 spec — a two-implementation cross-check of
    the auth path — and serves the AWS JSON 1.1 wire protocol
    (X-Amz-Target ops, __type error envelopes, NextToken pagination).
    Catalog.from_glue creates a database (warehouse LocationUri), an
    ICEBERG table under it, and reads it back through GetTable ->
    metadata_location -> the pure-Python Iceberg scan. The oracle
    restates the aggregate from raw parquet."""
    import shutil

    from daft_spark.io.glue_rest import GlueCatalogServer
    from daft_spark.io.readers import load_table
    from daft_spark.session import Catalog

    wh = os.path.join(
        "/tmp/daft_spark_glue_wh", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(wh, ignore_errors=True)
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    with GlueCatalogServer(wh) as srv:
        cat = Catalog.from_glue(
            "gluecat", endpoint_url=srv.uri,
            aws_access_key_id=srv.access_key,
            aws_secret_access_key=srv.secret_key,
        )
        cat.create_namespace("sales")
        cat.create_table("sales.suppliers", s)
        if cat.list_tables("sales") != ["sales.suppliers"]:
            raise AssertionError(f"Glue listTables wrong: {cat.list_tables()}")
        back = cat.read_table("sales.suppliers")
        return (
            back.groupBy("s_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("s_acctbal").cast("double"), 2).alias("balance"),
            )
            .orderBy("s_nationkey")
            .select(F.col("s_nationkey").alias("nation"), "n", "balance")
        )


@register(
    "sql_s3tables_catalog",
    """
    SELECT n_regionkey AS region,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY n_regionkey ORDER BY region
    """,
)
def sql_s3tables_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amazon S3 Tables protocol end-to-end (reference
    daft/catalog/__s3tables.py — botocore s3tables client bound to a
    table-bucket ARN): the REAL AWS SDK core signs REST-JSON requests
    (GET querystrings exercise SigV4 canonical-query sorting; the
    ARN-bearing path exercises the double-encoding rule) against an
    in-process server that verifies every signature and enforces the
    service's versionToken compare-and-swap on
    UpdateTableMetadataLocation. create_table runs the real commit
    flow: CreateTable(ICEBERG) -> write Iceberg metadata into the
    service-assigned warehouseLocation -> publish via
    UpdateTableMetadataLocation; the read walks metadataLocation with
    the pure-Python Iceberg scan. Oracle restates from raw parquet."""
    import shutil

    from daft_spark.io.readers import load_table
    from daft_spark.io.s3tables_rest import S3TablesCatalogServer
    from daft_spark.session import Catalog

    wh = os.path.join(
        "/tmp/daft_spark_s3t_wh", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(wh, ignore_errors=True)
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    with S3TablesCatalogServer(wh) as srv:
        cat = Catalog.from_s3tables(
            srv.bucket_arn, endpoint_url=srv.uri,
            aws_access_key_id=srv.access_key,
            aws_secret_access_key=srv.secret_key,
        )
        cat.create_namespace("geo")
        cat.create_table("geo.nations", n)
        if cat.list_tables("geo.n") != ["geo.nations"]:
            raise AssertionError(f"S3Tables listTables wrong: {cat.list_tables()}")
        back = cat.read_table("geo.nations")
        return (
            back.groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_nationkey").alias("key_sum"),
            )
            .orderBy("n_regionkey")
            .select(F.col("n_regionkey").alias("region"), "n", "key_sum")
        )


@register(
    "sql_paimon_catalog",
    """
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(p_retailprice) AS DOUBLE), 2) AS retail
    FROM part WHERE p_partkey <= 600
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def sql_paimon_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paimon filesystem-warehouse catalog end-to-end (reference
    Catalog.from_paimon, daft/catalog/__paimon.py — pypaimon's
    <wh>/<db>.db/<table> layout, which the reference's own file_io
    listing walks at :202-238): create_namespace + a PRIMARY-KEY table,
    upsert a slice through the Table handle (merge-on-read,
    latest-sequence-wins), then read back through catalog resolution.
    The upsert overwrites half the rows with their own values changed
    by 0 (p_retailprice + 0), so the merged result must equal the raw
    slice — the oracle restates it from raw parquet; a broken merge
    (dup keys, lost rows) breaks count and hash."""
    import shutil

    from daft_spark.io.readers import load_table
    from daft_spark.session import Catalog

    wh = os.path.join(
        "/tmp/daft_spark_paimon_wh", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(wh, ignore_errors=True)
    os.makedirs(wh)
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    ).filter(F.col("p_partkey") <= 600)
    cat = Catalog.from_paimon(wh, name="pmcat")
    cat.create_namespace("tpch")
    tbl = cat.create_table("tpch.parts", p, primary_key=["p_partkey"])
    # upsert: rewrite the even keys with identical values — exercises
    # the pk merge path without changing the expected result
    tbl.write(p.filter(F.col("p_partkey") % 2 == 0), "append")
    if cat.list_tables() != ["tpch.parts"]:
        raise AssertionError(f"Paimon listTables wrong: {cat.list_tables()}")
    if not tbl.is_primary_key_table or tbl.primary_keys != ["p_partkey"]:
        raise AssertionError("Paimon table introspection wrong")
    back = cat.read_table("tpch.parts")
    return (
        back.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("p_retailprice").cast("double"), 2).alias("retail"),
        )
        .orderBy("p_brand")
    )


@register(
    "sql_postgres_catalog",
    """
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def sql_postgres_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postgres catalog statement surface end-to-end (reference
    daft/catalog/__postgres.py:176-706 — CREATE SCHEMA / CREATE TABLE
    DDL, information_schema existence+listing+columns queries, SELECT *
    reads, sequential append): the exact SQL the reference composes via
    psycopg.sql runs over a DB-API factory against DuckDB's
    Postgres-dialect front end. Two tables are created and filled
    executor-side, re-read through information_schema-derived schemas,
    and joined. The oracle restates the join from raw parquet — a
    mistyped column (schema walk), lost rows (append), or misquoted
    identifier breaks the hash."""
    import duckdb
    import shutil

    from daft_spark.io.readers import load_table
    from daft_spark.session import Catalog

    dbdir = os.path.join(
        "/tmp/daft_spark_pg_wh", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(dbdir, ignore_errors=True)
    os.makedirs(dbdir)
    db = os.path.join(dbdir, "pg.duckdb")
    cat = Catalog.from_postgres(connect=lambda: duckdb.connect(db), name="pgcat")
    cat.create_namespace("tpch")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cat.create_table("tpch.nation", n)
    cat.create_table("tpch.region", r)
    if cat.list_tables("nation") != ["tpch.nation"]:
        raise AssertionError(f"Postgres listTables wrong: {cat.list_tables()}")
    ns = cat.table_schema("tpch.nation")
    if [f.name for f in ns.fields] != ["n_nationkey", "n_name", "n_regionkey"]:
        raise AssertionError(f"information_schema.columns walk wrong: {ns}")
    # the join scans both tables concurrently from separate Python
    # workers — DuckDB's cross-process concurrency contract is
    # read-only connections, so the read phase gets its own factory
    cat_ro = Catalog.from_postgres(
        connect=lambda: duckdb.connect(db, read_only=True), name="pgcat_ro"
    )
    nb = cat_ro.read_table("tpch.nation")
    rb = cat_ro.read_table("tpch.region")
    return (
        nb.join(rb, nb.n_regionkey == rb.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
        )
        .orderBy("r_name")
    )


@register(
    "sql_gravitino_catalog",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS balance
    FROM customer WHERE c_custkey <= 1200
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def sql_gravitino_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache Gravitino REST protocol end-to-end (reference
    daft/catalog/__gravitino/_client.py — GET routes under
    /api/metalakes/{ml}/..., identifier-list response shape, 1.0
    storageLocations resolved through default-location-name, the
    file:/ -> file:/// URL repair, simple-auth X-Gravitino-User
    header, ICEBERG format dispatch): an in-process server fronts a
    filesystem metalake holding an Iceberg table written by the
    pure-Python writer; Catalog.from_gravitino lists
    catalog/schema/table over the wire and reads the table back
    through the Iceberg scan. The oracle restates the aggregate from
    raw parquet — a protocol fault (wrong storageLocation, auth
    bypass, broken dispatch) surfaces as a hash mismatch."""
    import shutil

    from daft_spark.io.gravitino_rest import GravitinoServer
    from daft_spark.io.iceberg import write_iceberg_py
    from daft_spark.io.readers import load_table
    from daft_spark.session import Catalog

    root = os.path.join(
        "/tmp/daft_spark_grav_ml", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(root, ignore_errors=True)
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    ).filter(F.col("c_custkey") <= 1200)
    os.makedirs(os.path.join(root, "lake", "sales"))
    write_iceberg_py(c, os.path.join(root, "lake", "sales", "cust_slice"), mode="error")
    with GravitinoServer(root, "prod_ml", username="daft") as srv:
        cat = Catalog.from_gravitino(srv.uri, "prod_ml", username="daft")
        if cat.list_catalogs() != ["lake"]:
            raise AssertionError(f"Gravitino listCatalogs wrong: {cat.list_catalogs()}")
        if cat.list_tables("lake.sales") != ["lake.sales.cust_slice"]:
            raise AssertionError(f"Gravitino listTables wrong: {cat.list_tables()}")
        back = cat.read_table("lake.sales.cust_slice")
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("c_acctbal").cast("double"), 2).alias("balance"),
            )
            .orderBy("c_mktsegment")
        )
