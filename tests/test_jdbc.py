"""JDBC ingress/egress contract (Warehouse.read_jdbc / write_jdbc) —
the reference's literal entry boundary is Python→PostgreSQL over a DB
connection (python/import_data.py:60-92); these wrappers are the
engine's RDBMS plug point.

The round-trip test runs against the Derby embedded driver that ships
inside pyspark's jars (no server, no network); if a deployment strips
those jars the whole module skips cleanly instead of failing.
"""

from __future__ import annotations

import glob
import os

import pytest

import pyspark

_PYSPARK_JARS = os.path.join(os.path.dirname(pyspark.__file__), "jars")
_HAS_DERBY = bool(glob.glob(os.path.join(_PYSPARK_JARS, "derby-*.jar")))

pytestmark = pytest.mark.skipif(
    not _HAS_DERBY, reason="no JDBC driver jar (derby) on the classpath"
)

_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path, name):
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def test_jdbc_round_trip_unpartitioned(spark, tmp_path):
    from data_warehouse_project_spark.etl.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, f"name{i}", i * 1.5) for i in range(50)],
        "id bigint, name string, amount double",
    )
    url = _url(tmp_path, "db1")
    wh.write_jdbc(df, url, "t_round", mode="overwrite", driver=_DRIVER)
    back = wh.read_jdbc(url, "t_round", driver=_DRIVER)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jdbc_partitioned_read_covers_all_rows(spark, tmp_path):
    """Range-partitioned read: bounds shape the stride, they must NOT
    filter — rows outside [lower, upper] land in the edge partitions."""
    from data_warehouse_project_spark.etl.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id bigint, val string"
    )
    url = _url(tmp_path, "db2")
    wh.write_jdbc(df, url, "t_part", mode="overwrite", driver=_DRIVER)
    back = wh.read_jdbc(
        url,
        "t_part",
        partition_column="id",
        lower_bound=20,  # deliberately inside the data range
        upper_bound=80,
        num_partitions=4,
        driver=_DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted(r["id"] for r in back.collect()) == list(range(100))


def test_jdbc_write_caps_connections(spark, tmp_path):
    """num_partitions coalesces the writer so a wide frame doesn't open
    one connection per input partition."""
    from data_warehouse_project_spark.etl.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i,) for i in range(64)], "id bigint"
    ).repartition(16)
    url = _url(tmp_path, "db3")
    wh.write_jdbc(
        df, url, "t_cap", mode="overwrite", num_partitions=2, driver=_DRIVER
    )
    back = wh.read_jdbc(url, "t_cap", driver=_DRIVER)
    assert back.count() == 64


def test_jdbc_partial_partition_options_rejected(spark, tmp_path):
    from data_warehouse_project_spark.etl.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="together"):
        wh.read_jdbc("jdbc:derby:unused", "t", partition_column="id")
