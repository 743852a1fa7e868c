"""data_warehouse_project_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities of the reference warehouse
(jkiec/Data-Warehouse-Project, studied at /root/reference): a layered
medallion pipeline (staging -> 3NF -> dimensional star schema), SCD1/SCD2
dimension maintenance, incremental watermark fact loads, a generated date
dimension, and an analytics query surface — plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, streaming) the reference does not have.

Everything is expressed with the DataFrame / Spark SQL API so Catalyst
owns the physical plan; there are no RDDs and (almost) no Python UDFs.
"""

__version__ = "0.1.0"

from data_warehouse_project_spark.session import get_spark  # noqa: F401
