from data_warehouse_project_spark.etl.pipeline import run_full_etl  # noqa: F401
from data_warehouse_project_spark.etl.warehouse import Warehouse  # noqa: F401
