from data_warehouse_project_spark.functions.scalars import (  # noqa: F401
    cents,
    currency_to_decimal,
    initcap_pg,
    money,
    split_part,
    to_date_mdy,
)
