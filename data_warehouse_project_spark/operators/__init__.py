from data_warehouse_project_spark.operators.keys import (  # noqa: F401
    with_default_row,
    with_surrogate_keys,
)
from data_warehouse_project_spark.operators.scd import (  # noqa: F401
    scd1_upsert,
    scd2_apply,
)
