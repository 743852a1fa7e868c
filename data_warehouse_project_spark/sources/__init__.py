from data_warehouse_project_spark.sources.csv import read_csv_with_encodings  # noqa: F401
from data_warehouse_project_spark.sources.multimodal import (  # noqa: F401
    extract_media_features,
    media_schema,
)
from data_warehouse_project_spark.sources.txcatalog import (  # noqa: F401
    TxCatalog,
    TxTransaction,
)
from data_warehouse_project_spark.sources.txtable import (  # noqa: F401
    TxConflictError,
    TxError,
    TxTable,
    TxVacuumedError,
)
from data_warehouse_project_spark.sources.txjoinview import (  # noqa: F401
    TxJoinAggView,
)
from data_warehouse_project_spark.sources.txview import TxAggView  # noqa: F401
