from data_warehouse_project_spark.streaming.corpus import (  # noqa: F401
    curated_documents,
    neardup_ingest,
    source_ingest_stats,
)
from data_warehouse_project_spark.streaming.joins import (  # noqa: F401
    enriched_events_stream,
    paired_events_stream,
)
from data_warehouse_project_spark.streaming.windows import (  # noqa: F401
    cascade_ingest,
    sessionized_counts,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)
from data_warehouse_project_spark.streaming.txsink import (  # noqa: F401
    txcascade_ingest,
    txtable_ingest,
)
