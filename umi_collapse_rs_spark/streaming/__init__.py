from umi_collapse_rs_spark.streaming.incremental import (  # noqa: F401
    incremental_sink,
    start_incremental_stream,
)
from umi_collapse_rs_spark.streaming.ingest import (  # noqa: F401
    stream_pages,
    streaming_exact_dedup,
    streaming_page_stats,
)
