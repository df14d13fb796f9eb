from .pipeline import (  # noqa: F401
    event_time_windows,
    processing_time_counts_foreach_batch,
    run_pipeline_available_now,
    sensor_stream_from_files,
)
from .metrics import StreamingMetricsListener  # noqa: F401
