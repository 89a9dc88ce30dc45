from tl_spark.streaming.extract_stream import (  # noqa: F401
    run_streaming_extraction,
    streaming_turn_counts,
)
