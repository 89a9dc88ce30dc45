from tl_spark.streaming.extract_stream import (  # noqa: F401
    run_streaming_extraction,
    streaming_turn_counts,
)
from tl_spark.streaming.stateful import conversation_progress  # noqa: F401
