from tl_spark.sources.transcripts import (  # noqa: F401
    read_transcripts,
    synth_transcripts,
)
