from tl_spark.sources.transcripts import (  # noqa: F401
    read_transcripts,
    synth_transcripts,
)
from tl_spark.sources.warc import (  # noqa: F401
    extract_warc_html,
    read_warc,
)
