from tl_spark.functions.extract import (  # noqa: F401
    DEFAULT_STRIP_TAGS,
    EXTRACT_FIELDS,
    extract_main_content,
)
