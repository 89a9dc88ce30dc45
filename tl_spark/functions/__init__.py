from tl_spark.functions.extract import (  # noqa: F401
    DEFAULT_STRIP_TAGS,
    EXTRACT_FIELDS,
    extract_main_content,
    parse_nodes,
)
from tl_spark.functions.query import (  # noqa: F401
    get_elements_by_class,
    get_elements_by_id,
    query_selector_extract,
)
