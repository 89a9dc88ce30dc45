from tl_spark.kernel.htmlparse import (  # noqa: F401
    parse,
    TlDom,
    Attrs,
    KIND_TAG,
    KIND_RAW,
    KIND_COMMENT,
)
from tl_spark.kernel.selector import parse_selector, selector_matches  # noqa: F401
