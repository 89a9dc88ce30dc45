from tl_spark.plans.session import get_spark  # noqa: F401
