from pheknowlator_spark.webtext import (  # noqa: F401
    canonicalize,
    extract,
    linking,
    mentions,
    pipeline,
)
