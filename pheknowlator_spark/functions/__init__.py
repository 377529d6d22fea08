from pheknowlator_spark.functions import rdf  # noqa: F401
