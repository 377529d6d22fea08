from pheknowlator_spark.operators import (  # noqa: F401
    constructors,
    dedup,
    edge_list,
    graph_algos,
    metadata,
    multimodal,
    owl_filters,
    owlnets,
    similarity,
    stats,
)
