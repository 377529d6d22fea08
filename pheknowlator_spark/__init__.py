"""pheknowlator_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the build semantics of callahantiff/PheKnowLator (pkt_kg 3.1.2)
as Spark DataFrame pipelines: config-driven edge-list derivation
(``operators.edge_list``), instance-/subclass-based triple construction
(``operators.constructors``), OWL-semantics filtering and OWL-NETS decoding
(``operators.owl_filters``, ``operators.owlnets``), iterative graph
algorithms (``operators.graph_algos``), webtext mention detection + entity
linking (``webtext``), and stage-checkpointed materialization with lineage
(``plans``).

Everything hot is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, broadcast selection and AQE skew handling; Python appears only in
Arrow-batched pandas UDFs (mention detection, OWL class-expression decode).
"""

__version__ = "0.1.0"

from pheknowlator_spark.session import get_spark  # noqa: F401
