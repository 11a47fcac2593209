"""biomass_processing_pipeline_spark — a from-scratch PySpark-native
spatial-join + tiling engine with the query semantics of the reference
``andrewjoiner/biomass-processing-pipeline`` (see SURVEY.md).

Architecture (Spark-first, NOT a port):

- Everything is a DataFrame; geometry travels as WKT strings plus exploded
  bbox doubles plus a hierarchical Morton ``cell_id:long`` column so Catalyst
  can prune, push down, and pick join strategies on plain columns.
- Image bytes travel as ``BinaryType`` and are decoded only inside
  Arrow-batched pandas UDFs (``mapInPandas`` / ``applyInPandas``).
- Small polygon/code dictionaries are broadcast; large cell<->cell joins are
  shuffle (sort-merge) joins on the cell key; skewed cells are salted.
- Checkpoint/resume is a per-partition lineage table + anti-join.
"""

__version__ = "0.1.0"

from biomass_processing_pipeline_spark.session import get_spark  # noqa: F401
