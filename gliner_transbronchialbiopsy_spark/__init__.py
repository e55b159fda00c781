"""gliner_transbronchialbiopsy_spark — a from-scratch, PySpark-native
knowledge-graph construction engine with the query/data-processing
capabilities of drci-foch/GLiner-TransbronchialBiopsy.

Architecture (see SURVEY.md):
  documents (repo, path, commit, lang, content)
    -> validate/filter            (Catalyst predicates)
    -> sectionize + normalize     (Arrow pandas UDF; reference
                                   src/streamlit/app/utils/text_processor.py)
    -> mention detection          (mapInPandas; reference
                                   src/streamlit/app/models/model_handler.py)
    -> overlap merge              (applyInPandas; reference
                                   src/streamlit/app/data/entity_processor.py:137-192)
    -> entity linking             (MinHash-LSH banded equi-join)
    -> canonicalization           (large-star/small-star connected components)
    -> triples                    (partitioned parquet with sha256 lineage)

Everything is DataFrame/Catalyst-first; Python only ever runs inside
Arrow-vectorized UDFs (no per-row Python in the hot path).
"""

__version__ = "0.1.0"
