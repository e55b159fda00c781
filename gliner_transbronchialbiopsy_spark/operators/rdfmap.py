"""Declarative relational-to-RDF mapping — the R2RML/direct-mapping
core (W3C R2RML, Sequeda et al. WWW'12 direct mapping): a TableMapping
states how one DataFrame becomes (subj, pred, obj) triples — a
subject IRI template over row columns, a predicate->column map, an
optional rdf:type assertion — and ``map_table`` compiles it to ONE
projection + explode (no joins, no Python), so mapping a 100 TB fact
table is a single scan. ``map_tables`` unions several mappings into
one graph (plan-level concatenation).

This is the missing front door of the KG pipeline: the NER path
builds triples from TEXT; this builds them from STRUCTURED tables
(the reference's Excel gold annotations and training logs are exactly
such tables — sources/corpus.py reads them; a mapping turns them into
the same graph the text path feeds).

Semantics:
- the subject template renders '{col}' placeholders per row
  (constants between placeholders pass through verbatim);
- each (pred, column) pair emits one triple per row; NULL objects
  emit NOTHING (RDF has no nulls — the property is simply absent),
  matching the direct-mapping spec;
- subject_class adds (subj, 'rdf:type', class) per row;
- objects are cast to string; a ref_template value renders an IRI
  from the row instead (foreign-key references — the join the graph
  encodes so queries don't have to).

Distributed shape: one scan per mapped table; each row explodes into
at most (len(predicates)+1) triple rows via an array literal — a
narrow transformation with zero shuffle. Output order/partitioning
follows the scan; downstream dedup/layout is the triples snapshot
writer's job (sources/checkpoint.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PLACEHOLDER = re.compile(r"\{([^{}]+)\}")


def render_template(template: str) -> Column:
    """'{col}' template -> one concat Column (pure projection)."""
    parts: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        parts.append(F.col(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        raise ValueError("empty subject template")
    return F.concat(*parts)


@dataclass(frozen=True)
class ObjRef:
    """Object rendered as an IRI template (foreign-key reference)."""

    template: str


@dataclass(frozen=True)
class TableMapping:
    subject_template: str
    predicates: Mapping[str, object]  # pred -> column name | ObjRef
    subject_class: str | None = None

    def __post_init__(self):
        if not self.predicates and self.subject_class is None:
            raise ValueError("mapping emits no triples")


def map_table(df: DataFrame, mapping: TableMapping) -> DataFrame:
    """-> (subj, pred, obj) triples for one mapped table."""
    subj = render_template(mapping.subject_template).alias("_subj")
    entries = []
    if mapping.subject_class is not None:
        entries.append(
            F.struct(
                F.lit("rdf:type").alias("pred"),
                F.lit(mapping.subject_class).cast("string").alias("obj"),
            )
        )
    for pred, obj in mapping.predicates.items():
        if isinstance(obj, ObjRef):
            obj_col = render_template(obj.template)
        else:
            obj_col = F.col(obj).cast("string")
        entries.append(
            F.struct(F.lit(pred).alias("pred"), obj_col.alias("obj"))
        )
    return (
        df.select(subj, F.explode(F.array(*entries)).alias("_t"))
        .select(
            F.col("_subj").alias("subj"),
            F.col("_t.pred").alias("pred"),
            F.col("_t.obj").alias("obj"),
        )
        # NULL object = absent property; NULL subject (a NULL template
        # column) = no resource to describe — neither emits a triple
        .filter(F.col("obj").isNotNull() & F.col("subj").isNotNull())
    )


def map_tables(
    mapped: Sequence[tuple[DataFrame, TableMapping]]
) -> DataFrame:
    """Union several table mappings into one graph."""
    if not mapped:
        raise ValueError("no mappings")
    out = map_table(*mapped[0])
    for df, m in mapped[1:]:
        out = out.unionByName(map_table(df, m))
    return out
