"""loongcollector_spark — a PySpark-native parse→enrich→route→aggregate engine.

A brand-new implementation (NOT a port) with the query/data-processing
capabilities of LoongCollector (Alibaba iLogtail's successor, reference
read-only at /root/reference): regex/grok/JSON parsing processors,
tag/dictmap enrichment, conditional multi-sink routing, group-and-count
aggregation — re-expressed as Catalyst-optimizable DataFrame plans over
columnar tables of multi-turn agent transcripts.

Design stance (see SURVEY.md §7):
  * DataFrame/SQL first; Catalyst does predicate pushdown/pruning.
  * Pandas (Arrow) UDFs only where built-ins can't express semantics
    (grok multi-pattern first-match, reference JSON-flatten dialect).
  * No per-row Python UDFs, no RDDs, no driver-side loops over data.
"""

__version__ = "0.1.0"
