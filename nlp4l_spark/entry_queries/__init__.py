"""Registry of driver-facing queries + DuckDB oracles (SURVEY §2 surface).

Round-4 split of the former 20k-line monolithic ``entry_queries.py``
into domain modules (VERDICT r3 #8) — a pure refactor: the modules
execute in the original source order, each importing the cross-part
names it uses, and this package namespace is the union of all part
namespaces (later parts shadow earlier, exactly like the monolith), so
``from nlp4l_spark import entry_queries as eq`` keeps working for every
consumer, including underscore helpers (``eq._docs``, ``eq._ann_index``).
``REGISTRY`` / ``_DRIVER_ORDER`` / ``queries()`` / ``oracle_sql()`` are
assembled in ``registry.py`` (the final part) — the query/oracle
adjacency that makes the oracle discipline work is preserved inside
each domain module.

NOTE for monkeypatching in tests: functions resolve globals from their
DEFINING part module, so patch e.g.
``nlp4l_spark.entry_queries.es_pipeline_aggs.TRI_VOCAB``, not the
package attribute.
"""

from nlp4l_spark.entry_queries import (  # noqa: F401
    chatqc,
    core,
    dedup_ann,
    es_aggs,
    es_metric_aggs,
    es_pipeline_aggs,
    ja_unicode,
    multimodal,
    ops_records,
    panels,
    registry,
    search,
    search_ext,
    stats_tfidf,
    textqc,
    tpch,
)

# monolith-order namespace union: later parts shadow earlier ones
for _part in (
    core, search, search_ext, chatqc, ja_unicode, stats_tfidf, dedup_ann,
    textqc, multimodal, ops_records, es_aggs, es_metric_aggs, tpch,
    es_pipeline_aggs, panels, registry,
):
    globals().update(
        {
            _k: _v
            for _k, _v in vars(_part).items()
            if not _k.startswith("__")
        }
    )
del _part
