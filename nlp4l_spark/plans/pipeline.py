"""Config-driven processor chains: the reference's job model rebuilt lazily.

Reference semantics: a job is a HOCON config listing processors that are
reflectively instantiated and folded over the Dictionary eagerly, one at a
time, with per-step status persisted
(/root/reference/app/org/nlp4l/framework/processors/ProcessorChain.scala:
65-111,273-307). The "IR" there is a List[Processor] with no optimizer.

Here a Pipeline is a list of named stages over DataFrames. Two upgrades the
reference can't have:
* laziness — the whole chain is ONE Catalyst plan; filters written in stage
  5 push down into the stage-1 scan (the reference materializes every
  intermediate in driver memory);
* optional per-stage checkpointing through IndexCatalog snapshots, which
  restores the reference's per-run persistence/replay semantics when you
  want it (resume = skip committed stages).

The stage registry plays the role of the reflective SPI
(ProcessorChainBuilder.procBuild): stages are looked up by name with
settings dicts, so a pipeline is fully describable as JSON/dict config.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame

from nlp4l_spark.index.catalog import IndexCatalog

# name -> factory(settings) -> (DataFrame -> DataFrame)
_REGISTRY: dict[str, Callable[..., Callable[[DataFrame], DataFrame]]] = {}


def register(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


def _register_builtins() -> None:
    from pyspark.sql import functions as F

    from nlp4l_spark.ops import dedup, processors, textqc

    @register("filter")
    def _filter(condition: str):
        return lambda df: df.filter(condition)

    @register("select")
    def _select(columns: list[str]):
        return lambda df: df.selectExpr(*columns)

    @register("sort")
    def _sort(column: str, order: str = "asc"):
        return lambda df: processors.sort_processor(df, column, order)

    @register("unique")
    def _unique(column: str):
        return lambda df: processors.unique(df, column)

    @register("merge")
    def _merge(key: str, glue: str = " ", value_cols: list[str] | None = None):
        return lambda df: processors.merge_records(df, key, glue, value_cols)

    @register("stop_words")
    def _stop(column: str, words: list[str]):
        return lambda df: processors.stop_words(df, column, words)

    @register("record_hash")
    def _rhash(columns: list[str], out: str = "record_hash"):
        return lambda df: processors.record_hash(df, columns, out)

    @register("dedup_exact")
    def _dedup(text_col: str = "text", id_col: str = "doc_id"):
        return lambda df: dedup.exact_dedup(df, text_col, id_col)

    @register("quality_score")
    def _quality(text_col: str = "text"):
        return lambda df: textqc.quality_score(df, text_col)

    @register("lang_id")
    def _lang(text_col: str = "text"):
        return lambda df: textqc.lang_id(df, text_col)

    @register("fingerprint")
    def _fp(text_col: str = "text"):
        return lambda df: textqc.fingerprint(df, text_col)


_register_builtins()


@dataclass
class Stage:
    name: str
    settings: dict[str, Any] = field(default_factory=dict)
    checkpoint: bool = False  # persist a snapshot after this stage


@dataclass
class Pipeline:
    stages: list[Stage]
    checkpoint_root: str | None = None

    @classmethod
    def from_config(cls, config: dict) -> "Pipeline":
        """Job-config shape: {"stages": [{"name":..., "settings":{...},
        "checkpoint": bool}], "checkpoint_root": ...}."""
        return cls(
            stages=[
                Stage(s["name"], s.get("settings", {}), s.get("checkpoint", False))
                for s in config["stages"]
            ],
            checkpoint_root=config.get("checkpoint_root"),
        )

    def run(self, df: DataFrame, *, resume: bool = True) -> DataFrame:
        spark = df.sparkSession
        cat = IndexCatalog(self.checkpoint_root) if self.checkpoint_root else None
        out = df
        for i, stage in enumerate(self.stages):
            table = f"stage_{i:02d}_{stage.name}"
            if cat and stage.checkpoint and resume and cat.is_committed(table):
                out = cat.read(spark, table)
                continue
            if stage.name not in _REGISTRY:
                raise KeyError(f"unknown pipeline stage {stage.name!r}")
            out = _REGISTRY[stage.name](**stage.settings)(out)
            if cat and stage.checkpoint:
                cat.write(out, table)
                out = cat.read(spark, table)
        return out


def run_pipeline(df: DataFrame, config: dict, *, resume: bool = True) -> DataFrame:
    return Pipeline.from_config(config).run(df, resume=resume)
