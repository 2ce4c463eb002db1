#!/usr/bin/env python3
"""Regenerate the `_DRIVER_ORDER` rotation in entry_queries/registry.py.

The external correctness gate walks `_DRIVER_ORDER` front-to-back under a
~50-query budget per round, so the rotation must put never-externally-
verified queries first or the gate re-checks already-green entries and the
evidence union stalls (this exact staleness cost round 5 its window once —
VERDICT.md r4 "What's wrong" #1). This script derives the order from the
committed CORRECTNESS_r0*.json files instead of hand-editing:

  1. PRIORITY front — SURVEY.md §2 local-parity components and families
     the judge has explicitly asked to see externally verified, minus any
     that already have a green row.
  2. All other oracled queries with no green external row, preserving
     their current relative order in the file.
  3. All externally-green queries (current relative order).
  4. The rows-only tail (no SQL oracle by design).

Run from the repo root; prints the new Python list body to stdout for
pasting (or diff-checking) against registry.py. It does NOT edit the file:
the committed list is the source of truth the assert in registry.py pins
against REGISTRY membership.
"""
import glob
import json
import re
import sys

ROWS_ONLY = [
    "ner_entities", "mdlp_cuts", "acronyms", "ml_classify", "kea_extract",
    "pca_project_topk", "compression_ratio_topk",
]

# §2 local-parity components + newest serving-tier + named families.
PRIORITY = [
    "replay", "tf_vectors", "select_features", "dict_match",
    "ja_dict_wordcount", "ja_user_dict_records", "ja_lattice_records",
    "uax29_wordcount", "multi_index_bm25_topk", "index_maxscore_topk",
    "pruned_bm25_topk", "tiered_bm25_topk", "prune_tuning_curve",
    "span_near3_search", "span_multi_search", "span_containing_search",
    "span_within_search", "span_or_search", "span_not_search",
    "hard_negatives", "kmeans_1d", "kmeans_embeddings", "label_centroids",
    "conv_dedup", "cdc_chunks", "lsh_tuning_curve", "bpe_merges",
    "bpe_pair_counts", "stream_set_ops",
]


def current_order(src: str) -> list:
    m = re.search(r"_DRIVER_ORDER = \[(.*?)\n\]", src, re.S)
    return re.findall(r'"([a-z0-9_]+)"', m.group(1))


def main() -> int:
    union = set()
    for f in sorted(glob.glob("CORRECTNESS_r0*.json")):
        # green rows only: the driver also records err rows (round 1's
        # `no_oracle` pair) which must not count as verified
        union |= {
            q
            for q, v in json.load(open(f)).items()
            if v.get("err") is None and v.get("rows_match")
        }
    src = open("nlp4l_spark/entry_queries/registry.py").read()
    names = current_order(src)
    oracled = [n for n in names if n not in ROWS_ONLY]
    never = [n for n in oracled if n not in union]
    green = [n for n in oracled if n in union]
    pri = [n for n in PRIORITY if n in never]
    rest = [n for n in never if n not in pri]
    tail = [n for n in names if n in ROWS_ONLY]
    out = pri + rest + green + tail
    assert sorted(out) == sorted(names)
    print(f"# union={len(union)} never={len(never)} green={len(green)}")
    for n in out:
        print(f'    "{n}",')
    return 0


if __name__ == "__main__":
    sys.exit(main())
