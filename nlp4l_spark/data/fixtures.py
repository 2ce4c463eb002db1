"""Golden fixture corpora ported from the reference test suite.

Verse texts are the exact strings indexed by the reference's unit tests
(including the U+3000 ideographic spaces), so the published golden numbers
(TF vectors, df/cf, per-corpus counts) transfer verbatim:

* 11-doc corpus: /root/reference/test/org/nlp4l/lucene/RawReaderSpec.scala:33-45
* 5-doc subset:  /root/reference/test/org/nlp4l/lucene/stats/TFIDFSuite.scala:36-52
* two-field variant: /root/reference/test/org/nlp4l/lucene/stats/WordCountsSuite.scala:37-59

Per FIXTURES.md §1a the verses are embedded as `text` of turns of one
conversation in the transcripts shape (conv_id, turn_idx, role, text,
tool, ts).
"""

from __future__ import annotations

import datetime as _dt

LONDON_BRIDGE_VERSES: list[str] = [
    "London Bridge is falling down, Falling down, Falling down. London Bridge is falling down, My fair lady.",
    "Take a key and lock her up, Lock her up, Lock her up. Take a key and lock her up, My fair lady. ",
    "How will we build it up, Build it up, Build it up?　How will we build it up, My fair lady?",
    "Build it up with silver and gold, Silver and gold, Silver and gold.　Build it up with silver and gold, My fair lady.",
    "Gold and silver I have none, I have none, I have none. Gold and silver I have none,　My fair lady.",
    "Build it up with needles and pins,　Needles and pins, Needles and pins. Build it up with needles and pins, My fair lady.",
    "Pins and needles bend and break, Bend and break,　Bend and break.　Pins and needles bend and break,　My fair lady.",
    "Build it up with wood and clay, Wood and clay, Wood and clay. Build it up with wood and clay, My fair lady.",
    "Wood and clay will wash away,　Wash away, Wash away.　Wood and clay will wash away, My fair lady.",
    "Build it up with stone so strong, Stone so strong, Stone so strong. Build it up with stone so strong, My fair lady.",
    "Stone so strong will last so long, Last so long, Last so long. Stone so strong will last so long, My fair lady.",
]

# TFIDFSuite's 5-doc corpus = verses [0, 2, 4, 6, 8] of the 11-doc corpus
TFIDF_SUITE_DOC_INDICES = [0, 2, 4, 6, 8]

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = [None, "bash", "read", "write", "grep", "edit"]
BASE_TS = _dt.datetime(2026, 1, 1, 0, 0, 0)


def transcripts_rows(verses: list[str] | None = None, conv_id: str = "conv-00000000"):
    """Fixture corpus as transcripts-shaped rows (FIXTURES.md §1)."""
    verses = LONDON_BRIDGE_VERSES if verses is None else verses
    rows = []
    for i, text in enumerate(verses):
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": i,
                "role": ROLES[i % len(ROLES)],
                "text": text,
                "tool": TOOLS[i % len(TOOLS)],
                "ts": BASE_TS + _dt.timedelta(seconds=13 * i),
            }
        )
    return rows


TRANSCRIPTS_SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def transcripts_df(spark, verses: list[str] | None = None, conv_id: str = "conv-00000000"):
    return spark.createDataFrame(
        transcripts_rows(verses, conv_id=conv_id), TRANSCRIPTS_SCHEMA_DDL
    )
