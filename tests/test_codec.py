"""Varbyte/delta codec round-trip tests (FIXTURES.md §5: empty list, single
doc, gaps of 1, gaps > 2^28, tf=1 runs, seeded random arrays)."""

from __future__ import annotations

import numpy as np
import pytest

from nlp4l_spark.index import codec


CASES = [
    np.array([], dtype=np.int64),
    np.array([0], dtype=np.int64),
    np.array([7], dtype=np.int64),
    np.arange(1000, dtype=np.int64),  # gaps of 1
    np.array([0, 1, 2, 3, 2**28 + 5, 2**40, 2**40 + 1], dtype=np.int64),
    np.array([2**62], dtype=np.int64),
]


@pytest.mark.parametrize("doc_ids", CASES, ids=range(len(CASES)))
def test_doc_id_roundtrip(doc_ids):
    enc = codec.encode_doc_ids(doc_ids)
    out = codec.decode_doc_ids(enc)
    np.testing.assert_array_equal(out, doc_ids)


def test_random_roundtrip_seeded():
    rng = np.random.RandomState(42)
    for _ in range(25):
        n = rng.randint(1, 5000)
        gaps = rng.randint(1, 2**20, size=n).astype(np.int64)
        doc_ids = np.cumsum(gaps) - 1
        tfs = rng.randint(1, 300, size=n).astype(np.int64)
        d_enc, t_enc, bm = codec.encode_posting(doc_ids, tfs)
        d, t = codec.decode_posting(d_enc, t_enc)
        np.testing.assert_array_equal(d, doc_ids)
        np.testing.assert_array_equal(t, tfs)
        assert len(bm) == (n + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
        assert bm[-1]["last_doc"] == int(doc_ids[-1])


def test_varbyte_compression_is_compact():
    # gaps of 1 must take exactly 1 byte each
    doc_ids = np.arange(10_000, dtype=np.int64)
    assert len(codec.encode_doc_ids(doc_ids)) == 10_000


def test_tf_one_runs():
    tfs = np.ones(4096, dtype=np.int64)
    enc = codec.encode_tfs(tfs)
    assert len(enc) == 4096
    np.testing.assert_array_equal(codec.decode_tfs(enc), tfs)


def test_block_max_values():
    doc_ids = np.arange(300, dtype=np.int64)
    tfs = np.concatenate([np.full(128, 3), np.full(128, 9), np.full(44, 1)])
    bm = codec.block_max(doc_ids, tfs)
    assert [b["max_tf"] for b in bm] == [3, 9, 1]
    assert [b["last_doc"] for b in bm] == [127, 255, 299]


# ---------------- positions codec (hypothesis property tests) ----------- #
try:
    from hypothesis import given, settings, strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

if HAS_HYPOTHESIS:

    @st.composite
    def _position_runs(draw):
        """Per-doc ascending position runs (possibly empty), flat array +
        lens — the exact shape pos_postings stores."""
        n_docs = draw(st.integers(0, 12))
        lens, flat = [], []
        for _ in range(n_docs):
            run = sorted(
                draw(
                    st.sets(st.integers(0, 2**40), min_size=0, max_size=10)
                )
            )
            lens.append(len(run))
            flat.extend(run)
        return np.asarray(flat, dtype=np.int64), np.asarray(
            lens, dtype=np.int64
        )

    @given(_position_runs())
    @settings(max_examples=300, deadline=None)
    def test_positions_roundtrip_property(runs):
        flat, lens = runs
        buf = codec.encode_positions(flat, lens)
        np.testing.assert_array_equal(codec.decode_positions(buf, lens), flat)

    @given(_position_runs(), _position_runs())
    @settings(max_examples=150, deadline=None)
    def test_positions_buffers_concat_property(a, b):
        """Segment rows with disjoint doc ranges concatenate WITHOUT
        re-encoding — the invariant the merge-free pos_postings layout
        depends on (per-doc gap reset)."""
        fa, la = a
        fb, lb = b
        buf = codec.encode_positions(fa, la) + codec.encode_positions(fb, lb)
        lens = np.concatenate([la, lb])
        flat = np.concatenate([fa, fb])
        np.testing.assert_array_equal(codec.decode_positions(buf, lens), flat)

    @given(
        st.lists(st.integers(0, 2**55), min_size=0, max_size=60, unique=True)
    )
    @settings(max_examples=300, deadline=None)
    def test_doc_id_roundtrip_property(ids):
        d = np.asarray(sorted(ids), dtype=np.int64)
        np.testing.assert_array_equal(
            codec.decode_doc_ids(codec.encode_doc_ids(d)), d
        )


def test_for128_roundtrip_and_compression():
    """FOR128 (Lucene ForUtil shape): exact round-trip on every size
    class, and the measured storage win vs varbyte on realistic
    small-gap posting streams that motivates the comparison note in
    codec.py (varbyte stays the wire default for its concat-decode
    property — see _segment_merger)."""
    import numpy as np

    from nlp4l_spark.index.codec import (
        for128_decode,
        for128_encode,
        varbyte_encode,
    )

    rng = np.random.RandomState(7)
    cases = [
        np.empty(0, dtype=np.uint64),
        np.array([0], dtype=np.uint64),
        np.array([1, 1, 1], dtype=np.uint64),
        rng.randint(1, 8, size=127).astype(np.uint64),     # sub-frame
        rng.randint(1, 8, size=128).astype(np.uint64),     # exact frame
        rng.randint(1, 8, size=1000).astype(np.uint64),    # multi-frame
        rng.randint(1, 1 << 40, size=300).astype(np.uint64),  # wide values
        np.array([(1 << 63) + 5, 0, 1], dtype=np.uint64),  # 64-bit edge
    ]
    for v in cases:
        got = for128_decode(for128_encode(v))
        assert got.dtype == np.uint64 and list(got) == list(v)

    # dense postings: gaps of 1-7 (3 bits/value packed vs >= 8 varbyte)
    gaps = rng.randint(1, 8, size=100_000).astype(np.uint64)
    vb = len(varbyte_encode(gaps))
    fr = len(for128_encode(gaps))
    assert fr < 0.55 * vb, (fr, vb)  # measured ~0.38x on this profile

    # adversarial frame: ONE huge value forces the whole frame wide —
    # the known FOR weakness PFOR patches; varbyte wins locally there
    spike = np.ones(128, dtype=np.uint64)
    spike[64] = 1 << 40
    assert len(for128_encode(spike)) > len(varbyte_encode(spike))


def test_front_coded_term_dictionary():
    """Front-coding round-trips a REAL sorted index vocabulary exactly,
    shrinks it vs raw concatenation, block leaders stay whole (a
    seekCeil landing point every TERM_BLOCK terms), and decode order is
    the input order."""
    import random

    from nlp4l_spark.index.codec import (
        TERM_BLOCK,
        front_code_terms,
        front_decode_terms,
    )

    rng = random.Random(7)
    vocab = sorted(
        {f"w{rng.randrange(99999):05d}" for _ in range(5000)}
        | {"merge", "merger", "merging", "join", "joined", "joins"}
        | {f"needle{i:02d}" for i in range(40)}
    )
    enc = front_code_terms(vocab)
    assert front_decode_terms(enc) == vocab
    raw = sum(len(t.encode()) for t in vocab) + 4 * len(vocab)
    assert len(enc) < raw / 2, (len(enc), raw)  # >=2x on shared prefixes
    # unicode + empty-ish edge terms round-trip too
    edge = sorted(["", "a", "ab", "漢字", "漢字解析", "ζ", "ζη"])
    assert front_decode_terms(front_code_terms(edge)) == edge
    # single-block and exact-block-multiple sizes
    for n in (1, TERM_BLOCK, TERM_BLOCK * 3):
        sub = vocab[:n]
        assert front_decode_terms(front_code_terms(sub)) == sub
