"""FSST fast-encoder tests: the vectorized local-min-rank apply_merges must
decode exactly and track the sequential-greedy reference's output size.

Reference parity: the toolkit has no string codec (it defers to parquet-mr
page encodings, sort/DefaultParquetFileWriter.java:80-85); FSST is
north-rule scope, from the public VLDB 2020 paper.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_toolkit_spark.codecs import fsst as fm


def _corpus(n_words: int = 200_000, seed: int = 7) -> bytes:
    rng = random.Random(seed)
    words = ["def ", "return ", "import ", "self.", "value", "index",
             "    ", "for i in range(", "):\n", "# c\n", "spark", "col"]
    return "".join(rng.choice(words) for _ in range(n_words)).encode()


def test_fast_apply_roundtrips_and_tracks_greedy_size():
    doc = _corpus()
    merges = fm.build_table(doc[:65536])
    assert merges, "corpus should produce a non-trivial table"
    fast = fm.apply_merges(doc, merges)
    assert fm.expand_tokens(fast, merges) == doc
    ref = fm.apply_merges_replace(doc, merges)
    assert fm.expand_tokens(ref.astype(np.int32), merges) == doc
    # local-min-rank order may differ from sequential greedy by a hair
    assert len(fast) <= len(ref) * 1.01


@pytest.mark.parametrize("data", [
    b"",
    b"a",
    b"a" * 100_001 + b"bcd",             # tie-run parity path
    (b"ab" * 3 + b"a" * 7 + b"xy") * 5000,
    bytes(random.Random(3).getrandbits(8) for _ in range(200_000)),  # hex-ish
    "héllo wörld ∂∆ " .encode() * 9000,  # multibyte utf-8
])
def test_fast_apply_edge_inputs(data):
    merges = fm.build_table(data[:65536])
    toks = fm.apply_merges(data, merges)
    assert fm.expand_tokens(toks.astype(np.int32), merges) == data


def test_fast_apply_block_boundaries():
    # buffer > one 128K block: blocks encode independently yet decode joins
    doc = _corpus(n_words=120_000)
    assert len(doc) > fm._BLK
    merges = fm.build_table(doc[:65536])
    toks = fm.apply_merges(doc, merges)
    assert fm.expand_tokens(toks, merges) == doc


def test_fast_apply_no_merges_and_tiny():
    assert fm.apply_merges(b"abc", []).tolist() == [97, 98, 99]
    doc = b"the the the the the the"
    merges = fm.build_table(doc, min_count=2)
    toks = fm.apply_merges(doc, merges)  # <=4096 bytes: replace path
    assert fm.expand_tokens(toks.astype(np.int32), merges) == doc


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=20_000))
def test_fast_apply_property_roundtrip(data):
    merges = fm.build_table(data[:4096], min_count=2)
    toks = fm.apply_merges(data, merges)
    assert fm.expand_tokens(toks.astype(np.int32), merges) == data
