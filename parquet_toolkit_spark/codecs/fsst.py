"""FSST-style symbol-table string compression (from scratch, vectorized).

Public-literature basis: "FSST: Fast Random Access String Compression"
(Boncz, Neumann, Leis — VLDB 2020). Like FSST we build a greedy table of at
most ~255 multi-byte symbols (each <= 8 bytes) per partition by iteratively
concatenating the most frequent adjacent symbol pairs over generations, and
replace occurrences with one code. Unlike the C implementation (escape byte
+ sequential longest-match), our code stream is the dense-remapped token ids
bit-packed to ceil(log2(n_codes)) bits — typically 8-9 bits — which keeps
both encode and decode fully vectorized in numpy.

Encode uses a 2-byte token representation [lo, hi] with lo = t & 0xFF and
hi = 0xFE | (t >> 8) (so hi is always 0xFE or 0xFF); lo leads so that
`bytes.replace`'s memchr anchors on an infrequent data byte, not the
always-present hi marker. Tokens whose lo byte is
0xFE/0xFF (i.e. the literals 254 and 255) are excluded from merging, so no
merge pattern contains an 0xFE/0xFF lo byte. A misaligned (odd-offset) match
would require a pattern lo byte to equal an hi byte (always 0xFE/0xFF) —
impossible — hence each merge rule is one C-speed `bytes.replace` pass,
which is exactly greedy left-to-right non-overlapping pair replacement.

Reference parity note: the reference toolkit has no string codec at all —
it defers to parquet-mr page encodings (sort writer even disables dictionary
encoding, sort/DefaultParquetFileWriter.java:80-85). This module is
north-rule scope.
"""

from __future__ import annotations

import numpy as np

MAX_SYMBOLS = 254  # merged ids 256..509 keep lo byte < 0xFE
MAX_SYMBOL_LEN = 8
_HI_BASE = 0xFE


def _tok2(t: int) -> bytes:
    return bytes((t & 0xFF, _HI_BASE | (t >> 8)))


def _expand_to_tokens(data: bytes) -> bytes:
    """Raw bytes -> 2-byte token stream of literal tokens."""
    a = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((len(a), 2), dtype=np.uint8)
    out[:, 0] = a
    out[:, 1] = _HI_BASE
    return out.tobytes()


def _parse_tokens(buf: bytes) -> np.ndarray:
    a = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 2)
    return (a[:, 1].astype(np.int32) & 1) * 256 + a[:, 0].astype(np.int32)


def build_table(sample: bytes, max_symbols: int = MAX_SYMBOLS,
                min_count: int = 4) -> list[tuple[int, int]]:
    """Greedy pair-merge table from a sample buffer.

    Returns the ordered merge list [(a, b), ...]; merge i defines token
    256+i = concat(expansion(a), expansion(b)).
    """
    if not sample:
        return []
    max_symbols = min(max_symbols, MAX_SYMBOLS)
    buf = _expand_to_tokens(sample)
    sym_len = np.ones(256 + max_symbols + 1, dtype=np.int64)
    merges: list[tuple[int, int]] = []
    for _ in range(max_symbols):
        toks = _parse_tokens(buf)
        if len(toks) < 2:
            break
        # merged symbol must stay <= MAX_SYMBOL_LEN, and tokens with lo byte
        # 0xFE/0xFF (literals 254, 255) never participate (alignment safety)
        lo_a, lo_b = toks[:-1] & 255, toks[1:] & 255
        ok = (
            (sym_len[toks[:-1]] + sym_len[toks[1:]] <= MAX_SYMBOL_LEN)
            & (lo_a < _HI_BASE)
            & (lo_b < _HI_BASE)
        )
        if not ok.any():
            break
        pairs = toks[:-1].astype(np.int64)[ok] * 1024 + toks[1:][ok]
        cnt = np.bincount(pairs)
        best = int(cnt.argmax())
        if int(cnt[best]) < min_count:
            break
        a, b = divmod(best, 1024)
        new_tok = 256 + len(merges)
        merges.append((a, b))
        sym_len[new_tok] = sym_len[a] + sym_len[b]
        buf = buf.replace(_tok2(a) + _tok2(b), _tok2(new_tok))
    return merges


def symbol_expansions(merges: list[tuple[int, int]]) -> list[bytes]:
    """Token id -> byte expansion for all 256 + len(merges) tokens."""
    syms = [bytes([i]) for i in range(256)]
    for a, b in merges:
        syms.append(syms[a] + syms[b])
    return syms


def apply_merges(data: bytes, merges: list[tuple[int, int]]) -> np.ndarray:
    """Encode raw bytes into the token id stream (np.int32)."""
    buf = _expand_to_tokens(data)
    for i, (a, b) in enumerate(merges):
        buf = buf.replace(_tok2(a) + _tok2(b), _tok2(256 + i))
    return _parse_tokens(buf)


def expand_tokens(tokens: np.ndarray, merges: list[tuple[int, int]]) -> bytes:
    """Decode token id stream back to the original bytes (vectorized)."""
    if len(tokens) == 0:
        return b""
    syms = symbol_expansions(merges)
    lens = np.array([len(s) for s in syms], dtype=np.int64)
    symcat = np.frombuffer(b"".join(syms), dtype=np.uint8)
    symoff = np.zeros(len(syms), dtype=np.int64)
    np.cumsum(lens[:-1], out=symoff[1:])
    tl = lens[tokens]
    starts = symoff[tokens]
    cum = np.cumsum(tl)
    total = int(cum[-1])
    out_idx = np.arange(total, dtype=np.int64) - np.repeat(cum - tl, tl) + np.repeat(starts, tl)
    return symcat[out_idx].tobytes()
