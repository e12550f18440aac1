"""Deterministic synthetic source-code corpus (FIXTURES.md F0).

source_code_files(repo: string, path: string, commit: string, lang: string,
content: string) — the north-rule input shape (BASELINE.json input_hint).
Seed-stable (default 42), vectorized generation; includes the mandated edge
content: empty strings (distinct from null), non-ASCII UTF-8, CR/LF
variants. Repo 0 ("mega-repo") owns ~30% of rows to exercise skew handling.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "java", "js", "go", "rs", "c", "cpp", "rb", "ts", "sh", "sql", "md"]
_LANG_P = np.array([0.30, 0.18, 0.14, 0.09, 0.07, 0.06, 0.05, 0.04, 0.03, 0.02, 0.01, 0.01])

# "mother text": a deterministic fake-source pool the content column slices
# from. Repeated keyword vocabulary + identifiers + newlines, plus non-ASCII
# and CRLF segments (FIXTURES.md F0 content requirements).
_VOCAB = (
    "def return import self class for in if else elif while try except "
    "finally with lambda yield None True False and or not is assert "
    "public static void int long double string final private protected "
    "func var let const struct impl trait match enum pub use mod crate "
    "SELECT FROM WHERE GROUP BY ORDER LIMIT JOIN LEFT INNER ON AS "
).split()


def _mother_text(rng: np.random.Generator, size: int = 1 << 21) -> bytes:
    lines = []
    total = 0
    i = 0
    while total < size:
        w = [
            _VOCAB[int(rng.integers(0, len(_VOCAB)))]
            for _ in range(int(rng.integers(3, 9)))
        ]
        ident = f"var_{int(rng.integers(0, 9999))}"
        line = " ".join(w) + f" {ident} = {int(rng.integers(0, 10**6))}"
        if i % 97 == 0:
            line += "  # non-ascii: héllo🎉中文"
        eol = "\r\n" if i % 53 == 0 else "\n"
        lines.append(("    " * int(rng.integers(0, 4))) + line + eol)
        total += len(lines[-1])
        i += 1
    return "".join(lines).encode("utf-8")


def gen_source_code_files(n_rows: int, seed: int = 42,
                          avg_content_bytes: int = 1200) -> pa.Table:
    """Deterministic corpus table; content sizes ~log-normal, skewed repos."""
    rng = np.random.default_rng(seed)
    mother = _mother_text(rng)
    mlen = len(mother)

    # repo: mega-repo skew (~30% of rows in org0/repo0)
    r = rng.random(n_rows)
    repo_id = np.where(r < 0.30, 0, 1 + rng.integers(0, 210, n_rows))
    org_id = repo_id // 37
    repos = np.array([f"org{o}/repo{rid}" for o, rid in zip(org_id, repo_id)])

    # lang: zipf-ish categorical, ~1% null
    lang_idx = rng.choice(len(LANGS), size=n_rows, p=_LANG_P / _LANG_P.sum())
    langs = np.array(LANGS, dtype=object)[lang_idx]
    null_lang = rng.random(n_rows) < 0.01

    # path: dir tree with long shared prefixes, ext correlated with lang
    d1 = rng.integers(0, 12, n_rows)
    d2 = rng.integers(0, 40, n_rows)
    fileno = rng.integers(0, 100000, n_rows)
    paths = np.array([
        f"src/main/component_{a}/module_{b}/file_{f}.{ext}"
        for a, b, f, ext in zip(d1, d2, fileno, langs)
    ])

    # commit: 40-hex sha-like, high cardinality — one big hex slice
    commit_bytes = rng.integers(0, 256, n_rows * 20, dtype=np.uint8)
    all_hex = commit_bytes.tobytes().hex()
    commits = np.array([all_hex[i * 40 : (i + 1) * 40] for i in range(n_rows)])

    # content: log-normal sizes 0.2-50 KB sliced from mother text + unique tail
    sizes = np.exp(rng.normal(np.log(avg_content_bytes), 0.9, n_rows))
    sizes = np.clip(sizes, 200, 50_000).astype(np.int64)
    starts = rng.integers(0, max(1, mlen - 50_001), n_rows)
    contents: list[str] = []
    for i in range(n_rows):
        if i % 997 == 0:
            contents.append("")  # empty string, NOT null (ConvertThread.java:70-71 divergence)
            continue
        raw = mother[starts[i] : starts[i] + sizes[i]]
        # cut at valid UTF-8 boundary
        txt = raw.decode("utf-8", errors="ignore")
        contents.append(txt + f"\n// trail {i} {commits[i][:8]}\n")

    return pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array([None if nl else l for l, nl in zip(langs, null_lang)], pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def write_corpus(out_dir: str, n_rows: int, n_files: int = 64,
                 seed: int = 42, avg_content_bytes: int = 1200) -> str:
    """Write the corpus as `n_files` small parquet files (F0-manyfiles: the
    merge/compaction input shape). Idempotent: skips if _SUCCESS_GEN exists
    with matching params."""
    marker = os.path.join(out_dir, "_SUCCESS_GEN")
    tag = f"{n_rows}:{n_files}:{seed}:{avg_content_bytes}:v2"
    if os.path.exists(marker) and open(marker).read() == tag:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        os.remove(os.path.join(out_dir, f))
    table = gen_source_code_files(n_rows, seed=seed,
                                  avg_content_bytes=avg_content_bytes)
    per = (n_rows + n_files - 1) // n_files
    for i in range(n_files):
        lo, hi = i * per, min((i + 1) * per, n_rows)
        if lo >= hi:
            break
        pq.write_table(table.slice(lo, hi - lo),
                       os.path.join(out_dir, f"part-{i:05d}.parquet"),
                       compression="snappy")
    with open(marker, "w") as fh:
        fh.write(tag)
    return out_dir
