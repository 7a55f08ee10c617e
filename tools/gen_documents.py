#!/usr/bin/env python3
"""Builder-side scale fixture: a documents.parquet at arbitrary row count
matching the driver testdata's measured shape (round-18 ratio-vs-SF
evidence for the perf-weak containment/audio-banding rows — see
BASELINE.md).

Distribution fitted from /root/testdata/sf0.1/documents.parquet:
  - vocabulary: 30 uniform content words (+ the 'dup' mutation marker);
  - doc length: uniform 10..100 whitespace tokens;
  - lang: en 0.41, es/fr/zh 0.15, de 0.14;
  - source: uniform over src0..src19;
  - near-dup process: 5% of docs copy a uniformly-chosen earlier doc and
    replace each token with 'dup' at 5% (sf0.1 measures 250/5000 docs
    carrying the marker, pair groups sharing >=150-char prefixes).

Deterministic (seed fixed per invocation). Usage:
  python3 tools/gen_documents.py <n_docs> <out.parquet> [seed]
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "es", "fr", "zh", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]


def main() -> None:
    n_docs = int(sys.argv[1])
    out = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    rng = random.Random(seed)
    texts, langs, sources, n_chars = [], [], [], []
    token_lists = []  # kept for the dup process
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.05:
            base = list(token_lists[rng.randrange(i)])
            toks = [("dup" if rng.random() < 0.05 else t) for t in base]
        else:
            n = rng.randint(10, 100)
            toks = [rng.choice(VOCAB) for _ in range(n)]
        token_lists.append(toks)
        text = " ".join(toks)
        texts.append(text)
        langs.append(rng.choices(LANGS, weights=LANG_W)[0])
        sources.append(f"src{rng.randrange(20)}")
        n_chars.append(len(text))
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(table, out)
    print(f"wrote {n_docs} docs -> {out}")


if __name__ == "__main__":
    main()
