"""Structural tests for substring_dup_spans: the island-merge semantics are
checked against an independent pure-Python reference on an adversarial
corpus (overlap chains, exact-gap adjacency, intra-document repeats,
too-short docs) — cases the synthetic testdata doesn't guarantee to hit."""

from __future__ import annotations

import os
import random

import pandas as pd

from kasper_spark.registry import QUERIES, load_all_operators

load_all_operators()

K = 8


def _py_spans(doc_texts: dict[int, str]) -> list[tuple[int, int, int, int]]:
    """Independent reference: duplicate k-gram starts, merged with the
    break-when-gap-exceeds-k rule, 1-based positions."""
    from collections import Counter

    toks = {d: [w for w in t.split(" ") if w] for d, t in doc_texts.items()}
    grams: Counter = Counter()
    for ts in toks.values():
        for i in range(len(ts) - K + 1):
            grams[" ".join(ts[i : i + K])] += 1
    out = []
    for d in sorted(toks):
        ts = toks[d]
        starts = [
            i + 1
            for i in range(len(ts) - K + 1)
            if grams[" ".join(ts[i : i + K])] > 1
        ]
        island: list[int] = []
        for s in starts:
            if island and s - island[-1] > K:
                out.append((d, island[0], island[-1] + K - 1, island[-1] + K - 1 - island[0] + 1))
                island = []
            island.append(s)
        if island:
            out.append((d, island[0], island[-1] + K - 1, island[-1] + K - 1 - island[0] + 1))
    return out


def _write_docs(tmp_path, doc_texts: dict[int, str]) -> str:
    sf_dir = str(tmp_path / "sfx")
    os.makedirs(sf_dir, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": list(doc_texts),
            "text": list(doc_texts.values()),
            "lang": ["en"] * len(doc_texts),
            "source": ["t"] * len(doc_texts),
            "n_chars": [len(t) for t in doc_texts.values()],
        }
    ).to_parquet(os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_substring_dup_spans_adversarial_corpus(spark, tmp_path):
    W = [f"w{i}" for i in range(40)]
    dup_block = " ".join(W[:12])          # 12 tokens -> 5 dup 8-gram starts
    rnd = random.Random(7)

    def noise(n, lo=100):
        return " ".join(f"u{rnd.randrange(lo, lo + 10_000)}" for _ in range(n))

    docs = {
        # the shared block at different offsets; overlapping starts merge
        1: dup_block + " " + noise(20),
        2: noise(5) + " " + dup_block,
        # TWO separated copies inside ONE doc (intra-doc duplication +
        # island split: gap between the copies far exceeds K)
        3: dup_block + " " + noise(30) + " " + dup_block,
        # doc shorter than K tokens -> contributes nothing
        4: "a b c",
        # exact-K gap adjacency: two dup regions whose starts differ by
        # exactly K must MERGE (break requires gap > K)
        5: dup_block + " " + dup_block,
        6: noise(3, lo=50_000),
    }
    sf_dir = _write_docs(tmp_path, docs)
    got = [
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in QUERIES["substring_dup_spans"](spark, sf_dir).collect()
    ]
    assert got == _py_spans(docs)
    # sanity on the fixture itself: doc 3 produced two islands, doc 5 one
    by_doc = {}
    for d, *_ in got:
        by_doc[d] = by_doc.get(d, 0) + 1
    assert by_doc[3] == 2 and by_doc[5] == 1 and 4 not in by_doc


def test_substring_dup_spans_randomized_matches_reference(spark, tmp_path):
    rnd = random.Random(13)
    vocab = [f"v{i}" for i in range(25)]  # small vocab -> frequent collisions
    docs = {
        d: " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(4, 60)))
        for d in range(30)
    }
    sf_dir = _write_docs(tmp_path, docs)
    got = [
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in QUERIES["substring_dup_spans"](spark, sf_dir).collect()
    ]
    assert got == _py_spans(docs)
