"""The north-rule headline metric, measured explicitly: keep/drop F1 of
the Spark pipeline vs the reference-semantics oracle labels over a large
randomized line corpus, plus byte-identical cleaned text per url through
the full production pipeline.

Target F1 >= 0.99 (BASELINE.json); engineered to 1.0.
"""

from __future__ import annotations

import random

from pyspark.sql import Row

from ccspark import pipeline
from tests import oracle
from tests.fixtures import LINE_CASES

CHUNK_POOL = [
    "word", "the", "a", "1234", "!!", "...", "-", "=", "_", "[", "]", "*",
    " ", "\t", "　", "|", "/", "\\", "«", "»",
    "中文", "한국", "あい", "アイ", "\U0001F600", "©", "®",
    "http://x.co/y", "@user", "#tag", "<b>", "</b>", "abc123",
    "plain english words flowing on and on to build up line length.",
]


def random_lines(n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    out = [raw for _, raw in LINE_CASES]
    for _ in range(n):
        out.append("".join(rng.choice(CHUNK_POOL)
                           for _ in range(rng.randint(0, 25))))
    return out


def test_keep_drop_f1_vs_reference_labels(spark):
    lines = random_lines(3000)
    # pages of 5 lines each so the full pipeline (geo gate, explode,
    # kernel) is what gets measured - not the kernel in isolation
    pages = [
        Row(doc_id=i,
            url=f"https://www.f1site{i % 31}.de/p{i}",
            text="\n".join(lines[i * 5:(i + 1) * 5]),
            lang="en")
        for i in range(len(lines) // 5)
    ]
    df = spark.createDataFrame(pages)
    verdicts = pipeline.verdict_lines(
        pipeline.explode_lines(pipeline.with_geo(df)))
    got = {(r.url, r.pos): r for r in verdicts.collect()}

    tp = fp = fn = tn = 0
    mism_text = 0
    for p in pages:
        for pos, raw in enumerate(p.text.split("\n")):
            cleaned, keep, _ = oracle.verdict(raw)
            g = got[(p.url, pos)]
            if keep and g.keep:
                tp += 1
                if g.text != cleaned:
                    mism_text += 1
            elif keep and not g.keep:
                fn += 1
            elif not keep and g.keep:
                fp += 1
            else:
                tn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    assert tp > 100 and tn > 100          # both classes well represented
    assert f1 >= 0.99, (f1, fp, fn)
    assert f1 == 1.0                       # engineered to exact parity
    assert mism_text == 0                  # byte-identical cleaned text


def test_full_pipeline_text_byte_identical_per_url(spark):
    lines = random_lines(500, seed=7)
    pages = [
        Row(doc_id=i, url=f"https://www.bytes{i}.fr/p",
            text="\n".join(lines[i * 10:(i + 1) * 10]), lang="fr")
        for i in range(30)
    ]
    df = spark.createDataFrame(pages)
    out = pipeline.corpus_lines(df)
    got = {}
    for r in out.collect():
        got.setdefault(r.url, []).append((r.line_id, r.text))

    # oracle: per-page kept lines, then keep-first dedup across pages in
    # (url, line_id) order - mirrors the pipeline's deterministic tiebreak
    seen = set()
    exp = {}
    for p in sorted(pages, key=lambda p: p.url):
        for line_id, cleaned in oracle.process_page(p.text):
            if cleaned in seen:
                continue
            seen.add(cleaned)
            exp.setdefault(p.url, []).append((line_id, cleaned))
    assert {u: sorted(v) for u, v in got.items()} == \
           {u: sorted(v) for u, v in exp.items()}
