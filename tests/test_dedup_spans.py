"""Pin the windowed exact-substring dedup (duplicate_spans /
dedup_substring_spans) against an independent python recompute from raw
text — the operator works on xxhash64(gram) keys, the reference on the
gram STRINGS, so a hash-collision bug or any window/island slip shows as
a span diff."""

from __future__ import annotations

from pyspark.sql import functions as F


def _spans_reference(texts: dict, k: int, min_count: int) -> dict:
    """{doc_id: [(start, end), ...]} merged duplicated spans, and the
    per-doc token count — windows on gram strings, islands merged when
    gap ≤ k."""
    from collections import Counter

    toks = {d: t.split(" ") for d, t in texts.items()}
    counts = Counter()
    for t in toks.values():
        for i in range(len(t) - k + 1):
            counts[" ".join(t[i : i + k])] += 1
    spans = {}
    for d, t in toks.items():
        marks = [
            i
            for i in range(len(t) - k + 1)
            if counts[" ".join(t[i : i + k])] >= min_count
        ]
        merged = []  # [(first_start, last_start)] of each island
        for i in marks:
            if merged and i <= merged[-1][1] + k:
                merged[-1] = (merged[-1][0], i)
            else:
                merged.append((i, i))
        spans[d] = [(lo, hi + k) for lo, hi in merged]
    return spans, {d: len(t) for d, t in toks.items()}


def test_duplicate_spans_pinned(spark, sf_dir):
    from n2kupdate_spark.operators.dedup import duplicate_spans
    from n2kupdate_spark.sources import load

    k = 8
    d = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    want_spans, want_n = _spans_reference(texts, k, 2)
    got = {}
    for r in duplicate_spans(d, k=k, min_count=2).collect():
        got.setdefault(r["doc_id"], []).append((r["start"], r["end"]))
        assert r["n_tokens"] == want_n[r["doc_id"]]
    for did, spans in got.items():
        assert sorted(spans) == want_spans[did], (did, sorted(spans), want_spans[did])
    # every doc the reference says has spans must appear
    assert set(got) == {d_ for d_, s in want_spans.items() if s}
    # sanity: the fixture actually exercises the op
    assert got, "fixture has no duplicated 8-grams — op not exercised"


def test_dedup_substring_spans_query_summary(spark, sf_dir):
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    d = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    want_spans, want_n = _spans_reference(texts, 8, 2)
    rows = QUERIES["dedup_substring_spans"](spark, sf_dir).collect()
    got = {r["doc_id"]: r for r in rows}
    assert set(got) == {d_ for d_, s in want_spans.items() if s}
    for did, r in got.items():
        spans = want_spans[did]
        dup = sum(e - s for s, e in spans)
        assert r["n_spans"] == len(spans)
        assert r["dup_tokens"] == dup
        assert abs(r["dup_frac"] - round(dup / want_n[did] * 10000) / 10000) < 1e-9


def test_remove_spans_token_exact(spark, sf_dir):
    """remove_spans must rebuild every doc's text exactly as the python
    cut of the reference spans — docs without spans byte-identical,
    trimmed docs missing precisely the covered token positions."""
    from n2kupdate_spark.operators.dedup import duplicate_spans, remove_spans
    from n2kupdate_spark.sources import load

    k = 8
    d = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    want_spans, _ = _spans_reference(texts, k, 2)
    spans = duplicate_spans(d, k=k, min_count=2)
    got = {r["doc_id"]: r for r in remove_spans(d, spans).collect()}
    assert set(got) == set(texts)
    for did, text in texts.items():
        toks = text.split(" ")
        covered = set()
        for lo, hi in want_spans.get(did, []):
            covered.update(range(lo, hi))
        want_text = " ".join(t for i, t in enumerate(toks) if i not in covered)
        r = got[did]
        assert r["text"] == want_text, did
        assert r["n_tokens_before"] == len(toks)
        assert r["n_tokens_after"] == len(toks) - len(covered)


def test_dedup_substring_trim_summary(spark, sf_dir):
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    d = load(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    rows = d.collect()
    texts = {r["doc_id"]: r["text"] for r in rows}
    src = {r["doc_id"]: r["source"] for r in rows}
    want_spans, want_n = _spans_reference(texts, 8, 2)
    agg: dict[str, list] = {}
    for did, text in texts.items():
        covered = sum(hi - lo for lo, hi in want_spans.get(did, []))
        a = agg.setdefault(src[did], [0, 0, 0, 0])
        a[0] += 1
        a[1] += 1 if covered else 0
        a[2] += want_n[did]
        a[3] += want_n[did] - covered
    got = {
        r["source"]: (
            r["n_docs"], r["n_trimmed"], r["tokens_before"],
            r["tokens_after"], r["shrink_frac"],
        )
        for r in QUERIES["dedup_substring_trim"](spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for s, (nd, nt, tb, ta) in agg.items():
        exp_shrink = round((1 - ta / tb) * 10000) / 10000
        assert got[s] == (nd, nt, tb, ta, exp_shrink), (s, got[s])
