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


def test_prepare_corpus_substring_trim_composition(spark, sf_dir):
    """prepare_corpus(trim_substring_k=8) must equal the independent
    composition: gate_documents survivors (Spark — itself oracle-
    verified) → python span trim over the SURVIVOR corpus → python
    md5-bucket mixture → packing arithmetic. Also: the trimmed totals
    must be ≤ the untrimmed run's everywhere, strictly < for at least
    one source (the stage demonstrably bites)."""
    import hashlib

    from n2kupdate_spark.operators.corpus import gate_documents, prepare_corpus
    from n2kupdate_spark.queries.mlprep import _MIX_DEFAULT_W4, _MIX_W4
    from n2kupdate_spark.queries.text import _EVAL_PRED_SQL
    from n2kupdate_spark.sources import load

    full = load(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    is_eval = F.expr(_EVAL_PRED_SQL)
    d, ev = full.filter(~is_eval), full.filter(is_eval)
    weights = {s: w / 10000 for s, w in _MIX_W4.items()}
    default_w = _MIX_DEFAULT_W4 / 10000
    kw = dict(weights=weights, default_weight=default_w)

    surv = gate_documents(d, ev).collect()
    texts = {r["doc_id"]: r["text"] for r in surv}
    src = {r["doc_id"]: r["source"] for r in surv}
    spans, n_toks = _spans_reference(texts, 8, 2)
    agg: dict[str, list] = {}
    for did in texts:
        trimmed = n_toks[did] - sum(hi - lo for lo, hi in spans.get(did, []))
        w4 = _MIX_W4.get(src[did], _MIX_DEFAULT_W4)
        bucket = (
            int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16) % 10000
        )
        copies = w4 // 10000 + (1 if bucket < w4 % 10000 else 0)
        if copies == 0:
            continue
        a = agg.setdefault(src[did], [0, 0, 0])
        a[0] += 1
        a[1] += copies
        a[2] += copies * trimmed
    got = {
        r["source"]: (r["n_docs"], r["n_rows"], r["total_tokens"], r["n_sequences"])
        for r in prepare_corpus(d, ev, trim_substring_k=8, **kw).collect()
    }
    assert set(got) == set(agg)
    for s, (nd, nr, tt) in ((s, tuple(a)) for s, a in agg.items()):
        import math

        assert got[s] == (nd, nr, tt, math.ceil(tt / 512)), (s, got[s], agg[s])
    base = {
        r["source"]: r["total_tokens"]
        for r in prepare_corpus(d, ev, **kw).collect()
    }
    assert all(got[s][2] <= base[s] for s in got)
    assert any(got[s][2] < base[s] for s in got)
