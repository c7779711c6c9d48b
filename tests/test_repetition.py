"""Pin the Gopher repetition-signal family against an independent python
recompute — top-n char fractions with the exact tie rules, dup-n char
coverage with span merging — at the query's demo parameters and at a
non-default configuration."""

from __future__ import annotations

from collections import Counter


def _r4(x: float) -> float:
    """Scale-first 4dp rounding with HALF_UP ties — what Spark's
    F.round(x*10000, 0)/10000 computes (python round() is half-even)."""
    import math

    return math.floor(x * 10000 + 0.5) / 10000


def _signals_reference(text: str, top_ns, dup_n):
    toks = text.split(" ")
    chars = len(text)
    out = {}
    for n in top_ns:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if not grams:
            out[f"top{n}_char_frac"] = 0.0
            continue
        c = Counter(grams)
        # max by (count, char len, gram string) — the operator's struct max
        best = max(c.items(), key=lambda kv: (kv[1], len(kv[0]), kv[0]))
        out[f"top{n}_char_frac"] = _r4(best[1] * len(best[0]) / chars)
    grams = [" ".join(toks[i : i + dup_n]) for i in range(len(toks) - dup_n + 1)]
    c = Counter(grams)
    marks = [i for i, g in enumerate(grams) if c[g] >= 2]
    merged = []
    for i in marks:
        if merged and i <= merged[-1][1] + dup_n:
            merged[-1] = (merged[-1][0], i)
        else:
            merged.append((i, i))
    cov = 0
    for lo, hi in merged:
        span_toks = toks[lo : hi + dup_n]
        cov += sum(len(t) for t in span_toks) + (len(span_toks) - 1)
    out[f"dup{dup_n}_char_frac"] = _r4(cov / chars)
    return out


def test_text_repetition_signals_pinned(spark, sf_dir):
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents", columns=["doc_id", "text"]).collect()
    }
    got = {r["doc_id"]: r for r in QUERIES["text_repetition_signals"](spark, sf_dir).collect()}
    assert set(got) == set(texts)
    n_dup = n_fail = 0
    for did, text in texts.items():
        want = _signals_reference(text, (2, 3, 4), 3)
        r = got[did]
        for kcol, v in want.items():
            assert abs(r[kcol] - v) < 1e-9, (did, kcol, r[kcol], v)
        want_pass = int(
            want["top2_char_frac"] <= 0.20
            and want["top3_char_frac"] <= 0.18
            and want["top4_char_frac"] <= 0.16
            and want["dup3_char_frac"] <= 0.10
        )
        assert r["repetition_pass"] == want_pass
        n_dup += want["dup3_char_frac"] > 0
        n_fail += 1 - want_pass
    # the demo must actually exercise both signal families
    assert n_dup > 0 and n_fail > 0


def test_repetition_signals_nondefault_params(spark, sf_dir):
    """Non-default ns and thresholds: top_ns=(2,), dup_n=2 — the widest
    duplication net — against the same reference."""
    from n2kupdate_spark.operators.corpus import repetition_signals
    from n2kupdate_spark.sources import load

    d = load(spark, sf_dir, "documents", columns=["doc_id", "text"]).limit(200)
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    got = {
        r["doc_id"]: r
        for r in repetition_signals(
            d, top_ns=(2,), dup_n=2, top_thresholds={2: 0.5}, max_dup_frac=0.5
        ).collect()
    }
    assert set(got) == set(texts)
    for did, text in texts.items():
        want = _signals_reference(text, (2,), 2)
        r = got[did]
        assert abs(r["top2_char_frac"] - want["top2_char_frac"]) < 1e-9
        assert abs(r["dup2_char_frac"] - want["dup2_char_frac"]) < 1e-9
        want_pass = int(
            want["top2_char_frac"] <= 0.5 and want["dup2_char_frac"] <= 0.5
        )
        assert r["repetition_pass"] == want_pass


def test_information_signals_pinned(spark, sf_dir):
    """text_information_signals (rows-only, r10): recompute all three
    signals in-process (Counter entropies + stdlib zlib at the same
    level) and pin every doc's values to 4dp — strictly stronger than a
    value-hash. Also pins the null/empty contract: such docs are KEPT
    with zeroed signals (a quality gate must see them to reject them)."""
    import math
    import zlib

    from n2kupdate_spark.operators.corpus import information_signals
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def ent(counts):
        n = sum(counts)
        return -sum(c / n * math.log2(c / n) for c in counts) if n else 0.0

    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents", columns=["doc_id", "text"]).collect()
    }
    got = {r.doc_id: r for r in QUERIES["text_information_signals"](spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for i, t in docs.items():
        r = got[i]
        ce = round(ent(list(Counter(t).values())), 4)
        we = round(ent(list(Counter(t.split(" ")).values())), 4)
        raw = t.encode("utf-8")
        zr = round(len(zlib.compress(raw, 6)) / len(raw), 4)
        assert (r.n_chars, r.char_entropy, r.word_entropy, r.zlib_ratio) == (
            len(t), ce, we, zr
        ), (i, r)

    # null/empty contract
    from pyspark.sql import Row

    edge = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text=""), Row(doc_id=3, text="x x")]
    )
    er = {r.doc_id: r for r in information_signals(edge).collect()}
    assert (er[1].n_chars, er[1].char_entropy, er[1].zlib_ratio) == (0, 0.0, 0.0)
    assert (er[2].n_chars, er[2].word_entropy, er[2].zlib_ratio) == (0, 0.0, 0.0)
    assert er[3].word_entropy == 0.0 and er[3].char_entropy == round(
        ent([2, 1]), 4
    )
