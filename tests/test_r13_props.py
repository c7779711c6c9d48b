"""Property-based tests (hypothesis) for the round-13 operators: the
invariants that must hold for ARBITRARY inputs, not just the registered
fixtures — canonicalizer idempotence, extractor no-leak, line-dedup
multiset algebra, KN row-order invariance. Bounded example counts keep
Spark overhead sane; shrinking gives minimal counterexamples."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# URL pieces that exercise every normalizer rule without leaving the
# grammar the operator documents (scheme://host[:port]/path[?q][#f])
_HOSTS = st.sampled_from(["A.Example.COM", "x.y", "HOST.net"])
_SCHEMES = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"])
_PORTS = st.sampled_from(["", ":80", ":443", ":8080"])
_PATHS = st.sampled_from(["", "/", "/a", "/a/", "/a/b", "/a/b/"])
_QS = st.lists(
    st.sampled_from(
        ["a=1", "b=2", "utm_x=9", "gclid=g", "z", "utm_source=f", "c=3"]
    ),
    max_size=4,
).map(lambda ps: "?" + "&".join(ps) if ps else "")
_FRAGS = st.sampled_from(["", "#f", "#a/b?c=1"])

urls = st.builds(
    lambda s, h, p, pa, q, f: f"{s}://{h}{p}{pa}{q}{f}",
    _SCHEMES, _HOSTS, _PORTS, _PATHS, _QS, _FRAGS,
)


@given(st.lists(urls, min_size=1, max_size=8))
@SET
def test_normalize_urls_idempotent_and_canonical(spark, us):
    """norm(norm(u)) == norm(u) (RFC 3986 §6: canonicalization is a
    projection), the output stays inside the canonical grammar
    (lowercase scheme/host, no fragment, no tracking params, sorted
    survivors), and two inputs differing only by normalizable noise map
    to one key."""
    from n2kupdate_spark.operators.corpus import normalize_urls

    df = spark.createDataFrame(list(enumerate(us)), ["i", "url"])
    once = {r["i"]: r["url_norm"] for r in normalize_urls(df).collect()}
    df2 = spark.createDataFrame(
        [(i, u) for i, u in once.items()], ["i", "url"]
    )
    twice = {r["i"]: r["url_norm"] for r in normalize_urls(df2).collect()}
    assert twice == once
    for u in once.values():
        scheme = u.split("://")[0]
        assert scheme == scheme.lower()
        assert "#" not in u
        assert "utm_" not in u and "gclid" not in u
        if "?" in u:
            params = u.split("?", 1)[1].split("&")
            assert params == sorted(params)


_WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "x", "longword"]),
    min_size=0,
    max_size=12,
).map(" ".join)


@given(
    st.lists(st.tuples(st.integers(0, 50), _WORDS), min_size=1, max_size=8).map(
        lambda rs: list({i: (i, t) for i, t in rs}.values())
    )
)
@SET
def test_kn_perplexity_row_order_invariant(spark, docs):
    """The KN model is a function of the corpus MULTISET: reversing the
    input row order (different partitioning / reduction order) must
    produce the identical output table."""
    from n2kupdate_spark.operators.corpus import kn_perplexity

    fwd = spark.createDataFrame(docs, ["doc_id", "text"])
    rev = spark.createDataFrame(list(reversed(docs)), ["doc_id", "text"])
    a = sorted(tuple(r) for r in kn_perplexity(fwd).collect())
    b = sorted(tuple(r) for r in kn_perplexity(rev).collect())
    assert a == b


_SCRIPT_PAYLOADS = st.sampled_from(
    ['var a = "</p>";', "if (x < 2 && y > 1) {}", "// <div>comment</div>"]
)
_BODY_TEXT = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "words", "here"]),
    min_size=6,
    max_size=20,
).map(" ".join)


@given(st.lists(st.tuples(_SCRIPT_PAYLOADS, _BODY_TEXT), min_size=1, max_size=5))
@SET
def test_extract_html_never_leaks_nontext(spark, pages):
    """For any script payload (including ones containing markup and
    comparison operators), the extracted text contains NO tag characters
    and NO script content — and the body paragraph always survives when
    long enough."""
    from n2kupdate_spark.operators.corpus import extract_html_text

    rows = [
        (
            i,
            f"<html><head><script>{s}</script></head><body>"
            f"<p>{t} padded out to clear the length gate easily</p>"
            f"</body></html>",
        )
        for i, (s, t) in enumerate(pages)
    ]
    df = spark.createDataFrame(rows, ["i", "html"])
    got = {r["i"]: r["extracted_text"] for r in extract_html_text(df, "html").collect()}
    for i, (s, t) in enumerate(pages):
        out = got[i]
        assert "<" not in out and ">" not in out.replace("x < 2 && y > 1", "")
        assert "var a" not in out and "comment" not in out
        assert t.split(" ")[0] in out


_LINES = st.lists(
    st.sampled_from(["shared line one", "shared line two", "unique", "x y z", ""]),
    min_size=1,
    max_size=5,
)


@given(
    st.lists(st.tuples(st.integers(0, 30), _LINES), min_size=1, max_size=6).map(
        lambda rs: list({i: (i, ls) for i, ls in rs}.values())
    )
)
@SET
def test_dedup_lines_global_multiset_algebra(spark, docs):
    """For arbitrary line-structured corpora: every kept line existed in
    its doc's input; every EXAMINED (non-empty here, min_line_chars=1)
    distinct line survives exactly once corpus-wide; n_kept ≤ n_lines;
    the keep-first copy is the one in the lowest (doc_id, pos)."""
    from collections import Counter

    from n2kupdate_spark.operators.dedup import dedup_lines_global

    rows = [(i, "\n".join(ls)) for i, ls in docs]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup_lines_global(df).collect()}
    all_kept = Counter()
    for did, ls in docs:
        if did not in out:
            continue
        kept = out[did]["text"].split("\n") if out[did]["text"] != "" else [""]
        assert out[did]["n_kept"] <= out[did]["n_lines"] == len(ls)
        assert Counter(kept) - Counter(ls) == Counter()  # kept ⊆ input
        for ln in kept:
            if len(ln) >= 1:
                all_kept[ln] += 1
    assert all(c == 1 for ln, c in all_kept.items()), all_kept
    # keep-first: the owner of each surviving line is the minimal
    # (doc_id, pos) among its occurrences
    first_owner = {}
    for did, ls in sorted(docs):
        for pos, ln in enumerate(ls):
            if len(ln) >= 1 and ln not in first_owner:
                first_owner[ln] = did
    for did, ls in docs:
        if did not in out:
            continue
        kept = [l for l in out[did]["text"].split("\n") if len(l) >= 1]
        for ln in kept:
            assert first_owner[ln] == did, (ln, did)
