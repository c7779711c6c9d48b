"""Distributed subword tokenization: byte-pair-encoding (BPE) merge
learning and corpus encoding (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units" — the published
algorithm every major LLM tokenizer descends from).

Why this splits cleanly across a cluster: BPE merge learning operates on
the WORD-TYPE frequency table, not the token stream — a 100 TB corpus has
billions of tokens but its type table is Zipfian, so the top-K types
carry essentially all pair mass. The expensive part (counting types) is
one partial-agged shuffle; the sequential part (the merge loop, which is
inherently iterative — each merge changes the pair counts the next merge
ranks on) runs driver-side over the bounded type table, cost independent
of corpus size. Encoding is embarrassingly parallel: broadcast the merge
ranks, map every partition, cache per-word segmentations inside each
Arrow batch (the same Zipf skew that bounds the type table makes the
cache hit rate enormous).

The library functions here are pinned end-to-end against an independent
recount-from-scratch reference implementation in tests/test_tokenizer.py
(identical merge lists AND identical per-doc token sequences), which
cross-validates the incremental pair-count bookkeeping below against the
naive O(V·L) per-merge recount the spec describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word marker, kept as a SEPARATE symbol (one of the two published
#: conventions; train and encode below agree on it, which is all that
#: matters). Its presence lets a consumer reconstruct word boundaries:
#: concatenating a word's subwords and dropping the marker is the inverse
#: of encoding — property-tested in tests/test_tokenizer.py.
EOW = "</w>"


def _merge_in_word(
    syms: tuple[str, ...], pair: tuple[str, str], joined: str
) -> tuple[str, ...]:
    """One merge applied greedily left-to-right (the standard convention:
    after replacing at i, scanning resumes at i+2, so 'aaa' under merge
    (a,a) becomes ('aa','a'))."""
    out: list[str] = []
    i, n = 0, len(syms)
    a, b = pair
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _learn_merges_from_types(
    type_counts: list[tuple[str, int]], num_merges: int, min_frequency: int
) -> list[tuple[str, str]]:
    """Driver-side merge loop over the bounded word-type table.

    Incremental bookkeeping: ``stats`` holds every pair's corpus
    frequency and ``where`` maps pair -> {word index: occurrences}, so a
    merge touches only the words that actually contain the winning pair
    (remove the old word's pair contributions, re-add the merged word's).
    Ties on count break on lexicographic pair order — a DETERMINISTIC
    total order, so the learned vocabulary is identical on every
    run/cluster/engine (the published reference leaves ties to dict
    order; an engine whose outputs are hash-verified cannot)."""
    words: list[tuple[str, ...]] = [
        tuple(list(w) + [EOW]) for w, _ in type_counts
    ]
    freqs = [int(c) for _, c in type_counts]
    stats: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], dict[int, int]] = {}

    def _add(i: int, sign: int) -> None:
        f = freqs[i] * sign
        w = words[i]
        for p in zip(w, w[1:]):
            stats[p] = stats.get(p, 0) + f
            d = where.setdefault(p, {})
            d[i] = d.get(i, 0) + sign
            if d[i] == 0:
                del d[i]
            if stats[p] == 0:
                del stats[p]
                where.pop(p, None)

    for i in range(len(words)):
        _add(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if stats[best] < min_frequency:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for i in list(where.get(best, {})):
            _add(i, -1)
            words[i] = _merge_in_word(words[i], best, joined)
            _add(i, +1)
    return merges


def learn_bpe_merges(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_word_types: int = 50_000,
    min_frequency: int = 2,
) -> list[tuple[str, str]]:
    """Learn a ranked BPE merge list from a corpus.

    One shuffle: whitespace tokens -> partial-agged word-type counts,
    top-``max_word_types`` types collected (count desc, word asc — a
    deterministic truncation). Zipf's law makes the truncation benign:
    the dropped tail types are the rare words subword segmentation exists
    to handle, and they contribute negligible pair mass; any word —
    including never-seen ones — still encodes through the learned merges
    because single characters remain base symbols. Driver traffic is
    bounded at ``max_word_types`` rows regardless of corpus size; the
    merge loop never sees the corpus."""
    rows = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_word_types)
        .collect()
    )
    return _learn_merges_from_types(
        [(r["w"], r["c"]) for r in rows], num_merges, min_frequency
    )


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Segment one word: repeatedly apply the LOWEST-RANK applicable
    merge (training order) until none applies — the standard BPE
    inference rule, which reproduces the training segmentation exactly
    for every word the learner saw."""
    syms: tuple[str, ...] = tuple(list(word) + [EOW])
    while len(syms) > 1:
        best: tuple[str, str] | None = None
        best_rank = -1
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        syms = _merge_in_word(syms, best, best[0] + best[1])
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every document with a learned merge list. Emits
    (``id_col``, *carry_cols, ``bpe_tokens`` array<string>,
    ``n_bpe_tokens`` int) — ``carry_cols`` ride through the map so a
    caller never needs a post-encode self-join to recover them.

    Map-only: the ranks dict ships once per executor as a SparkContext
    broadcast (a 32k-merge vocabulary is ~1 MB — closure capture would
    re-ship it per task), and each Arrow batch keeps a word->segmentation
    cache, so the per-batch cost follows DISTINCT words in the batch, not
    tokens (Zipf again). No shuffle anywhere; a 100 TB encode is pure
    scan-parallel work."""
    import pandas as pd  # noqa: F401 — mapInPandas iterator types

    sc = docs.sparkSession.sparkContext
    b_ranks = sc.broadcast({tuple(p): i for i, p in enumerate(merges)})

    def _encode(batches):
        ranks = b_ranks.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks, counts = [], []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = list(_encode_word(w, ranks))
                        cache[w] = got
                    out.extend(got)
                toks.append(out)
                counts.append(len(out))
            cols = {id_col: pdf[id_col]}
            for c in carry_cols:
                cols[c] = pdf[c]
            cols["bpe_tokens"] = toks
            cols["n_bpe_tokens"] = pd.array(counts, dtype="int32")
            yield pd.DataFrame(cols)

    carried = ", ".join(
        f"{c} {docs.schema[c].dataType.simpleString()}" for c in carry_cols
    )
    schema = (
        f"{id_col} {docs.schema[id_col].dataType.simpleString()}, "
        + (carried + ", " if carried else "")
        + "bpe_tokens array<string>, n_bpe_tokens int"
    )
    return docs.select(id_col, *carry_cols, text_col).mapInPandas(
        _encode, schema=schema
    )


def vocab_drift(
    merges_a: list[tuple[str, str]], merges_b: list[tuple[str, str]]
) -> list[tuple[str, int | None, int | None, str]]:
    """Diff two learned merge tables (driver-side — both are bounded
    artifacts): per subword, its rank in each vocabulary and a status —
    ``added`` (B only), ``dropped`` (A only), ``shifted`` (both, rank
    moved), ``stable``. This is the tokenizer-refit signal: a corpus
    whose newly-learned vocabulary diverges from the shipped one is a
    corpus the shipped tokenizer fragments (fertility regression), the
    subword mirror of the embedding-drift codebook check
    (operators/similarity.py::embedding_drift). Rows ordered by
    coalesce(rank_b, rank_a) then subword — deterministic. Distinct
    pairs can join to one string (("a","bc") and ("ab","c") both make
    "abc"); the diff keys on the SUBWORD a consumer sees, keeping the
    lowest (first-learned) rank."""
    ra: dict[str, int] = {}
    for i, (a, b) in enumerate(merges_a):
        ra.setdefault(a + b, i)
    rb: dict[str, int] = {}
    for i, (a, b) in enumerate(merges_b):
        rb.setdefault(a + b, i)
    out = []
    for m in set(ra) | set(rb):
        ia, ib = ra.get(m), rb.get(m)
        status = (
            "added"
            if ia is None
            else "dropped"
            if ib is None
            else "shifted"
            if ia != ib
            else "stable"
        )
        out.append((m, ia, ib, status))
    out.sort(key=lambda t: (t[2] if t[2] is not None else t[1], t[0]))
    return out
