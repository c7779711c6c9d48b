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


def _word_type_counts(
    docs: DataFrame, text_col: str, max_word_types: int
) -> list[tuple[str, int]]:
    """THE one corpus-scale job all three tokenizer learners share:
    whitespace tokens → partial-agged word-type counts → deterministic
    top-``max_word_types`` collect (count desc, word asc). Factored out
    (r12 review) so the truncation/determinism contract lives in exactly
    one place — Zipf makes the truncation benign for every family, as
    documented on each learner."""
    rows = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_word_types)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


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
    return _learn_merges_from_types(
        _word_type_counts(docs, text_col, max_word_types),
        num_merges,
        min_frequency,
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


# ---------------------------------------------------------------------------
# Unigram language-model tokenizer (Kudo 2018, "Subword Regularization:
# Improving Neural Network Translation Models with Multiple Subword
# Candidates" — the SentencePiece unigram model). Same distributed shape
# as BPE above: the corpus-size-independent part (word-TYPE counting) is
# the one shuffle; the inherently iterative part (EM + likelihood-loss
# pruning) runs driver-side over the bounded type table; encoding is a
# broadcast-table Viterbi map with per-batch caching.
# ---------------------------------------------------------------------------

#: Longest candidate piece considered during seeding/EM/encode. Bounds the
#: lattice fan-in (every DP below scans at most this many predecessors per
#: position) and the seed substring blow-up (O(L·max) per word type).
MAX_PIECE_LEN = 10


def _viterbi_word(
    word: str, logp: dict[str, float], unk_logp: float
) -> tuple[tuple[str, ...], float]:
    """Best (max-log-prob) segmentation of one word over the piece
    lattice — the unigram inference rule. Characters absent from the
    vocabulary score ``unk_logp`` so the lattice always connects. Ties
    on score prefer the LONGER last piece (deterministic; matches the
    enumeration reference's max() tie rule in tests)."""
    n = len(word)
    best: list[float] = [0.0] + [float("-inf")] * n
    back: list[int] = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - MAX_PIECE_LEN), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = unk_logp
            s = best[j] + lp
            # j ascends (longest piece first) and the test is strict >,
            # so an equal-scoring shorter piece never displaces — the
            # smallest j (longest last piece) wins ties
            if s > best[i]:
                best[i], back[i] = s, j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return tuple(out), best[n]


def _forward_backward_counts(
    word: str,
    freq: int,
    prob: dict[str, float],
    expected: dict[str, float],
) -> float:
    """E-step contribution of one word type: marginal expected count of
    every lattice piece under the current unigram probabilities, via the
    standard forward-backward pass (alpha[j]·p·beta[i]/Z). Plain float64
    probabilities — words are bounded at MAX_PIECE_LEN-fanin lattices and
    real-token lengths, nowhere near underflow. Returns the word's total
    lattice probability Z (0.0 if the lattice is disconnected, in which
    case nothing is added)."""
    n = len(word)
    alpha = [1.0] + [0.0] * n
    for i in range(1, n + 1):
        a = 0.0
        for j in range(max(0, i - MAX_PIECE_LEN), i):
            p = prob.get(word[j:i])
            if p:
                a += alpha[j] * p
        alpha[i] = a
    z = alpha[n]
    if z <= 0.0:
        return 0.0
    beta = [0.0] * n + [1.0]
    for j in range(n - 1, -1, -1):
        b = 0.0
        for i in range(j + 1, min(n, j + MAX_PIECE_LEN) + 1):
            p = prob.get(word[j:i])
            if p:
                b += p * beta[i]
        beta[j] = b
    scale = freq / z
    for i in range(1, n + 1):
        for j in range(max(0, i - MAX_PIECE_LEN), i):
            piece = word[j:i]
            p = prob.get(piece)
            if p:
                expected[piece] = (
                    expected.get(piece, 0.0) + alpha[j] * p * beta[i] * scale
                )
    return z


def _em_rounds(
    type_counts: list[tuple[str, int]],
    prob: dict[str, float],
    iters: int,
) -> dict[str, float]:
    """``iters`` full EM passes over the word-type table; returns the
    re-normalized piece probabilities. Single characters are floored at
    ``1e-12`` of the expected mass (SentencePiece's required-chars rule:
    EM concentrates mass on whole-word pieces and would otherwise
    underflow char probabilities to exact 0, silently pruning the
    connectivity floor). Iteration order is the table's (count desc,
    word asc) order and the vocab's insertion order — fully
    deterministic float arithmetic."""
    for _ in range(iters):
        expected: dict[str, float] = {}
        for w, c in type_counts:
            _forward_backward_counts(w, c, prob, expected)
        total = sum(expected.values())
        if total <= 0.0:
            return prob
        floor = total * 1e-12
        new_prob: dict[str, float] = {}
        for p in prob:
            e = expected.get(p, 0.0)
            if len(p) == 1:
                e = max(e, floor)
            if e > 0.0:
                new_prob[p] = e
        denom = sum(new_prob.values())
        prob = {p: v / denom for p, v in new_prob.items()}
    return prob


def _learn_unigram_from_types(
    type_counts: list[tuple[str, int]],
    vocab_size: int,
    seed_size: int = 2000,
    em_iters: int = 2,
    keep_frac: float = 0.75,
) -> list[tuple[str, float]]:
    """Driver-side unigram-LM training over the bounded word-type table.

    Published recipe (Kudo 2018 §3.2, as SentencePiece implements it):
    (1) SEED a large candidate set — every substring up to MAX_PIECE_LEN,
    frequency-scored, truncated to the top ``seed_size`` multi-char
    pieces (count desc, piece asc — deterministic), plus EVERY single
    character (the connectivity floor, never pruned); (2) iterate: run
    ``em_iters`` EM passes (forward-backward expected counts → renorm),
    then PRUNE the multi-char pieces whose removal costs the corpus the
    least Viterbi log-likelihood — each surviving round keeps the top
    ``keep_frac`` by loss — until the vocabulary fits ``vocab_size``;
    (3) one final EM pass re-estimates probabilities on the survivor set.
    The per-piece loss is the HF-course/SentencePiece approximation:
    only words whose CURRENT best segmentation uses the piece pay a
    re-segmentation cost (best-score-without minus best-score-with).

    Returns (piece, logp) ranked by probability desc then piece asc —
    the bounded artifact the encoder broadcasts. Cross-validated in
    tests/test_tokenizer.py against an independent reference whose
    E-step ENUMERATES every segmentation and whose Viterbi is an
    enumeration argmax (exponential but exact on bounded words)."""
    import math

    chars = sorted({ch for w, _ in type_counts for ch in w})
    sub_counts: dict[str, int] = {}
    for w, c in type_counts:
        n = len(w)
        for i in range(n):
            for k in range(2, min(MAX_PIECE_LEN, n - i) + 1):
                s = w[i : i + k]
                sub_counts[s] = sub_counts.get(s, 0) + c
    multi = [
        s
        for s, _ in sorted(sub_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :seed_size
        ]
    ]
    char_counts: dict[str, int] = {}
    for w, c in type_counts:
        for ch in w:
            char_counts[ch] = char_counts.get(ch, 0) + c
    total0 = float(sum(char_counts.values()) + sum(sub_counts[s] for s in multi))
    prob: dict[str, float] = {}
    for ch in chars:
        prob[ch] = char_counts[ch] / total0
    for s in multi:
        prob[s] = sub_counts[s] / total0

    target_multi = max(0, vocab_size - len(chars))
    while True:
        prob = _em_rounds(type_counts, prob, em_iters)
        cur_multi = [p for p in prob if len(p) > 1]
        if len(cur_multi) <= target_multi:
            break
        logp = {p: math.log(v) for p, v in prob.items() if v > 0.0}
        unk = min(logp.values()) - 10.0
        loss: dict[str, float] = {p: 0.0 for p in cur_multi}
        for w, c in type_counts:
            seg, score = _viterbi_word(w, logp, unk)
            for piece in set(seg):
                if len(piece) <= 1:
                    continue
                # temporarily ban the piece instead of copying the table
                lp_saved = logp.pop(piece)
                _, alt = _viterbi_word(w, logp, unk)
                logp[piece] = lp_saved
                loss[piece] = loss.get(piece, 0.0) + c * (score - alt)
        keep = max(target_multi, int(len(cur_multi) * keep_frac))
        survivors = set(
            p
            for p, _ in sorted(
                loss.items(), key=lambda kv: (-kv[1], kv[0])
            )[:keep]
        )
        prob = {
            p: v for p, v in prob.items() if len(p) == 1 or p in survivors
        }
        s = sum(prob.values())
        prob = {p: v / s for p, v in prob.items()}

    prob = _em_rounds(type_counts, prob, 1)
    return sorted(
        ((p, math.log(v)) for p, v in prob.items() if v > 0.0),
        key=lambda kv: (-kv[1], kv[0]),
    )


def learn_unigram_vocab(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_word_types: int = 50_000,
    seed_size: int = 2000,
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece table from a corpus — the SentencePiece
    counterpart of :func:`learn_bpe_merges`, with the identical
    distributed shape: ONE partial-agged shuffle builds the word-type
    frequency table, the top-``max_word_types`` types (count desc, word
    asc — deterministic truncation) are collected, and the EM + prune
    loop runs driver-side over that bounded table — cost independent of
    corpus size, Zipf making the truncation benign exactly as documented
    on the BPE learner above."""
    return _learn_unigram_from_types(
        _word_type_counts(docs, text_col, max_word_types),
        vocab_size,
        seed_size=seed_size,
    )


def unigram_encode(
    docs: DataFrame,
    pieces: list[tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Viterbi-encode every document with a learned unigram piece table.
    Emits (``id_col``, *carry_cols, ``ug_tokens`` array<string>,
    ``n_ug_tokens`` int). Word boundaries survive by construction:
    pieces are substrings of their word, so concatenating a word's
    pieces reproduces the word (property-tested) — no end-of-word
    marker needed, unlike the BPE convention above.

    Map-only, same scale shape as :func:`bpe_encode`: the (piece, logp)
    table ships once per executor as a broadcast, each Arrow batch keeps
    a word→segmentation cache (Zipf: per-batch cost follows distinct
    words, not tokens), characters never seen in training score a
    floor-penalty logp so every word still encodes. No shuffle anywhere."""
    import pandas as pd  # noqa: F401 — mapInPandas iterator types

    sc = docs.sparkSession.sparkContext
    b_table = sc.broadcast(dict(pieces))

    def _encode(batches):
        logp = b_table.value
        unk = (min(logp.values()) if logp else 0.0) - 10.0
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
                        got = list(_viterbi_word(w, logp, unk)[0])
                        cache[w] = got
                    out.extend(got)
                toks.append(out)
                counts.append(len(out))
            cols = {id_col: pdf[id_col]}
            for c in carry_cols:
                cols[c] = pdf[c]
            cols["ug_tokens"] = toks
            cols["n_ug_tokens"] = pd.array(counts, dtype="int32")
            yield pd.DataFrame(cols)

    carried = ", ".join(
        f"{c} {docs.schema[c].dataType.simpleString()}" for c in carry_cols
    )
    schema = (
        f"{id_col} {docs.schema[id_col].dataType.simpleString()}, "
        + (carried + ", " if carried else "")
        + "ug_tokens array<string>, n_ug_tokens int"
    )
    return docs.select(id_col, *carry_cols, text_col).mapInPandas(
        _encode, schema=schema
    )


# ---------------------------------------------------------------------------
# WordPiece (Schuster & Nakajima 2012; the BERT tokenizer) — the third
# tokenizer family: BPE's greedy merge loop but scored by the likelihood
# RATIO count(ab)/(count(a)·count(b)) instead of raw pair frequency, the
# BERT '##' continuation convention, and greedy longest-match-first
# inference (which, unlike BPE's ranked-merge replay, is NOT guaranteed
# to reproduce training segmentations — the documented property of the
# family). Distributed shape identical to the other two learners.
# ---------------------------------------------------------------------------

#: BERT continuation prefix: a piece that does not start its word.
WP_CONT = "##"
#: Emitted for a word no vocab walk can cover (unseen character).
WP_UNK = "[UNK]"


def _wp_units(word: str) -> tuple[str, ...]:
    """A word as WordPiece base units: first char plain, rest
    ``##``-prefixed."""
    return tuple(
        c if i == 0 else WP_CONT + c for i, c in enumerate(word)
    )


def _wp_join(a: str, b: str) -> str:
    """Merge two adjacent units: the right side always drops its ``##``
    (it is absorbed into the left, which keeps its own word-position
    marker)."""
    return a + (b[len(WP_CONT):] if b.startswith(WP_CONT) else b)


def _learn_wordpiece_from_types(
    type_counts: list[tuple[str, int]],
    num_merges: int,
    min_frequency: int = 2,
) -> list[str]:
    """Driver-side WordPiece training over the bounded word-type table.

    Published rule: repeatedly merge the adjacent pair maximizing
    score = pair_count / (unit_count(a) · unit_count(b)) — the pair
    whose merge most increases a unigram LM's corpus likelihood —
    subject to ``min_frequency`` on the raw pair count. Bookkeeping is
    incremental like the BPE learner (pair counts + occurrence maps +
    per-unit counts, touched only for words containing the winner); tie
    order is (score desc, pair lex asc) — deterministic, as required for
    a hash-verified engine. Returns the learned VOCABULARY (base units
    first — sorted — then merged symbols in learn order): greedy
    longest-match inference needs the piece set, not the merge list.
    Cross-validated against a recount-from-scratch naive reference in
    tests/test_tokenizer.py."""
    words: list[tuple[str, ...]] = [_wp_units(w) for w, _ in type_counts]
    freqs = [int(c) for _, c in type_counts]
    pair_n: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], dict[int, int]] = {}
    unit_n: dict[str, int] = {}

    def _add(i: int, sign: int) -> None:
        f = freqs[i] * sign
        w = words[i]
        for u in w:
            unit_n[u] = unit_n.get(u, 0) + f
            if unit_n[u] == 0:
                del unit_n[u]
        for p in zip(w, w[1:]):
            pair_n[p] = pair_n.get(p, 0) + f
            d = where.setdefault(p, {})
            d[i] = d.get(i, 0) + sign
            if d[i] == 0:
                del d[i]
            if pair_n[p] == 0:
                del pair_n[p]
                where.pop(p, None)

    for i in range(len(words)):
        _add(i, +1)

    base = sorted(unit_n)
    merged: list[str] = []
    for _ in range(num_merges):
        best, best_score = None, 0.0
        for p, c in pair_n.items():
            if c < min_frequency:
                continue
            s = c / (unit_n[p[0]] * unit_n[p[1]])
            if best is None or s > best_score or (s == best_score and p < best):
                best, best_score = p, s
        if best is None:
            break
        joined = _wp_join(*best)
        merged.append(joined)
        for i in list(where.get(best, {})):
            _add(i, -1)
            words[i] = _merge_in_word(words[i], best, joined)
            _add(i, +1)
    return base + merged


def _wp_encode_word(word: str, vocab: set[str]) -> tuple[str, ...]:
    """Greedy longest-match-first WordPiece inference (the published
    BERT rule): repeatedly take the LONGEST vocabulary piece matching at
    the cursor (continuation positions search with the ``##`` prefix);
    if no piece matches at some position the whole word becomes
    ``[UNK]``."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        prefix = WP_CONT if i > 0 else ""
        j = n
        piece = None
        while j > i:
            cand = prefix + word[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return (WP_UNK,)
        out.append(piece)
        i = j
    return tuple(out)


def learn_wordpiece_vocab(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_word_types: int = 50_000,
    min_frequency: int = 2,
) -> list[str]:
    """Learn a WordPiece vocabulary from a corpus — same distributed
    shape as :func:`learn_bpe_merges` / :func:`learn_unigram_vocab`:
    ONE partial-agged word-type count shuffle, deterministic bounded
    top-K collect, driver-side merge loop whose cost is independent of
    corpus size."""
    return _learn_wordpiece_from_types(
        _word_type_counts(docs, text_col, max_word_types),
        num_merges,
        min_frequency,
    )


def wordpiece_encode(
    docs: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Greedy longest-match WordPiece encoding. Emits (``id_col``,
    *carry_cols, ``wp_tokens`` array<string>, ``n_wp_tokens`` int).
    Map-only with the vocab as a broadcast set and a per-batch
    word→segmentation cache — the scale shape shared by all three
    encoder families (no shuffle; per-batch cost follows distinct
    words). A word containing an unseen character emits the single
    ``[UNK]`` piece, the BERT convention."""
    import pandas as pd  # noqa: F401 — mapInPandas iterator types

    sc = docs.sparkSession.sparkContext
    b_vocab = sc.broadcast(set(vocab))

    def _encode(batches):
        vocab_set = b_vocab.value
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
                        got = list(_wp_encode_word(w, vocab_set))
                        cache[w] = got
                    out.extend(got)
                toks.append(out)
                counts.append(len(out))
            cols = {id_col: pdf[id_col]}
            for c in carry_cols:
                cols[c] = pdf[c]
            cols["wp_tokens"] = toks
            cols["n_wp_tokens"] = pd.array(counts, dtype="int32")
            yield pd.DataFrame(cols)

    carried = ", ".join(
        f"{c} {docs.schema[c].dataType.simpleString()}" for c in carry_cols
    )
    schema = (
        f"{id_col} {docs.schema[id_col].dataType.simpleString()}, "
        + (carried + ", " if carried else "")
        + "wp_tokens array<string>, n_wp_tokens int"
    )
    return docs.select(id_col, *carry_cols, text_col).mapInPandas(
        _encode, schema=schema
    )
