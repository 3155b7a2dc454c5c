"""Text-analysis operators over a documents table: token counting, quality
scoring, language ID, document fingerprinting.

All are vectorized-per-batch ``map_batches`` transforms over Arrow blocks;
the per-doc work is tokenization (regex, compiled once per actor) — no
Python-level cross-row state, so stages scale embarrassingly.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

import ray
import ray.data

from fonduer_ray.stages.util import get_broadcast


_BPE_ISH = re.compile(r"\w+|[^\w\s]")

STOPWORDS_EN = frozenset(
    "the a an and or of to in on for with at by from is are was were be been "
    "this that these those it its as not no but if then than so such".split()
)
_STOP_ES = frozenset("el la los las de del y en un una que es por con para no se su".split())
_STOP_DE = frozenset("der die das und oder von zu in mit ist sind ein eine nicht für auf".split())
_STOP_FR = frozenset("le la les de des et ou un une que est dans pour avec ne pas sur au".split())


class TokenStats:
    """(doc_id, text) -> n_tokens, n_unique, mean_token_len."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tokens, n_unique, mean_len = [], [], []
        for text in batch["text"].to_pylist():
            toks = (text or "").split()
            n_tokens.append(len(toks))
            n_unique.append(len(set(toks)))
            mean_len.append(
                (sum(len(t) for t in toks) / len(toks)) if toks else 0.0
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_unique": pa.array(n_unique, pa.int64()),
                "mean_token_len": pa.array(mean_len, pa.float64()),
            }
        )


class QualityScore:
    """Heuristic quality signals: stopword ratio, mean word length, digit
    ratio. Shape mirrors production web-text quality filters (length/punct/
    stopword-ratio family)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        stop_ratio, digit_ratio = [], []
        for text in batch["text"].to_pylist():
            toks = (text or "").split()
            if not toks:
                stop_ratio.append(0.0)
                digit_ratio.append(0.0)
                continue
            stop_ratio.append(sum(1 for t in toks if t in STOPWORDS_EN) / len(toks))
            digit_ratio.append(
                sum(1 for t in toks if any(c.isdigit() for c in t)) / len(toks)
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "stopword_ratio": pa.array(stop_ratio, pa.float64()),
                "digit_ratio": pa.array(digit_ratio, pa.float64()),
            }
        )


class TokenCount:
    """BPE-ish token counting: words + punctuation marks as separate tokens."""

    def __init__(self) -> None:
        self.rgx = _BPE_ISH

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [len(self.rgx.findall(t or "")) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_bpe_tokens": pa.array(counts, pa.int64())}
        )


class LangId:
    """N-gram/stopword-overlap language ID over {en, es, de, fr}; deterministic
    heuristic (no model downloads in this environment)."""

    TABLES = {"en": STOPWORDS_EN, "es": _STOP_ES, "de": _STOP_DE, "fr": _STOP_FR}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for text in batch["text"].to_pylist():
            toks = [t.lower() for t in (text or "").split()]
            best_lang, best = "und", 0.0
            for lang in sorted(self.TABLES):
                table = self.TABLES[lang]
                s = (sum(1 for t in toks if t in table) / len(toks)) if toks else 0.0
                if s > best:
                    best_lang, best = lang, s
            preds.append(best_lang)
            scores.append(best)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(preds, pa.string()),
                "lang_score": pa.array(scores, pa.float64()),
            }
        )


class Fingerprint:
    """Content fingerprints: md5 hex of the raw text + a 64-bit rolling
    (polynomial) hash over tokens."""

    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def __call__(self, batch: pa.Table) -> pa.Table:
        md5s, rolls = [], []
        for text in batch["text"].to_pylist():
            t = text or ""
            md5s.append(hashlib.md5(t.encode()).hexdigest())
            h = 0
            for tok in t.split():
                th = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                h = (h * self.BASE + th) % self.MOD
            rolls.append(h)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "md5": pa.array(md5s, pa.string()),
                "rolling_hash": pa.array(rolls, pa.int64()),
            }
        )


def _apply(ds: "ray.data.Dataset", cls, **kw) -> "ray.data.Dataset":
    from fonduer_ray.stages.util import map_stage

    return map_stage(ds, cls, kw.get("fn_constructor_kwargs", {}), 4096)


def token_stats(ds):
    return _apply(ds.select_columns(["doc_id", "text"]), TokenStats)


def quality_scores(ds):
    return _apply(ds.select_columns(["doc_id", "text"]), QualityScore)


def token_counts(ds):
    return _apply(ds.select_columns(["doc_id", "text"]), TokenCount)


def lang_id(ds):
    return _apply(ds.select_columns(["doc_id", "text"]), LangId)


def fingerprints(ds):
    return _apply(ds.select_columns(["doc_id", "text"]), Fingerprint)


def doc_top_tfidf(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-document top TF-IDF term: ``(doc_id, term, tf, df)``.

    The classic training-data relevance operator: term frequencies are
    doc-local (computed inside the map), document frequencies are a
    hash-partitioned distinct-count aggregate over (term, doc) pairs whose
    result — vocabulary-sized — broadcasts once via ``ray.put``; the final
    argmax (score = tf * ln(N/df), ties by term asc) is again doc-local.
    Only the tiny df table moves; the corpus never shuffles."""
    import math

    import pandas as pd

    import ray

    from fonduer_ray.stages.util import hash_groupby

    src = ds.select_columns(["doc_id", "text"])
    n_docs = src.count()

    def term_doc(batch: pa.Table) -> pa.Table:
        # per-block combiner: one row per (term, doc)
        doc_ids, terms = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for t in set((text or "").split()):
                doc_ids.append(doc_id)
                terms.append(t)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
            }
        )

    def df_agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", sort=False).size().reset_index(name="df")

    df_tbl = hash_groupby(
        src.map_batches(term_doc, batch_format="pyarrow"), ["term"], df_agg
    )
    dfs: dict[str, int] = {}
    for b in df_tbl.iter_batches(batch_size=65536, batch_format="pyarrow"):
        dfs.update(zip(b["term"].to_pylist(), b["df"].to_pylist()))
    dfs_ref = ray.put(dfs)

    def top_term(batch: pa.Table) -> pa.Table:
        lookup = get_broadcast(dfs_ref)
        out_ids, out_terms, out_tf, out_df = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = (text or "").split()
            if not toks:
                continue
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            best = None
            for t, f in tf.items():
                score = f * math.log(n_docs / lookup[t])
                key = (-score, t)
                if best is None or key < best[0]:
                    best = (key, t, f)
            out_ids.append(doc_id)
            out_terms.append(best[1])
            out_tf.append(best[2])
            out_df.append(lookup[best[1]])
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "term": pa.array(out_terms, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
                "df": pa.array(out_df, pa.int64()),
            }
        )

    return src.map_batches(top_term, batch_format="pyarrow")


def vocab_topk(ds: "ray.data.Dataset", k: int = 50) -> "ray.data.Dataset":
    """Global top-k tokens by corpus frequency — the Zipf-head report every
    tokenizer/vocab decision starts from. ``(token, n)``, ties broken by
    token ascending.

    Scale design: per-block Counter partials shrink the shuffle to distinct
    tokens per block; one token-keyed ``hash_groupby`` sums exactly (a
    token lives in one partition); each partition emits only its local
    top-k, so the final global sort runs over <= partitions x k rows."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    src = ds.select_columns(["text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch["text"].to_pylist():
            for t in (text or "").split():
                counts[t] = counts.get(t, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("token", sort=False)["n"].sum().reset_index()
        s = s.sort_values(["n", "token"], ascending=[False, True])
        return s.head(k).reset_index(drop=True)

    tops = hash_groupby(
        src.map_batches(partial, batch_format="pyarrow"), ["token"], local_topk
    )
    return tops.sort(["n", "token"], descending=[True, False]).limit(k)


#: above this many distinct tokens the unigram count table is no longer
#: broadcast as a driver dict — scoring switches to a hash-partition join
#: on the token (the guarded pattern shared with relational.attach_lookup)
VOCAB_FREQ_BROADCAST_LIMIT = 2_000_000


def lm_unigram_score(
    ds: "ray.data.Dataset", broadcast_limit: int = VOCAB_FREQ_BROADCAST_LIMIT
) -> "ray.data.Dataset":
    """Corpus-frequency language-model scoring (the CCNet-style LM quality
    signal, with the corpus itself as the LM): for every document, the sum
    over token INSTANCES of that token's corpus frequency, plus the token
    count — ``(doc_id, n_tokens, sum_freq)``. ``sum_freq / n_tokens`` is
    the mean token frequency: low means rare-token-heavy (gibberish, OCR
    noise), kept integer-exact so the oracle hashes bit-for-bit.

    Two passes over the corpus: (1) token counts via Counter partials +
    one token-keyed ``hash_groupby``; (2) scoring — below
    ``broadcast_limit`` the count table ships once via ``ray.put`` and
    scoring is a pure map; above it, docs explode to per-(doc, token) term
    frequencies, hash-join the count table on the token, and one doc-keyed
    ``hash_groupby`` sums ``tf * count`` (both paths bit-identical —
    integer sums)."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby, join_partitions

    src = ds.select_columns(["doc_id", "text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch["text"].to_pylist():
            for t in (text or "").split():
                counts[t] = counts.get(t, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts), pa.string()),
                "c": pa.array(list(counts.values()), pa.int64()),
            }
        )

    counts_tbl = hash_groupby(
        src.map_batches(count_partial, batch_format="pyarrow"),
        ["token"],
        lambda df: df.groupby("token", sort=False)["c"].sum().reset_index(),
        join_safe=True,  # may feed the over-limit Dataset.join below
    ).materialize()

    if counts_tbl.count() <= broadcast_limit:
        counts_ref = ray.put(
            {
                t: c
                for b in counts_tbl.iter_batches(
                    batch_size=65536, batch_format="pyarrow"
                )
                for t, c in zip(b["token"].to_pylist(), b["c"].to_pylist())
            }
        )

        def score(batch: pa.Table) -> pa.Table:
            lkp = get_broadcast(counts_ref)
            n_toks, sums = [], []
            for text in batch["text"].to_pylist():
                toks = (text or "").split()
                n_toks.append(len(toks))
                sums.append(sum(lkp[t] for t in toks))
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_tokens": pa.array(n_toks, pa.int64()),
                    "sum_freq": pa.array(sums, pa.int64()),
                }
            )

        return src.map_batches(score, batch_format="pyarrow")

    # join path: per-(doc, token) term frequencies keep the exploded table
    # at distinct-pairs size, the join shuffles on the token, and the final
    # doc-keyed groupby re-assembles integer sums
    def explode_tf(batch: pa.Table) -> pa.Table:
        doc_ids, tokens, tfs, lens = [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = (text or "").split()
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            for t, f in tf.items():
                doc_ids.append(doc_id)
                tokens.append(t)
                tfs.append(f)
                lens.append(len(toks))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "token": pa.array(tokens, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
            }
        )

    joined = src.map_batches(explode_tf, batch_format="pyarrow").join(
        counts_tbl,
        "inner",
        num_partitions=join_partitions(),
        on=("token",),
    )

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(part=df["tf"] * df["c"])
        out = df.groupby("doc_id", sort=False).agg(
            n_tokens=("n_tokens", "first"), sum_freq=("part", "sum")
        )
        return out.reset_index().astype(
            {"doc_id": "int64", "n_tokens": "int64", "sum_freq": "int64"}
        )

    return hash_groupby(joined, ["doc_id"], per_doc)


def source_stats(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-source corpus accounting — the host/domain-level report a crawl
    pipeline runs first: ``(source, n_docs, sum_chars, n_distinct_texts)``.

    One shuffle: per-block partials pre-aggregate on (source, md5(text)) so
    the exchange carries one row per distinct (source, digest) per block;
    a (source, digest)-keyed ``hash_groupby`` merges, then the tiny
    per-source rollup counts rows (= distinct texts) and sums. Distinctness
    is md5-based on both sides (the oracle uses ``md5(text)`` too) so the
    full text never shuffles."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    src = ds.select_columns(["source", "text", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict[tuple[str, str], list[int]] = {}
        for source, text, nc in zip(
            batch["source"].to_pylist(),
            batch["text"].to_pylist(),
            batch["n_chars"].to_pylist(),
        ):
            d = hashlib.md5((text or "").encode()).hexdigest()
            a = agg.get((source, d))
            if a is None:
                agg[(source, d)] = [1, int(nc)]
            else:
                a[0] += 1
                a[1] += int(nc)
        keys = list(agg)
        return pa.table(
            {
                "source": pa.array([k[0] for k in keys], pa.string()),
                "digest": pa.array([k[1] for k in keys], pa.string()),
                "n_docs": pa.array([v[0] for v in agg.values()], pa.int64()),
                "sum_chars": pa.array([v[1] for v in agg.values()], pa.int64()),
            }
        )

    merged = hash_groupby(
        src.map_batches(partial, batch_format="pyarrow"),
        ["source", "digest"],
        lambda df: df.groupby(["source", "digest"], sort=False)
        .agg(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
        .reset_index(),
    )

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("source", sort=False).agg(
            n_docs=("n_docs", "sum"),
            sum_chars=("sum_chars", "sum"),
            n_distinct_texts=("digest", "size"),
        )
        return out.reset_index()

    return hash_groupby(merged, ["source"], rollup)


def importance_weights(
    ds: "ray.data.Dataset",
    target_col: str = "lang",
    target_value: str = "en",
    scale: int = 1_000_000,
    broadcast_limit: int = VOCAB_FREQ_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"),
    integer-exact: per token the target-vs-corpus frequency ratio
    ``w(t) = (c_target(t) * scale) // c_all(t)``, per document the sum of
    ``w`` over token INSTANCES — ``(doc_id, n_tokens, importance)``.
    ``importance / (n_tokens * scale)`` is the mean target-likelihood
    ratio; rank-and-resample on it to skew a raw corpus toward the target
    distribution. Integer division keeps both engine and oracle bit-exact
    under any summation order.

    Same scale shape as :func:`lm_unigram_score`: one token-keyed
    ``hash_groupby`` computes (c_all, c_target) TOGETHER (the target
    counter rides the same shuffle — no second pass over the corpus);
    scoring broadcasts the weight map under ``broadcast_limit`` or
    explodes to per-(doc, token) tf rows and hash-joins above it, both
    paths bit-identical — including zero-token documents, which emit
    ``(doc_id, 0, 0)`` on both paths (the join path unions them back in,
    since they produce no tf rows to join)."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby, join_partitions

    src = ds.select_columns(["doc_id", "text", target_col])

    def count_partial(batch: pa.Table) -> pa.Table:
        c_all: dict[str, int] = {}
        c_tgt: dict[str, int] = {}
        for text, tv in zip(
            batch["text"].to_pylist(), batch[target_col].to_pylist()
        ):
            is_tgt = tv == target_value
            for t in (text or "").split():
                c_all[t] = c_all.get(t, 0) + 1
                if is_tgt:
                    c_tgt[t] = c_tgt.get(t, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(c_all), pa.string()),
                "c_all": pa.array(list(c_all.values()), pa.int64()),
                "c_tgt": pa.array(
                    [c_tgt.get(t, 0) for t in c_all], pa.int64()
                ),
            }
        )

    counts_tbl = hash_groupby(
        src.map_batches(count_partial, batch_format="pyarrow"),
        ["token"],
        lambda df: df.groupby("token", sort=False)[["c_all", "c_tgt"]]
        .sum()
        .reset_index(),
        join_safe=True,  # may feed the over-limit Dataset.join below
    ).materialize()

    if counts_tbl.count() <= broadcast_limit:
        w_ref = ray.put(
            {
                t: (ct * scale) // ca
                for b in counts_tbl.iter_batches(
                    batch_size=65536, batch_format="pyarrow"
                )
                for t, ca, ct in zip(
                    b["token"].to_pylist(),
                    b["c_all"].to_pylist(),
                    b["c_tgt"].to_pylist(),
                )
            }
        )

        def score(batch: pa.Table) -> pa.Table:
            w = get_broadcast(w_ref)
            n_toks, sums = [], []
            for text in batch["text"].to_pylist():
                toks = (text or "").split()
                n_toks.append(len(toks))
                sums.append(sum(w[t] for t in toks))
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_tokens": pa.array(n_toks, pa.int64()),
                    "importance": pa.array(sums, pa.int64()),
                }
            )

        return src.map_batches(score, batch_format="pyarrow")

    def explode_tf(batch: pa.Table) -> pa.Table:
        doc_ids, tokens, tfs, lens = [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = (text or "").split()
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            for t, f in tf.items():
                doc_ids.append(doc_id)
                tokens.append(t)
                tfs.append(f)
                lens.append(len(toks))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "token": pa.array(tokens, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
            }
        )

    joined = src.map_batches(explode_tf, batch_format="pyarrow").join(
        counts_tbl,
        "inner",
        num_partitions=join_partitions(),
        on=("token",),
    )

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(part=df["tf"] * ((df["c_tgt"] * scale) // df["c_all"]))
        out = df.groupby("doc_id", sort=False).agg(
            n_tokens=("n_tokens", "first"), importance=("part", "sum")
        )
        return out.reset_index().astype(
            {"doc_id": "int64", "n_tokens": "int64", "importance": "int64"}
        )

    # zero-token docs produce no tf rows, so the inner join would drop
    # them; union their (doc_id, 0, 0) rows back so both paths agree
    def zero_token_docs(batch: pa.Table) -> pa.Table:
        ids = [
            doc_id
            for doc_id, text in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            )
            if not (text or "").split()
        ]
        zeros = pa.array([0] * len(ids), pa.int64())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": zeros,
                "importance": zeros,
            }
        )

    return hash_groupby(joined, ["doc_id"], per_doc).union(
        src.map_batches(zero_token_docs, batch_format="pyarrow")
    )


def pmi_collocations(
    ds: "ray.data.Dataset",
    k: int = 50,
    min_count: int = 5,
    broadcast_limit: int = VOCAB_FREQ_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Top-k bigram collocations by pointwise mutual information — the
    classic phrase-mining signal (Church & Hanks 1990; the word2vec phrase
    pass uses the same count ratio).

    Ranking is by the EXACT INTEGER surrogate ``score = (n_xy * N * N) //
    (n_x * n_y)`` — monotone in PMI ``log(p(x,y)/(p(x)p(y)))`` for the
    shared corpus constants, so top-k by score equals top-k by PMI while
    staying bit-identical to a SQL oracle (no float log whose last ulp
    differs between libm builds). All quantities positive, so Arrow's
    truncated and DuckDB's floor division agree. Columns: ``(w1, w2, n_xy,
    score)``, ties broken by (w1, w2).

    Scale design: unigram and bigram counters both shrink per block before
    their one token-keyed / pair-keyed ``hash_groupby``; the min-count
    floor prunes the pair table right after its exact sum (Zipf tail —
    most of the table) so only head pairs reach the two count lookups,
    which ride the guarded broadcast-vs-``Dataset.join`` switch. The
    integer products stay under int64 for corpora to ~10^9 tokens with
    head-pair counts to ~10^4; past that, rescale N (ranking is invariant
    to a shared constant)."""
    import pandas as pd
    import pyarrow.compute as pc

    from fonduer_ray.pipelines.relational import attach_lookup
    from fonduer_ray.stages.util import hash_groupby

    src = ds.select_columns(["text"])

    def uni_partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch["text"].to_pylist():
            for t in (text or "").split():
                counts[t] = counts.get(t, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts), pa.string()),
                "c": pa.array(list(counts.values()), pa.int64()),
            }
        )

    # materialized: consumed three times (N sum + two guarded lookups)
    unic = hash_groupby(
        src.map_batches(uni_partial, batch_format="pyarrow"),
        ["token"],
        lambda df: df.groupby("token", sort=False)["c"].sum().reset_index(),
        join_safe=True,
    ).materialize()
    n_total = unic.sum("c")

    def big_partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple, int] = {}
        for text in batch["text"].to_pylist():
            toks = (text or "").split()
            for i in range(len(toks) - 1):
                pair = (toks[i], toks[i + 1])
                counts[pair] = counts.get(pair, 0) + 1
        return pa.table(
            {
                "w1": pa.array([p[0] for p in counts], pa.string()),
                "w2": pa.array([p[1] for p in counts], pa.string()),
                "n_xy": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def pair_sum_floor(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["w1", "w2"], sort=False)["n_xy"].sum().reset_index()
        return out[out["n_xy"] >= min_count]

    big = hash_groupby(
        src.map_batches(big_partial, batch_format="pyarrow"),
        ["w1", "w2"],
        pair_sum_floor,
        join_safe=True,
    )
    def c_to_c1(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [n if n != "c" else "c1" for n in t.column_names]
        )

    big = attach_lookup(big, unic, "w1", "token", "c", broadcast_limit)
    big = big.map_batches(c_to_c1, batch_format="pyarrow")
    big = attach_lookup(big, unic, "w2", "token", "c", broadcast_limit)

    def score(t: pa.Table) -> pa.Table:
        num = pc.multiply(pc.multiply(t["n_xy"], n_total), n_total)
        den = pc.multiply(t["c1"], t["c"])
        return pa.table(
            {
                "w1": t["w1"],
                "w2": t["w2"],
                "n_xy": t["n_xy"],
                "score": pc.divide(num, den),
            }
        )

    return (
        big.map_batches(score, batch_format="pyarrow")
        .sort(["score", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def token_zipf_stats(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-language Zipf-tail vocabulary report: ``(lang, n_tokens,
    vocab, hapax, dis, max_freq)`` — total token instances, distinct
    tokens, hapax/dis legomena (frequency-1 / frequency-2 tokens, the
    classic Zipf-tail mass every vocab-size and OOV-rate decision reads),
    and the head frequency. Whitespace tokenization, matching the
    ``string_split(text, ' ')`` oracle convention of
    :func:`vocab_topk` / :func:`lm_unigram_score`.

    Scale shape: per-block (lang, token) Counter partials shrink the
    first shuffle to distinct tokens per block; ONE (lang, token)-keyed
    ``hash_groupby`` sums exact frequencies and collapses each partition
    to per-lang PARTIAL tail stats (a (lang, token) group lives wholly in
    one partition, and vocab/hapax/dis/n_tokens are sums over tokens,
    max_freq a max — all mergeable); the second ``hash_groupby`` merges
    #langs-sized rows. Token rows never land on the driver."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    src = ds.select_columns(["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for lang, text in zip(
            batch["lang"].to_pylist(), batch["text"].to_pylist()
        ):
            for t in (text or "").split():
                key = (lang, t)
                counts[key] = counts.get(key, 0) + 1
        return pa.table(
            {
                "lang": pa.array([k[0] for k in counts], pa.string()),
                "token": pa.array([k[1] for k in counts], pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def lang_partials(df: pd.DataFrame) -> pd.DataFrame:
        tc = (
            df.groupby(["lang", "token"], sort=False)["n"].sum().reset_index()
        )
        n = tc["n"]
        return (
            tc.assign(hapax=(n == 1).astype("int64"),
                      dis=(n == 2).astype("int64"))
            .groupby("lang", sort=False)
            .agg(
                n_tokens=("n", "sum"),
                vocab=("n", "size"),
                hapax=("hapax", "sum"),
                dis=("dis", "sum"),
                max_freq=("n", "max"),
            )
            .reset_index()
        )

    partials = hash_groupby(
        src.map_batches(partial, batch_format="pyarrow"),
        ["lang", "token"],
        lang_partials,
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("lang", sort=False)
            .agg(
                n_tokens=("n_tokens", "sum"),
                vocab=("vocab", "sum"),
                hapax=("hapax", "sum"),
                dis=("dis", "sum"),
                max_freq=("max_freq", "max"),
            )
            .reset_index()
        )

    return hash_groupby(partials, ["lang"], merge)


def lang_vocab_topk(ds: "ray.data.Dataset", k: int = 10) -> "ray.data.Dataset":
    """Per-language top-``k`` tokens by frequency (ties: token ascending) —
    the grouped form of :func:`vocab_topk`, the per-corpus-slice vocab
    report a multilingual tokenizer build starts from.

    Scale design mirrors the global variant with one extra (small) hop:
    per-block ``(lang, token)`` Counter partials shrink the shuffle to
    distinct pairs per block; ONE ``(lang, token)``-keyed ``hash_groupby``
    sums exactly and emits only each partition's per-lang local top-k
    (complete counts for every pair it holds), so the final lang-keyed
    regroup runs over <= partitions x langs x k rows — never the full
    vocabulary."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    src = ds.select_columns(["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for lang, text in zip(
            batch["lang"].to_pylist(), batch["text"].to_pylist()
        ):
            for t in (text or "").split():
                counts[(lang, t)] = counts.get((lang, t), 0) + 1
        return pa.table(
            {
                "lang": pa.array([p[0] for p in counts], pa.string()),
                "token": pa.array([p[1] for p in counts], pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby(["lang", "token"], sort=False)["n"].sum().reset_index()
        s = s.sort_values(["lang", "n", "token"], ascending=[True, False, True])
        return s.groupby("lang", sort=False).head(k).reset_index(drop=True)

    def global_topk(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["lang", "n", "token"], ascending=[True, False, True])
        return s.groupby("lang", sort=False).head(k).reset_index(drop=True)

    tops = hash_groupby(
        src.map_batches(partial, batch_format="pyarrow"),
        ["lang", "token"],
        local_topk,
    )
    return hash_groupby(tops, ["lang"], global_topk)


def skipgram_pairs(
    ds: "ray.data.Dataset",
    window: int = 2,
    k: int = 50,
    min_count: int = 5,
) -> "ray.data.Dataset":
    """Top-k directed skip-gram (center, context) pairs within a +-window
    token distance — the training-pair generator behind word2vec SGNS
    (Mikolov et al. 2013): every ordered pair ``(t[i], t[j])`` with
    ``0 < |i - j| <= window`` counts once, so a symmetric co-occurrence
    contributes one pair in each direction. Whitespace tokenization,
    matching the ``string_split(text, ' ')`` convention of
    :func:`pmi_collocations`. Columns: ``(center, context, n)``, top-k
    by count with (center, context) tie-break.

    Scale shape: identical to the bigram pass of :func:`pmi_collocations`
    — per-block dict counters shrink the exchange to distinct pairs per
    block, ONE pair-keyed ``hash_groupby`` sums exact counts and applies
    the min-count floor inside the partition (pruning the Zipf tail
    before anything else moves), then a global top-k sort over the
    floored head. The 2*window pair streams per token ride the same
    single pass over each block; no driver-side token state."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    src = ds.select_columns(["text"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple, int] = {}
        for text in batch["text"].to_pylist():
            toks = (text or "").split()
            n = len(toks)
            for d in range(1, window + 1):
                for i in range(n - d):
                    fwd = (toks[i], toks[i + d])
                    counts[fwd] = counts.get(fwd, 0) + 1
                    bwd = (toks[i + d], toks[i])
                    counts[bwd] = counts.get(bwd, 0) + 1
        return pa.table(
            {
                "center": pa.array([p[0] for p in counts], pa.string()),
                "context": pa.array([p[1] for p in counts], pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def sum_floor(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["center", "context"], sort=False)["n"].sum().reset_index()
        )
        return out[out["n"] >= min_count]

    pairs = hash_groupby(
        src.map_batches(pair_partial, batch_format="pyarrow"),
        ["center", "context"],
        sum_floor,
    )
    return pairs.sort(
        ["n", "center", "context"], descending=[True, False, False]
    ).limit(k)


def source_quality_shrunk(
    ds: "ray.data.Dataset", alpha: int = 20
) -> "ray.data.Dataset":
    """Per-source quality with empirical-Bayes shrinkage — the crawl-
    prioritization score: a source's mean stopword-ratio quality signal
    (basis points, the curriculum_buckets convention) pulled toward the
    corpus mean with prior strength ``alpha``, so a source with 3 docs
    can't outrank one with 30k on noise.  All arithmetic is exact
    integers (floor division), bit-identical to the SQL oracle:
    ``mu = sum_all_bp // n_all``; ``shrunk_bp = (sum_bp + alpha * mu) //
    (n_docs + alpha)``.

    Scale shape: one stateless scoring pass with per-block (source,
    sum, count) combiners, ONE source-keyed ``hash_groupby`` merge, and a
    ``repartition(1)`` finish over the bounded per-source table (sources
    number in the thousands at web scale) that computes the global mean
    and the shrinkage vectorized. Columns ``(source, n_docs, mean_bp,
    shrunk_bp)``, ordered by source."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    src = ds.select_columns(["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict[str, list[int]] = {}
        for source, text in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = (text or "").split()
            n = len(toks)
            n_stop = sum(1 for t in toks if t in STOPWORDS_EN)
            bp = n_stop * 10000 // n if n else 0
            a = agg.get(source)
            if a is None:
                agg[source] = [bp, 1]
            else:
                a[0] += bp
                a[1] += 1
        keys = list(agg)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "sum_bp": pa.array([agg[k][0] for k in keys], pa.int64()),
                "n_docs": pa.array([agg[k][1] for k in keys], pa.int64()),
            }
        )

    merged = hash_groupby(
        ds.select_columns(["source", "text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["source"],
        lambda df: df.groupby("source", sort=False)
        .agg(sum_bp=("sum_bp", "sum"), n_docs=("n_docs", "sum"))
        .reset_index(),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        mu = int(df["sum_bp"].sum()) // int(df["n_docs"].sum())
        out = pd.DataFrame(
            {
                "source": df["source"],
                "n_docs": df["n_docs"].astype("int64"),
                "mean_bp": (df["sum_bp"] // df["n_docs"]).astype("int64"),
                "shrunk_bp": (
                    (df["sum_bp"] + alpha * mu) // (df["n_docs"] + alpha)
                ).astype("int64"),
            }
        )
        return out.sort_values("source").reset_index(drop=True)

    return merged.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )
