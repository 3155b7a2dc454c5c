"""Training-data preparation operators: token-window chunking, GPT-style
sequence packing, and benchmark decontamination.

These are the operators a 100 TB LLM-pretraining pipeline runs after
cleaning/dedup (no reference analog in fonduer — they come from the
large-scale-training-data brief):

- ``chunk_documents``: split each document's token stream into fixed-size
  overlapping windows. Pure per-document ``map_batches`` — embarrassingly
  parallel, no shuffle.
- ``pack_sequences``: concatenate all documents in ``doc_id`` order and cut
  the global token stream into fixed-length sequences (the standard
  concat-and-chunk packing used for causal-LM pretraining). Needs a global
  prefix sum over token counts; implemented as a bucketed two-level scan so
  the driver only ever holds one row per bucket (<= ``n_buckets``), never
  one per document.
- ``decontaminate``: flag documents sharing any word n-gram with a held-out
  benchmark set. The benchmark side is by construction tiny relative to the
  corpus; below ``broadcast_limit`` distinct grams it is shipped once via
  ``ray.put`` and probed per batch, above it the probe runs as a
  hash-partition ``Dataset.join`` on the gram — nothing unbounded ever
  lands on the driver.

Tokenization matches the rest of the repo: single-space word split (the
corpus is single-space normalized; see ``textstats``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from fonduer_ray.stages.util import get_broadcast, hash_groupby

#: distinct benchmark grams above which decontaminate switches from a
#: broadcast set to a hash-partition join (same guard style as
#: relational.attach_lookup / linking.link_triples)
GRAM_BROADCAST_LIMIT = 2_000_000

#: buckets for the packing prefix sum: the driver holds exactly one partial
#: sum per bucket, so memory is O(n_buckets) regardless of corpus size
PACK_BUCKETS = 1024


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def chunk_documents(
    ds: "ray.data.Dataset", max_tokens: int = 64, stride: int = 48
) -> "ray.data.Dataset":
    """Split each document into token windows of at most ``max_tokens``
    starting every ``stride`` tokens (overlapping when stride < max_tokens).

    Output: one row per (doc, window):
    ``(doc_id, chunk_idx, chunk_start, n_tokens, chunk_text)``.
    Empty documents emit no rows. Pure map — no shuffle, streams at any
    scale."""
    if stride <= 0:
        raise ValueError("stride must be positive")

    def chunk(batch: pa.Table) -> pa.Table:
        doc_ids, idxs, starts, lens, texts = [], [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = (text or "").split()
            n = len(toks)
            for ci, start in enumerate(range(0, n, stride)):
                end = min(start + max_tokens, n)
                doc_ids.append(did)
                idxs.append(ci)
                starts.append(start)
                lens.append(end - start)
                texts.append(" ".join(toks[start:end]))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "chunk_start": pa.array(starts, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "chunk_text": pa.array(texts, pa.string()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def _token_counts(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, text) -> (doc_id, n) token counts; narrow rows only."""

    def count(batch: pa.Table) -> pa.Table:
        ns = [len((t or "").split()) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "n": pa.array(ns, pa.int64())}
        )

    return ds.map_batches(count, batch_format="pyarrow")


def pack_sequences(
    ds: "ray.data.Dataset",
    seq_len: int = 256,
    n_buckets: int = PACK_BUCKETS,
) -> "ray.data.Dataset":
    """Concat-and-chunk sequence packing: documents are concatenated in
    ``doc_id`` order and the global token stream is cut into consecutive
    sequences of ``seq_len`` tokens.

    Output: the (sequence, document-slice) assignment map, one row per
    contiguous slice of a document inside a sequence:
    ``(seq_id, doc_id, doc_tok_start, seq_tok_start, n_toks)``. A long
    document spans several sequences (several rows); a short sequence packs
    several documents. The writer stage that actually emits token tensors
    consumes this map joined back to the text — the map itself is what
    needs the global coordination.

    Scale design — distributed prefix sum in two passes:
    1. per-doc token counts are bucketed by ``doc_id`` range into
       ``n_buckets`` coarse buckets; per-bucket sums aggregate via
       ``hash_groupby`` (one row per bucket).
    2. the driver cumsums the <=``n_buckets`` bucket totals (O(n_buckets)
       driver memory, independent of corpus size) and broadcasts the bucket
       base offsets; a per-bucket ``map_groups`` then computes exact
       per-document offsets with a local sorted cumsum.
    The final window assignment is a vectorized flat map (numpy repeat) —
    no further shuffle."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    # materialize the (doc_id, n) counts: narrow rows, but consumed three
    # times below (max, bucket sums, offsets) — lazy, each consumption
    # re-tokenized the FULL corpus text
    counts = _token_counts(ds).materialize()

    max_id = counts.max("doc_id")
    if max_id is None:
        return ray.data.from_arrow(_empty_pack_table())
    span = int(max_id) + 1
    n_buckets = max(1, min(n_buckets, span))

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        b = (ids.astype(np.int64) * n_buckets) // span
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    bucketed = counts.map_batches(add_bucket, batch_format="pyarrow")

    # pass 1: one row per bucket -> driver cumsum (bounded by n_buckets)
    bucket_sums = hash_groupby(
        bucketed.select_columns(["bucket", "n"]),
        ["bucket"],
        lambda df: df.groupby("bucket", sort=False)["n"].sum().reset_index(),
    ).take_all()
    bucket_sums.sort(key=lambda r: r["bucket"])
    base, bases = 0, {}
    for row in bucket_sums:
        bases[row["bucket"]] = base
        base += int(row["n"])
    bases_ref = ray.put(bases)

    # pass 2: exact per-doc offsets inside each bucket (local sorted cumsum)
    def bucket_offsets(g: pd.DataFrame) -> pd.DataFrame:
        bases_map = get_broadcast(bases_ref)
        g = g.sort_values("doc_id", ignore_index=True)
        n = g["n"].to_numpy(dtype=np.int64)
        off = np.cumsum(n) - n + bases_map[int(g["bucket"].iloc[0])]
        return pd.DataFrame({"doc_id": g["doc_id"], "n": n, "off": off})

    offsets = bucketed.groupby("bucket").map_groups(
        bucket_offsets, batch_format="pandas"
    )

    # final: vectorized window assignment
    def assign(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        off = batch["off"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n > 0
        n, off, ids = n[keep], off[keep], ids[keep]
        first = off // seq_len
        last = (off + n - 1) // seq_len
        reps = (last - first + 1).astype(np.int64)
        if len(reps) == 0 or reps.sum() == 0:
            return _empty_pack_table()
        doc_id = np.repeat(ids, reps)
        doc_off = np.repeat(off, reps)
        doc_n = np.repeat(n, reps)
        # seq_id = first_i + position-within-run
        run_start = np.repeat(first, reps)
        pos = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        seq_id = run_start + pos
        s = np.maximum(doc_off, seq_id * seq_len)
        e = np.minimum(doc_off + doc_n, (seq_id + 1) * seq_len)
        return pa.table(
            {
                "seq_id": pa.array(seq_id, pa.int64()),
                "doc_id": pa.array(doc_id, pa.int64()),
                "doc_tok_start": pa.array(s - doc_off, pa.int64()),
                "seq_tok_start": pa.array(s - seq_id * seq_len, pa.int64()),
                "n_toks": pa.array(e - s, pa.int64()),
            }
        )

    return offsets.map_batches(assign, batch_format="pyarrow")


def _empty_pack_table() -> pa.Table:
    return pa.table(
        {
            "seq_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "doc_tok_start": pa.array([], pa.int64()),
            "seq_tok_start": pa.array([], pa.int64()),
            "n_toks": pa.array([], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def _doc_ngrams(text: str, n: int) -> set[str]:
    toks = (text or "").split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def decontaminate(
    ds: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    n: int = 8,
    broadcast_limit: int = GRAM_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Flag corpus documents that share any word ``n``-gram with a held-out
    benchmark/eval set (test-set decontamination).

    Output: one row per corpus document
    ``(doc_id, n_matched, contaminated)`` where ``n_matched`` counts the
    document's DISTINCT n-grams that appear anywhere in the benchmark and
    ``contaminated`` is 0/1.

    Strategy: benchmark n-grams are deduplicated distributed-side first.
    At or below ``broadcast_limit`` distinct grams they ship once via
    ``ray.put`` as a frozenset probed per batch (benchmarks are small —
    this is the normal path). Above the limit, the probe becomes a
    hash-partition ``Dataset.join`` on the gram string followed by a
    per-doc count — the 100 TB-safe path, same switch as
    ``relational.attach_lookup``."""

    def bench_grams(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for text in batch["text"].to_pylist():
            grams |= _doc_ngrams(text, n)
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    # materialize the distinct grams ONCE: the size guard needs a count and
    # both paths then consume the same rows — without this, count() +
    # consumption would execute the dedup twice
    bgrams = hash_groupby(
        benchmark.map_batches(bench_grams, batch_format="pyarrow"),
        ["gram"],
        lambda df: df.drop_duplicates(ignore_index=True),
        join_safe=True,  # feeds the over-limit Dataset.join probe below
    ).materialize()

    if bgrams.count() <= broadcast_limit:
        bench_ref = ray.put(
            frozenset(
                g
                for batch in bgrams.iter_batches(
                    batch_size=65536, batch_format="pyarrow"
                )
                for g in batch["gram"].to_pylist()
            )
        )

        def probe(batch: pa.Table) -> pa.Table:
            bench_set = get_broadcast(bench_ref)
            matched = [
                len(_doc_ngrams(text, n) & bench_set)
                for text in batch["text"].to_pylist()
            ]
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_matched": pa.array(matched, pa.int64()),
                    "contaminated": pa.array(
                        [1 if m else 0 for m in matched], pa.int64()
                    ),
                }
            )

        return ds.map_batches(probe, batch_format="pyarrow")

    # join path: explode corpus docs to distinct (doc_id, gram), inner-join
    # the benchmark grams, count matches per doc, left-attach zeros
    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, grams = [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for g in _doc_ngrams(text, n):
                doc_ids.append(did)
                grams.append(g)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "gram": pa.array(grams, pa.string()),
            }
        )

    from fonduer_ray.stages.util import join_partitions

    n_parts = join_partitions()
    matches = (
        ds.map_batches(explode, batch_format="pyarrow")
        .join(bgrams, "inner", num_partitions=n_parts, on=("gram",))
    )
    per_doc = hash_groupby(
        matches.select_columns(["doc_id"]),
        ["doc_id"],
        lambda df: df.groupby("doc_id", sort=False)
        .size()
        .rename("n_matched")
        .reset_index(),
        join_safe=True,  # right side of the left_outer attach join below
    )
    # left-outer attach match counts onto the full doc list (docs with zero
    # matches must still appear) — fully distributed, nothing on the driver
    attached = ds.select_columns(["doc_id"]).join(
        per_doc, "left_outer", num_partitions=n_parts, on=("doc_id",)
    )

    def fill_zero(batch: pa.Table) -> pa.Table:
        m = batch["n_matched"].to_pandas().fillna(0).astype(np.int64).to_numpy()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_matched": pa.array(m, pa.int64()),
                "contaminated": pa.array((m > 0).astype(np.int64)),
            }
        )

    return attached.map_batches(fill_zero, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# data mixing
# ---------------------------------------------------------------------------


def mixture_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    key_col: str,
    weights_pct: dict[str, int],
    total: int,
) -> "ray.data.Dataset":
    """Deterministic weighted data mixing: draw a sample whose group
    proportions follow ``weights_pct`` (integer percents; quota per group =
    ``total * pct // 100``) — the source/language-mixing step of a
    pretraining pipeline.

    Per group, the quota rows with the smallest md5-low-64 of ``key_col``
    win: a uniform within-group sample that is mergeable (per-block
    bottom-quota partials, then one group-keyed merge — same trick as
    ``sketches.sample_per_group`` but with a per-group quota) and exactly
    reproducible in SQL (``row_number() OVER (PARTITION BY g ORDER BY
    hv) <= quota``). Groups absent from ``weights_pct`` are excluded;
    groups with fewer rows than their quota return all their rows.
    Output: ``(group_col, rank [1-based within group], key_col)``."""
    from fonduer_ray.functions.dedup import _md5_64

    quotas = {g: (total * pct) // 100 for g, pct in weights_pct.items()}
    q_ref = ray.put(quotas)

    def partial(t: pa.Table) -> pa.Table:
        q = get_broadcast(q_ref)
        df = t.select([group_col, key_col]).to_pandas()
        df = df[df[group_col].isin(q)]
        hv = np.fromiter(
            (_md5_64(str(k)) for k in df[key_col]),
            dtype=np.uint64,
            count=len(df),
        )
        df["_hv"] = hv
        df = df.sort_values("_hv", kind="stable")
        kept = df.groupby(group_col, sort=False, group_keys=False).apply(
            lambda g: g.head(q[g.name])
        )
        return pa.Table.from_pandas(kept, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        q = get_broadcast(q_ref)
        df = df.sort_values("_hv", kind="stable")
        out = df.groupby(group_col, sort=False, group_keys=False).apply(
            lambda g: g.head(q[g.name])
        )
        out = out.copy()
        out["rank"] = out.groupby(group_col, sort=False).cumcount() + 1
        out["rank"] = out["rank"].astype("int64")
        return out.drop(columns=["_hv"])[[group_col, "rank", key_col]]

    return hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), [group_col], merge
    )


def packed_sequence_text(
    ds: "ray.data.Dataset",
    seq_len: int = 256,
    n_buckets: int = PACK_BUCKETS,
) -> "ray.data.Dataset":
    """Materialize the packed sequences: join the ``pack_sequences``
    assignment map back to the document text and assemble each sequence's
    token stream in order. Output: ``(seq_id, n_docs, n_toks, text)`` —
    every row except the final sequence carries exactly ``seq_len``
    tokens.

    Scale design: the (narrow, 5-int-column) assignment map is first
    collapsed to ONE row per document carrying its slice list, so the text
    join ships each document's text exactly once — a 25k-token doc at
    seq_len=256 previously paid ~100x text replication through the join
    shuffle (per-slice join rows). Each joined row splits its text once
    and emits per-slice substrings; one ``hash_groupby`` on ``seq_id``
    then concatenates slices ordered by ``seq_tok_start``. Shuffle bytes
    are O(corpus text) + O(slice count x 40B), independent of the
    slices-per-doc fanout. Nothing driver-side beyond the packing prefix
    sum's bucket partials."""
    mapping = pack_sequences(ds, seq_len=seq_len, n_buckets=n_buckets)
    joined = _per_doc_slices(mapping, ds)

    def slice_rows(batch: pa.Table) -> pa.Table:
        seq_ids, sstarts_out, ntoks_out, parts = [], [], [], []
        for text, blob in zip(
            batch["text"].to_pylist(), batch["slices"].to_pylist()
        ):
            sids, dstarts, sstarts, ks = np.frombuffer(
                blob, dtype=np.int64
            ).reshape(4, -1)
            toks = (text or "").split()
            for sid, s, ss, k in zip(sids, dstarts, sstarts, ks):
                seq_ids.append(sid)
                sstarts_out.append(ss)
                ntoks_out.append(k)
                parts.append(" ".join(toks[s : s + k]))
        return pa.table(
            {
                "seq_id": pa.array(seq_ids, pa.int64()),
                "seq_tok_start": pa.array(sstarts_out, pa.int64()),
                "n_toks": pa.array(ntoks_out, pa.int64()),
                "part": pa.array(parts, pa.string()),
            }
        )

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for seq_id, g in df.groupby("seq_id", sort=False):
            g = g.sort_values("seq_tok_start")
            rows.append(
                {
                    "seq_id": int(seq_id),
                    "n_docs": len(g),
                    "n_toks": int(g["n_toks"].sum()),
                    "text": " ".join(g["part"]),
                }
            )
        return pd.DataFrame(rows)

    return hash_groupby(
        joined.map_batches(slice_rows, batch_format="pyarrow"),
        ["seq_id"],
        assemble,
    )


def _per_doc_slices(
    mapping: "ray.data.Dataset", ds: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Collapse the ``pack_sequences`` assignment map to one row per doc
    and join the document text on — each doc's text crosses the join
    shuffle exactly once, regardless of how many sequences the doc spans.
    The slice lists ride as ONE binary column (a 4xK int64 matrix:
    seq_id / doc_tok_start / seq_tok_start / n_toks per slice) because
    Acero's hash join rejects list-typed payload columns. Exposed for the
    replication regression test (asserts joined row count == n_docs, not
    n_slices)."""
    from fonduer_ray.stages.util import join_partitions

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "doc_tok_start"], kind="stable")
        rows = []
        for doc_id, g in df.groupby("doc_id", sort=False):
            mat = np.array(
                [g["seq_id"], g["doc_tok_start"], g["seq_tok_start"], g["n_toks"]],
                dtype=np.int64,
            )
            rows.append({"doc_id": int(doc_id), "slices": mat.tobytes()})
        return pd.DataFrame(rows, columns=["doc_id", "slices"])

    # join_safe: hash_groupby's map_groups can emit zero-column empty
    # blocks that break Dataset.join partitions receiving only such shards
    per_doc_map = hash_groupby(mapping, ["doc_id"], per_doc, join_safe=True)
    return per_doc_map.join(
        ds,
        "inner",
        num_partitions=join_partitions(),
        on=("doc_id",),
    )


# ---------------------------------------------------------------------------
# composed corpus cleaning
# ---------------------------------------------------------------------------


def clean_corpus(
    ds: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    n: int = 8,
    broadcast_limit: int = GRAM_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """The composed LLM-corpus cleaning decision, one verdict row per doc:
    ``(doc_id, keep_quality, is_dup, contaminated, kept)`` where ``kept``
    = passes the Gopher/C4-style quality filter AND is its exact-text
    group's keeper (min doc_id) AND shares no ``n``-gram with the
    benchmark.

    Single-shuffle composition: quality signals and the benchmark-gram
    probe are per-doc map work (the gram set ships once via ``ray.put`` —
    benchmarks are small; see :func:`decontaminate` for the join path
    above ``broadcast_limit``), so both ride the SAME ``map_batches`` that
    feeds the one hash shuffle on ``text`` that exact-dedup needs. Total
    data movement = one shuffle of (doc_id, text-hash-partitioned rows),
    identical to running exact dedup alone."""
    from fonduer_ray.functions.webclean import QualityFilter

    def bench_grams(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for text in batch["text"].to_pylist():
            grams |= _doc_ngrams(text, n)
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    bgrams = hash_groupby(
        benchmark.map_batches(bench_grams, batch_format="pyarrow"),
        ["gram"],
        lambda df: df.drop_duplicates(ignore_index=True),
    ).materialize()
    if bgrams.count() > broadcast_limit:
        raise ValueError(
            "benchmark gram set exceeds the broadcast limit; run "
            "decontaminate() (join path) and compose verdicts via its output"
        )
    bench_ref = ray.put(
        frozenset(
            g
            for batch in bgrams.iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
            for g in batch["gram"].to_pylist()
        )
    )
    qf = QualityFilter()

    def signals(batch: pa.Table) -> pa.Table:
        bench_set = get_broadcast(bench_ref)
        q = qf(batch)
        contaminated = [
            1 if (_doc_ngrams(text, n) & bench_set) else 0
            for text in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                "keep_quality": pa.array(
                    [1 if k else 0 for k in q["keep"].to_pylist()], pa.int64()
                ),
                "contaminated": pa.array(contaminated, pa.int64()),
            }
        )

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        keeper = df.groupby("text", sort=False)["doc_id"].transform("min")
        df = df.copy()
        df["is_dup"] = (df["doc_id"] != keeper).astype("int64")
        df["kept"] = (
            (df["keep_quality"] == 1)
            & (df["is_dup"] == 0)
            & (df["contaminated"] == 0)
        ).astype("int64")
        return df[["doc_id", "keep_quality", "is_dup", "contaminated", "kept"]]

    return hash_groupby(
        ds.map_batches(signals, batch_format="pyarrow"), ["text"], verdict
    )


# ---------------------------------------------------------------------------
# end-to-end: cleaned + packed + resumable write
# ---------------------------------------------------------------------------


def prepare_training_data(
    ds: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    out_dir: str,
    seq_len: int = 256,
    n: int = 8,
    n_buckets: int = 16,
) -> dict:
    """The full training-data pipeline with a checkpoint-resumable sink:
    clean (quality + exact-dedup + decontaminate) -> pack kept docs into
    ``seq_len``-token sequences -> write bucketed Parquet with
    per-partition lineage manifests (``stages/materialize.py``).
    Re-running against a completed output returns immediately without
    executing the upstream pipeline (the sink's manifest check happens
    before the lazy DAG runs). Returns the write summary dict."""
    from fonduer_ray.stages.materialize import completed_buckets, write_triples
    from fonduer_ray.stages.util import join_partitions

    config_hash = f"training_sequences:{seq_len}:{n}:{n_buckets}"

    # resume fast path FIRST: once all buckets carry manifests, skip the
    # pipeline entirely (the materialize below would otherwise execute it)
    if len(completed_buckets(out_dir, config_hash)) >= n_buckets:
        return write_triples(
            ray.data.from_items([]),  # never consumed: write returns early
            out_dir,
            config_hash,
            n_buckets=n_buckets,
            key_col="seq_key",
            stage="training_sequences",
        )

    verdicts = clean_corpus(ds, benchmark, n=n)
    # repartition: drops the schemaless zero-row blocks empty hash
    # partitions emit (acero's join rejects a side containing a block
    # without the key column) — same fix as train_stage's weight table
    kept_ids = (
        verdicts.filter(expr="kept == 1")
        .select_columns(["doc_id"])
        .repartition(join_partitions())
    )
    # materialize: pack_sequences scans its input three times (max, bucket
    # partials, offsets) and the text join consumes it again — lazy, that
    # re-executed the whole clean+semi-join upstream 4x (measured 72s -> 27s
    # for the 480k-doc bench headline). The repartition also drops empty
    # schemaless join blocks.
    kept_docs = (
        ds.join(
            kept_ids,
            "left_semi",
            num_partitions=join_partitions(),
            on=("doc_id",),
        )
        .repartition(join_partitions())
        .materialize()
    )
    seqs = packed_sequence_text(kept_docs, seq_len=seq_len)

    def add_key(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "seq_key",
            pa.array([str(s) for s in batch["seq_id"].to_pylist()], pa.string()),
        )

    return write_triples(
        seqs.map_batches(add_key, batch_format="pyarrow"),
        out_dir,
        config_hash,
        n_buckets=n_buckets,
        key_col="seq_key",
        stage="training_sequences",
    )


def stratified_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    key_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
) -> "ray.data.Dataset":
    """Deterministic per-stratum RATE sampling — the downsample-by-source
    step of a crawl pipeline (keep 10% of source A, 50% of B, drop the
    rest): a row survives iff ``md5_low64(key) % 100 < rate_pct[group]``.

    Pure stateless map (the rates dict broadcasts in the task closure) —
    no shuffle, no driver state, trivially resumable; complementary to
    :func:`mixture_sample`, which hits exact QUOTAS but needs a per-group
    merge. Output: the surviving ``(group_col, key_col)`` rows."""
    from fonduer_ray.functions.dedup import _md5_64

    rates_ref = ray.put(dict(rates_pct))

    def keep(t: pa.Table) -> pa.Table:
        rates = get_broadcast(rates_ref)
        groups = t[group_col].to_pylist()
        keys = t[key_col].to_pylist()
        mask = [
            _md5_64(str(k)) % 100 < rates.get(g, default_pct)
            for g, k in zip(groups, keys)
        ]
        return t.select([group_col, key_col]).filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_systematic_sample(
    ds: "ray.data.Dataset",
    key_col: str,
    weight_col: str,
    n_out: int = 100,
) -> "ray.data.Dataset":
    """Deterministic weight-proportional sampling (systematic / low-variance
    resampling): walk the cumulative weight line in key order and keep a
    row whenever its weight interval crosses one of ``n_out`` evenly
    spaced strata — each row's selection probability is proportional to
    its weight, rows heavier than one stratum are always kept, and the
    result is a pure function of the data (no RNG; the mixture/stratified
    samplers cover the hash-jittered variants).

    Selection rule, exact in integers: keep row i iff
    ``(cum_i * n_out) // total > ((cum_i - w_i) * n_out) // total`` where
    ``cum`` is the inclusive prefix sum of ``weight_col`` in ``key_col``
    order. One range shuffle (the prefix scan); the filter is stateless.
    PRECONDITION: ``key_col`` unique, weights as non-negative int64.
    Returns ``(key_col, weight_col)`` for the selected rows."""
    from fonduer_ray.stages.util import ordered_prefix_sum

    scanned = ordered_prefix_sum(
        ds.select_columns([key_col, weight_col]), key_col, [weight_col]
    ).materialize()
    total = scanned.max(f"{weight_col}_cum") or 0
    if total <= 0:
        schema = ds.schema()
        types = dict(zip(schema.names, schema.types))
        return ray.data.from_arrow(
            pa.table({key_col: pa.array([], types[key_col]),
                      weight_col: pa.array([], types[weight_col])})
        )

    def pick(t: pa.Table, _tot=int(total), _n=n_out) -> pa.Table:
        cum = t[f"{weight_col}_cum"].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False)
        keep = (cum * _n) // _tot > ((cum - w) * _n) // _tot
        return pa.table(
            {key_col: t[key_col].filter(pa.array(keep)),
             weight_col: t[weight_col].filter(pa.array(keep))}
        )

    return scanned.map_batches(pick, batch_format="pyarrow")


def curriculum_buckets(
    ds: "ray.data.Dataset", n_buckets: int = 10
) -> "ray.data.Dataset":
    """Curriculum binning: rank every document by an integer quality
    score (stopword basis points — ``n_stopwords * 10000 // n_tokens``,
    the :class:`~fonduer_ray.functions.textstats.QualityScore` signal in
    exact integers) and split the corpus into ``n_buckets`` equal-depth
    NTILE buckets, reporting per bucket the doc count, total token mass
    and score range. The table a curriculum / data-mixing schedule reads
    before ordering training shards from cleanest to noisiest.

    Scale shape: one stateless scoring map, then ONE range shuffle — the
    two-pass distributed prefix scan of
    :func:`~fonduer_ray.stages.util.ordered_prefix_sum` over a packed
    ``(score << 48) | doc_id`` key (driver state = O(#blocks) partials)
    — gives every doc its exact global rank; the NTILE bucket is a
    closed-form function of (rank, N), and the per-bucket rollup is a
    per-block combiner plus an ``n_buckets``-row merge. Ranks, buckets
    and sums never leave the workers. Columns: ``(bucket, n_docs,
    n_tokens, min_stop_bp, max_stop_bp)``, ordered by bucket."""
    from fonduer_ray.functions.textstats import STOPWORDS_EN
    from fonduer_ray.stages.util import hash_groupby, ordered_prefix_sum

    src = ds.select_columns(["doc_id", "text"])
    n_total = src.count()

    def score(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        bps, ntoks = [], []
        for text in batch["text"].to_pylist():
            toks = (text or "").split()
            n = len(toks)
            n_stop = sum(1 for t in toks if t in STOPWORDS_EN)
            bps.append(n_stop * 10000 // n if n else 0)
            ntoks.append(n)
        key = [(bp << 48) | d for bp, d in zip(bps, doc_ids)]
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "stop_bp": pa.array(bps, pa.int64()),
                "n_toks": pa.array(ntoks, pa.int64()),
                "one": pa.array([1] * len(bps), pa.int64()),
            }
        )

    ranked = ordered_prefix_sum(
        src.map_batches(score, batch_format="pyarrow"), "key", ["one"]
    )

    def to_bucket(t: pa.Table) -> pa.Table:
        # NTILE(n_buckets): first (N % n_buckets) buckets hold one extra row
        r = t["one_cum"].to_numpy(zero_copy_only=False) - 1  # 0-based rank
        small, rem = divmod(n_total, n_buckets)
        big = small + 1
        cut = rem * big
        with np.errstate(divide="ignore", invalid="ignore"):
            bucket = np.where(
                r < cut,
                r // big + 1 if big else 1,
                rem + (np.maximum(r - cut, 0) // max(small, 1)) + 1,
            )
        df = pd.DataFrame(
            {
                "bucket": bucket.astype(np.int64),
                "stop_bp": t["stop_bp"].to_numpy(zero_copy_only=False),
                "n_toks": t["n_toks"].to_numpy(zero_copy_only=False),
            }
        )
        out = df.groupby("bucket", sort=False).agg(
            n_docs=("n_toks", "size"),
            n_tokens=("n_toks", "sum"),
            min_stop_bp=("stop_bp", "min"),
            max_stop_bp=("stop_bp", "max"),
        )
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    return hash_groupby(
        ranked.map_batches(to_bucket, batch_format="pyarrow"),
        ["bucket"],
        lambda df: df.groupby("bucket", sort=False)
        .agg(
            n_docs=("n_docs", "sum"),
            n_tokens=("n_tokens", "sum"),
            min_stop_bp=("min_stop_bp", "min"),
            max_stop_bp=("max_stop_bp", "max"),
        )
        .reset_index(),
    ).sort("bucket")
