"""Web-text cleaning operators for LLM training-data pipelines: rule-based
quality filtering (Gopher/C4-style), repetition statistics, and PII
detection/redaction.

No reference analog (`/root/reference` has no corpus-cleaning stage); these
implement the published rule families:

- Rae et al., "Scaling Language Models: Methods, Analysis & Insights from
  Training Gopher" (2021), Table A1 — word-count bounds, mean-word-length
  bounds, symbol ratios, alphabetic-word fraction, stopword floor, and
  repetition (top-n-gram fraction) filters.
- Raffel et al., "Exploring the Limits of Transfer Learning with a Unified
  Text-to-Text Transformer" (C4, 2020) — heuristic line/document filters.

All stages are stateless ``map_batches`` transforms over Arrow blocks with
regexes compiled once per worker (class attribute) — no cross-row state, so
they scale embarrassingly; at 100 TB they are pure streaming map stages.
Every rule is also expressible in ANSI SQL, so each operator has a full
value-checked DuckDB oracle in ``__ray_entry__.py``.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

import ray.data

from fonduer_ray.functions.textstats import STOPWORDS_EN

# Gopher-style rule thresholds (Rae et al. 2021, Table A1; adapted to the
# word-tokenized synthetic corpus: no line structure, so line rules are
# replaced by the top-bigram repetition rule).
MIN_WORDS = 20
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOPWORD_HITS = 2
MAX_TOP_BIGRAM_FRAC = 0.18


class QualityFilter:
    """(doc_id, text) -> per-rule signals + the final ``keep`` verdict.

    Emits every intermediate signal (not just the boolean) so downstream
    analyses can re-threshold without re-tokenizing — the pattern production
    cleaning pipelines use (filter decisions are cheap to recompute from
    signals, expensive from raw text).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_words, mean_len, alpha_frac, stop_hits, keeps = [], [], [], [], []
        for text in batch["text"].to_pylist():
            toks = (text or "").split()
            n = len(toks)
            n_words.append(n)
            if n == 0:
                mean_len.append(0.0)
                alpha_frac.append(0.0)
                stop_hits.append(0)
                keeps.append(False)
                continue
            ml = sum(len(t) for t in toks) / n
            af = sum(1 for t in toks if any(c.isalpha() for c in t)) / n
            sh = sum(1 for t in toks if t in STOPWORDS_EN)
            mean_len.append(ml)
            alpha_frac.append(af)
            stop_hits.append(sh)
            keeps.append(
                MIN_WORDS <= n <= MAX_WORDS
                and MIN_MEAN_WORD_LEN <= ml <= MAX_MEAN_WORD_LEN
                and af >= MIN_ALPHA_WORD_FRAC
                and sh >= MIN_STOPWORD_HITS
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "mean_word_len": pa.array(mean_len, pa.float64()),
                "alpha_word_frac": pa.array(alpha_frac, pa.float64()),
                "stopword_hits": pa.array(stop_hits, pa.int64()),
                "keep": pa.array(keeps, pa.bool_()),
            }
        )


class RepetitionStats:
    """Gopher-style repetition signals over the token stream:

    - ``top_bigram_frac``: fraction of tokens covered by the single most
      frequent bigram (ties broken lexicographically; each occurrence covers
      2 tokens, capped at 1.0),
    - ``dup_token_frac``: fraction of tokens that are a repeat of an earlier
      token in the same document,
    - ``max_run_len``: longest run of one token repeated consecutively.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        top_frac, dup_frac, max_run = [], [], []
        for text in batch["text"].to_pylist():
            toks = (text or "").split()
            n = len(toks)
            if n == 0:
                top_frac.append(0.0)
                dup_frac.append(0.0)
                max_run.append(0)
                continue
            if n == 1:
                top_frac.append(0.0)
            else:
                counts: dict[tuple[str, str], int] = {}
                prev = toks[0]
                for tok in toks[1:]:
                    key = (prev, tok)
                    counts[key] = counts.get(key, 0) + 1
                    prev = tok
                best_count = max(counts.values())
                top_frac.append(min(1.0, 2.0 * best_count / n))
            dup_frac.append((n - len(set(toks))) / n)
            run = best_run = 1
            for i in range(1, n):
                run = run + 1 if toks[i] == toks[i - 1] else 1
                if run > best_run:
                    best_run = run
            max_run.append(best_run)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "top_bigram_frac": pa.array(top_frac, pa.float64()),
                "dup_token_frac": pa.array(dup_frac, pa.float64()),
                "max_run_len": pa.array(max_run, pa.int64()),
            }
        )


# PII patterns — deliberately the RE2-compatible subset (no backrefs, no
# lookaround) so the DuckDB oracle runs the LITERAL same pattern strings.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d[\d-]{7,14}\d"


class PiiScan:
    """(doc_id, text) -> PII match counts + md5 of the redacted text.

    Detection is three compiled regexes (email, IPv4, E.164-ish phone) run
    per batch; redaction replaces matches with fixed tags in a fixed order
    (email, then ip, then phone) so the output is deterministic. The md5 of
    the redacted text lets the oracle value-check the full redaction without
    shipping the text back.
    """

    def __init__(self) -> None:
        self.email = re.compile(PII_EMAIL)
        self.ipv4 = re.compile(PII_IPV4)
        self.phone = re.compile(PII_PHONE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_email, n_ip, n_phone, digests = [], [], [], []
        for text in batch["text"].to_pylist():
            t = text or ""
            n_email.append(len(self.email.findall(t)))
            red = self.email.sub("<EMAIL>", t)
            n_ip.append(len(self.ipv4.findall(red)))
            red = self.ipv4.sub("<IP>", red)
            n_phone.append(len(self.phone.findall(red)))
            red = self.phone.sub("<PHONE>", red)
            digests.append(hashlib.md5(red.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_email": pa.array(n_email, pa.int64()),
                "n_ip": pa.array(n_ip, pa.int64()),
                "n_phone": pa.array(n_phone, pa.int64()),
                "redacted_md5": pa.array(digests, pa.string()),
            }
        )


def _apply(ds: "ray.data.Dataset", cls) -> "ray.data.Dataset":
    from fonduer_ray.stages.util import map_stage

    return map_stage(ds.select_columns(["doc_id", "text"]), cls, {}, 4096)


def quality_filter(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return _apply(ds, QualityFilter)


def repetition_stats(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return _apply(ds, RepetitionStats)


def pii_scan(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return _apply(ds, PiiScan)


def pii_scan_augmented(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """PII scan over a deterministic augmentation of the synthetic corpus.

    The test corpus contains no PII by construction, so the driver query
    exercises the scanner on ``text`` extended with table-derived synthetic
    PII (an email, an IP, and a phone number computed from ``doc_id``); the
    oracle mirrors the same augmentation in SQL. The operator itself
    (``pii_scan``) is augmentation-free."""

    def augment(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc_id = batch["doc_id"]
        # doc_id % 256 (pyarrow.compute has no modulo kernel; integer divide
        # truncates, so this is exact for the non-negative doc ids here)
        octet = pc.subtract(
            doc_id, pc.multiply(pc.divide(doc_id, 256), 256)
        )
        text = pc.binary_join_element_wise(
            pc.cast(batch["text"], pa.string()),
            " contact user",
            pc.cast(doc_id, pa.string()),
            "@example.com or 10.0.",
            pc.cast(octet, pa.string()),
            ".7 tel +1555",
            pc.cast(pc.add(doc_id, 1000000), pa.string()),
            "",
        )
        return pa.table({"doc_id": doc_id, "text": text})

    return _apply(
        ds.select_columns(["doc_id", "text"]).map_batches(
            augment, batch_format="pyarrow"
        ),
        PiiScan,
    )
