"""Flagship KG-construction pipeline: web pages -> canonical triple table.

parse -> mention-extract -> candidate -> label/score -> link -> dedup ->
materialize, all as a single lazy Ray Data pipeline (streaming execution;
the only shuffles are the canonicalization aggregates and the final triple
dedup). The relation configuration below is the hardware-datasheet-style
(part, stg_temp_max, value) extraction used by the reference's e2e tests
(``tests/e2e/test_e2e.py``), re-expressed in this engine's declarative spec.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data

from fonduer_ray.core.matchers import RegexMatchSpan
from fonduer_ray.core.ngrams import MentionNgrams
from fonduer_ray.stages.candidate_stage import RelationSpec, extract_candidates
from fonduer_ray.stages.label_stage import CandidateView
from fonduer_ray.stages.linking import dedup_triples, link_triples
from fonduer_ray.stages.materialize import write_triples
from fonduer_ray.stages.mention_stage import MentionSpec, extract_mentions
from fonduer_ray.stages.parse_stage import parse_webpages
from fonduer_ray.stages.triple_stage import extract_triples
from fonduer_ray.sources.webpages import read_webpages

PRED = "stg_temp_max"


# -- mention config ---------------------------------------------------------

def part_matcher() -> RegexMatchSpan:
    return RegexMatchSpan(rgx=r"[A-Z]{2}\d{3,4}", ignore_case=False)


def temp_matcher() -> RegexMatchSpan:
    return RegexMatchSpan(rgx=r"\d{2,3}")


def mention_specs() -> list[MentionSpec]:
    return [
        MentionSpec("part", MentionNgrams(1, 1), part_matcher()),
        MentionSpec("temp", MentionNgrams(1, 1), temp_matcher()),
    ]


# -- candidate config -------------------------------------------------------

def same_row_or_sentence(spans) -> bool:
    """Throttler: part and temp must share a table row or a sentence
    (analog of the reference hardware throttler,
    ``tests/shared/hardware_throttlers.py:14-19``)."""
    a, b = spans
    sa, sb = a.sentence, b.sentence
    if (
        sa.get("table_position") is not None
        and sa.get("table_position") == sb.get("table_position")
        and sa.get("row_start") is not None
        and sb.get("row_start") is not None
        and not (sa["row_end"] < sb["row_start"] or sb["row_end"] < sa["row_start"])
    ):
        return True
    return sa["position"] == sb["position"]


def relation_specs() -> list[RelationSpec]:
    return [RelationSpec("part_temp", ("part", "temp"), throttler=same_row_or_sentence)]


# -- labeling functions -----------------------------------------------------

def lf_same_row(c: CandidateView) -> int | None:
    a, b = c[0], c[1]
    sa, sb = a.sentence, b.sentence
    if (
        sa.get("table_position") is not None
        and sa.get("table_position") == sb.get("table_position")
        and sa.get("row_start") is not None
        and sb.get("row_start") is not None
    ):
        overlap = not (sa["row_end"] < sb["row_start"] or sb["row_end"] < sa["row_start"])
        return 1 if overlap else -1
    return None


def lf_rated_sentence(c: CandidateView) -> int | None:
    b = c[1]
    words = {w.lower() for w in b.sentence["words"]}
    if {"rated", "degrees"} & words:
        return 1
    return None


def lf_temp_range(c: CandidateView) -> int | None:
    try:
        v = int(c[1].get_span())
    except ValueError:
        return -1
    return 1 if 60 <= v <= 200 else -1


def lf_not_min_column(c: CandidateView) -> int | None:
    """Reject temps that sit in a column whose header suggests a minimum."""
    s = c[1].sentence
    if s.get("table_position") is None:
        return None
    if c[1].get_span().lstrip("-").isdigit() and c[1].get_span().startswith("-"):
        return -1
    return None


def default_lfs():
    return [
        ("lf_same_row", lf_same_row),
        ("lf_rated_sentence", lf_rated_sentence),
        ("lf_temp_range", lf_temp_range),
        ("lf_not_min_column", lf_not_min_column),
    ]


@dataclass
class KGConfig:
    threshold: float = 0.6
    n_salts: int = 16
    n_buckets: int = 16
    lf_weights: dict = field(default_factory=dict)

    def config_hash(self) -> str:
        import hashlib
        import json

        return hashlib.md5(
            json.dumps(
                {
                    "threshold": self.threshold,
                    "n_buckets": self.n_buckets,
                    "weights": sorted(self.lf_weights.items()),
                },
                sort_keys=True,
            ).encode()
        ).hexdigest()[:12]


def build_triples(
    pages: "ray.data.Dataset", cfg: KGConfig | None = None, fused: bool = True
) -> "ray.data.Dataset":
    """web pages -> deduped canonical triples.

    ``fused=True`` (default) runs the doc-local steps (parse -> mention ->
    candidate -> LF score) in ONE actor pool — no per-stage nested-row
    serialization and no pool-per-stage CPU reservation. ``fused=False``
    keeps the modular stages (useful when intermediate doc rows are needed,
    e.g. for featurization)."""
    cfg = cfg or KGConfig()
    if fused:
        from fonduer_ray.stages.fused import pages_to_triples

        triples = pages_to_triples(
            pages,
            mention_specs(),
            relation_specs(),
            default_lfs(),
            pred_names={"part_temp": PRED},
            weights=cfg.lf_weights,
            threshold=cfg.threshold,
        )
    else:
        docs = parse_webpages(pages)
        docs = extract_mentions(docs, mention_specs())
        docs = extract_candidates(docs, relation_specs())
        triples = extract_triples(
            docs,
            default_lfs(),
            pred_names={"part_temp": PRED},
            weights=cfg.lf_weights,
            threshold=cfg.threshold,
        )
    from fonduer_ray.stages.linking import canonicalize_triples

    return canonicalize_triples(triples, n_salts=cfg.n_salts)


def run_kg(
    input_path: str, out_dir: str, cfg: KGConfig | None = None
) -> dict:
    """End-to-end: read -> ... -> resumable partitioned Parquet KB."""
    import ray

    from fonduer_ray.stages.materialize import completed_buckets

    cfg = cfg or KGConfig()
    # checkpoint fast path BEFORE building: canonicalize_triples pins the
    # extraction output eagerly, so the manifest check must happen first
    # for a completed output to skip the entire pipeline
    done = completed_buckets(out_dir, cfg.config_hash())
    if len(done) >= cfg.n_buckets:
        return {
            "out_dir": out_dir,
            "written_buckets": [],
            "skipped_buckets": sorted(done),
            "rows_written": 0,
        }
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    # 4 blocks per CPU, ~1024-doc batches: measured on the 480k-doc corpus
    # at 16 pinned CPUs — 26.1k docs/s at (8 blocks/cpu, batch 256) vs
    # 36.2k at (4 blocks/cpu, batch 1024), i.e. 95% of the bare-mp
    # streaming-distinct hardware control (scripts/scaling_ceiling.py).
    # Finer batches pay per-call slicing/rebuild overhead inside the fused
    # stage; more blocks pay task dispatch + a longer straggler tail.
    pages = read_webpages(input_path, override_num_blocks=cpus * 4)
    deduped = build_triples(pages, cfg)
    return write_triples(
        deduped, out_dir, cfg.config_hash(), n_buckets=cfg.n_buckets
    )


def entity_prf(
    predicted: set[tuple], gold: set[tuple]
) -> dict:
    """Entity-level set confusion (reference ``learning/utils.py:77-93``)."""
    tp = len(predicted & gold)
    fp = len(predicted - gold)
    fn = len(gold - predicted)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": prec, "recall": rec, "f1": f1}
