"""Gold-label annotation operator (reference supervision/labeler.py gold
path + hardware_utils.entity_level_f1 semantics)."""
import pyarrow as pa
import pytest

import ray.data

from fonduer_ray.stages.gold import attach_gold_labels, entity_confusion


def _pred():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
                "subj": pa.array(["spark", "hash", "sort", "merge", "hash"]),
                "obj": pa.array(["join", "batch", "window", "join", "stream"]),
            }
        )
    )


def _gold():
    # overlaps pred on (1,spark,join) and (2,sort,window); adds a gold-only
    # entity in doc 1 and a doc (4) with gold but no predictions
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 1, 2, 4], pa.int64()),
                "subj": pa.array(["spark", "merge", "sort", "hash"]),
                "obj": pa.array(["join", "stream", "window", "batch"]),
            }
        )
    )


def test_attach_gold_broadcast_vs_join_paths(ray_session):
    """The broadcast frozenset and the left-outer hash join must mark the
    same rows (lowered limit forces the join path)."""
    cols = ["doc_id", "subj", "obj"]
    a = attach_gold_labels(_pred(), _gold(), cols).take_all()
    b = attach_gold_labels(
        _pred(), _gold(), cols, broadcast_limit=0
    ).take_all()
    key = lambda r: (r["doc_id"], r["subj"], r["obj"])
    assert {key(r): r["gold"] for r in a} == {key(r): r["gold"] for r in b}
    assert {key(r): r["gold"] for r in a} == {
        (1, "spark", "join"): 1,
        (1, "hash", "batch"): 0,
        (2, "sort", "window"): 1,
        (2, "merge", "join"): 0,
        (3, "hash", "stream"): 0,
    }


def test_attach_gold_normalizes_case(ray_session):
    """Reference gold functions compare UPPERCASED tuples
    (hardware_utils.py:60-69); mixed-case sides must still match."""
    pred = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "subj": pa.array(["SPARK"]),
                "obj": pa.array(["Join"]),
            }
        )
    )
    gold = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "subj": pa.array(["spark"]),
                "obj": pa.array(["JOIN"]),
            }
        )
    )
    out = attach_gold_labels(pred, gold, ["doc_id", "subj", "obj"]).take_all()
    assert out[0]["gold"] == 1
    out2 = attach_gold_labels(
        pred, gold, ["doc_id", "subj", "obj"], normalize=False
    ).take_all()
    assert out2[0]["gold"] == 0


def test_entity_confusion_counts(ray_session):
    """Per-doc (n_pred, n_gold, n_tp) matches the reference's set algebra:
    tp = |pred ∩ gold|, and docs with only gold entities still appear."""
    labeled = attach_gold_labels(_pred(), _gold(), ["doc_id", "subj", "obj"])
    rows = {
        r["doc_id"]: (r["n_pred"], r["n_gold"], r["n_tp"])
        for r in entity_confusion(labeled, _gold()).take_all()
    }
    assert rows == {
        1: (2, 2, 1),
        2: (2, 1, 1),
        3: (1, 0, 0),
        4: (0, 1, 0),
    }
    # global P/R derive from the sums exactly as entity_level_f1 does
    n_pred = sum(v[0] for v in rows.values())
    n_gold = sum(v[1] for v in rows.values())
    n_tp = sum(v[2] for v in rows.values())
    assert (n_pred, n_gold, n_tp) == (5, 4, 2)


def test_gold_label_eval_bruteforce(ray_session, tmp_path):
    """Driver query vs a pure-python recomputation on a tiny documents
    table (the SQL oracle's semantics, reimplemented independently)."""
    import hashlib

    import pyarrow.parquet as pq

    from fonduer_ray.pipelines.docops import (
        GOLD_WINDOW,
        OBJ_DICT,
        PARA_TOKENS,
        SUBJ_DICT,
        WINDOW,
        gold_label_eval,
    )

    texts = [
        "spark x window y hash batch z w q r sort a b c join",
        "merge stream spark join window batch hash sort q p",
        "alpha beta gamma delta",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["t"] * 3, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    def md5_64(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")

    def pairs(toks, window):
        out = set()
        for i, a in enumerate(toks):
            if a not in SUBJ_DICT:
                continue
            for j, b in enumerate(toks):
                if b not in OBJ_DICT:
                    continue
                if i // PARA_TOKENS == j // PARA_TOKENS and abs(i - j) <= window:
                    out.add((a, b))
        return out

    want = {}
    for doc_id, text in zip([10, 11, 12], texts):
        toks = text.split()
        pred = pairs(toks, WINDOW)
        gold = {
            (a, b)
            for a, b in pairs(toks, GOLD_WINDOW)
            if md5_64(f"{doc_id}:{a}:{b}") % 2 == 0
        }
        if pred or gold:
            want[doc_id] = (len(pred), len(gold), len(pred & gold))

    got = {
        r["doc_id"]: (r["n_pred"], r["n_gold"], r["n_tp"])
        for r in gold_label_eval(str(tmp_path)).take_all()
    }
    assert got == want
