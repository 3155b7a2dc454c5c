"""Declarative pipeline-spec tests (fonduer_ray.pipelines.spec)."""

import pyarrow as pa
import pytest

import ray.data

from fonduer_ray.pipelines import spec as S


# NOTE: registered callables are defined as lambdas/closures so Ray
# cloudpickles them BY VALUE — a test-module function pickles by reference
# and worker processes cannot import the test module.
_same_sentence = S.register_throttler("test_same_sentence")(
    lambda spans: spans[0].sentence["position"] == spans[1].sentence["position"]
)
_lf_always = S.register_lf("test_lf_always")(lambda view: 1)


SPEC = {
    "mentions": [
        {
            "name": "part",
            "space": {"type": "ngrams", "n_min": 1, "n_max": 1},
            "matcher": {"type": "regex", "rgx": r"[A-Z]{2}\d{3}"},
        },
        {
            "name": "temp",
            "space": {"type": "ngrams", "n_min": 1, "n_max": 1},
            "matcher": {"type": "regex", "rgx": r"\d{2,3}"},
        },
    ],
    "relations": [
        {"name": "part_temp", "args": ["part", "temp"], "throttler": "test_same_sentence"}
    ],
    "lfs": ["test_lf_always"],
    "pred_names": {"part_temp": "rated_at"},
    "threshold": 0.5,
}


def test_build_pipeline():
    mentions, relations, lfs, cfg = S.build_pipeline(SPEC)
    assert [m.name for m in mentions] == ["part", "temp"]
    assert relations[0].arg_types == ("part", "temp")
    assert relations[0].throttler is _same_sentence
    assert lfs == [("test_lf_always", _lf_always)]
    assert cfg["threshold"] == 0.5


def test_matcher_combinators():
    m = S._build_matcher(
        {
            "type": "union",
            "children": [
                {"type": "regex", "rgx": r"\d+"},
                {"type": "dictionary", "d": ["alpha"]},
            ],
        }
    )
    from fonduer_ray.core.matchers import Union

    assert isinstance(m, Union)


def test_run_spec_end_to_end(ray_session):
    html = (
        "<html><body><p>Device AB123 is rated 85 degrees."
        " Other text here.</p></body></html>"
    ).encode()
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": ["u0"],
                "html": [html],
                "lang": ["en"],
            }
        )
    )
    out = S.run_spec(pages, SPEC).take_all()
    assert {(r["subj"], r["pred"], r["obj"]) for r in out} == {
        ("AB123", "rated_at", "85")
    }


def test_run_spec_parser_section(ray_session):
    """The spec's ``parser`` section reaches the parse step: linguist
    selection plus ParserConfig keys (here the punct sentencizer keeps the
    terminal '.' attached, unlike the simple-delim default)."""
    html = (
        "<html><body><p>Device AB123 is rated 85 degrees."
        " Other text here.</p></body></html>"
    ).encode()
    pages = ray.data.from_arrow(
        pa.table({"url": ["u0"], "html": [html], "lang": ["en"]})
    )
    spec = dict(SPEC, parser={"linguist": "heuristic", "sentencizer": "punct"})
    out = S.run_spec(pages, spec).take_all()
    assert {(r["subj"], r["pred"], r["obj"]) for r in out} == {
        ("AB123", "rated_at", "85")
    }
    with pytest.raises(ValueError):
        S.build_parser_config({"no_such_key": 1})


def test_spec_yaml_roundtrip(tmp_path):
    import yaml

    p = tmp_path / "pipeline.yaml"
    p.write_text(yaml.safe_dump(SPEC))
    assert S.load_spec(str(p)) == SPEC


def test_unregistered_names_raise():
    bad = dict(SPEC, lfs=["nope"])
    with pytest.raises(ValueError):
        S.build_pipeline(bad)
