"""Pipeline packaging round-trip (pipelines/package.py) — the MLflow-bundle
analog: save -> load -> run equals the direct run, integrity is enforced,
and the archive is byte-deterministic."""

import hashlib

import pyarrow as pa
import pytest

import ray.data

from fonduer_ray.pipelines import package as P
from fonduer_ray.pipelines import spec as S

REGISTRY_SRC = """
from fonduer_ray.pipelines.spec import register_lf, register_throttler

register_throttler("pkg_same_sentence")(
    lambda spans: spans[0].sentence["position"] == spans[1].sentence["position"]
)
register_lf("pkg_lf_always")(lambda view: 1)
"""

PKG_SPEC = {
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
        {
            "name": "part_temp",
            "args": ["part", "temp"],
            "throttler": "pkg_same_sentence",
        }
    ],
    "lfs": ["pkg_lf_always"],
    "pred_names": {"part_temp": "rated_at"},
    "threshold": 0.5,
}


def _pages():
    html = (
        "<html><body><p>Device AB123 is rated 85 degrees."
        " Other text here.</p></body></html>"
    ).encode()
    return ray.data.from_arrow(
        pa.table({"url": ["u0"], "html": [html], "lang": ["en"]})
    )


def test_package_roundtrip_and_run(ray_session, tmp_path):
    weights = pa.table({"key": ["a", "b"], "w": [0.5, -1.25]})
    path = str(tmp_path / "pipe.tar.gz")
    digest = P.package_pipeline(
        path,
        PKG_SPEC,
        registry_source=REGISTRY_SRC,
        artifacts={"weights": weights},
        metadata={"corpus": "unit"},
    )
    assert digest == hashlib.sha256(open(path, "rb").read()).hexdigest()

    # fresh registries: loading must re-register the bundled callables
    S.THROTTLERS.pop("pkg_same_sentence", None)
    S.LFS.pop("pkg_lf_always", None)
    pkg = P.load_package(path)
    assert "pkg_same_sentence" in S.THROTTLERS and "pkg_lf_always" in S.LFS
    assert pkg.spec == PKG_SPEC
    assert pkg.artifacts["weights"].equals(weights)
    assert pkg.metadata == {"corpus": "unit"}

    out = pkg.run(_pages()).take_all()
    assert {(r["subj"], r["pred"], r["obj"]) for r in out} == {
        ("AB123", "rated_at", "85")
    }


def test_package_predict_pandas(ray_session, tmp_path):
    import pandas as pd

    path = str(tmp_path / "pipe.tar.gz")
    P.package_pipeline(path, PKG_SPEC, registry_source=REGISTRY_SRC)
    pkg = P.load_package(path)
    html = (
        "<html><body><p>Device XY900 is rated 42 degrees.</p></body></html>"
    ).encode()
    df = pkg.predict(pd.DataFrame({"url": ["u1"], "html": [html], "lang": ["en"]}))
    assert set(zip(df["subj"], df["pred"], df["obj"])) == {
        ("XY900", "rated_at", "42")
    }


def test_package_deterministic_bytes(tmp_path):
    a, b = str(tmp_path / "a.tar.gz"), str(tmp_path / "b.tar.gz")
    d1 = P.package_pipeline(a, PKG_SPEC, registry_source=REGISTRY_SRC)
    d2 = P.package_pipeline(b, PKG_SPEC, registry_source=REGISTRY_SRC)
    assert d1 == d2
    assert open(a, "rb").read() == open(b, "rb").read()


def test_package_integrity_enforced(tmp_path):
    path = str(tmp_path / "pipe.tar.gz")
    P.package_pipeline(path, PKG_SPEC)
    blob = bytearray(open(path, "rb").read())
    # corrupt one byte inside the gzip payload (past the 10-byte header)
    blob[len(blob) // 2] ^= 0xFF
    bad = str(tmp_path / "bad.tar.gz")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(Exception):  # zlib/tar error or integrity ValueError
        P.load_package(bad)


def test_package_rejects_wrong_format(tmp_path):
    import gzip
    import io
    import json
    import tarfile

    path = str(tmp_path / "weird.tar.gz")
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        with tarfile.open(fileobj=gz, mode="w") as tar:
            data = json.dumps({"format": "other/9", "members": {}}).encode()
            info = tarfile.TarInfo("MANIFEST.json")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    open(path, "wb").write(buf.getvalue())
    with pytest.raises(ValueError, match="unsupported package format"):
        P.load_package(path)
