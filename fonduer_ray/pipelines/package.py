"""Single-artifact pipeline packaging — the engine's analog of the
reference's MLflow model bundle (``packaging/fonduer_model.py:48-173``:
``save_model`` writes a directory with the pickled preprocessor, matchers,
labeler state and code paths; ``_load_pyfunc`` restores it and ``predict``
maps a DataFrame of documents to extracted relations).

Here the bundle is ONE deterministic ``.tar.gz``:

- ``MANIFEST.json`` — format version + sha256 of every member (integrity
  is checked on load),
- ``spec.yaml`` — the declarative pipeline spec (``pipelines/spec.py``);
  user callables are referenced by registry name,
- ``registry.py`` (optional) — source module that registers those
  callables on load (the ``code_paths`` analog; executed by
  ``load_package``, exactly like MLflow executes bundled code),
- ``artifacts/<name>.parquet`` (optional) — trained state as Arrow tables
  (scorer weights, feature vocab, label-model parameters, ...).

The archive is byte-deterministic (sorted members, zeroed timestamps and
ownership), so re-packaging an unchanged pipeline produces an identical
file — artifact stores can dedupe on content hash.
"""

from __future__ import annotations

import hashlib
import io
import json
import tarfile
from typing import Any

import pyarrow as pa

FORMAT = "fonduer-ray-package/1"


def _tar_add(tar: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(data)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(data))


def _table_bytes(table: pa.Table) -> bytes:
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    # no compression + no stats keeps the member byte-deterministic across
    # pyarrow point releases more reliably than default snappy blocks
    pq.write_table(table, buf, compression="none", write_statistics=False)
    return buf.getvalue()


def package_pipeline(
    path: str,
    spec: dict,
    registry_source: str | None = None,
    artifacts: dict[str, pa.Table] | None = None,
    metadata: dict | None = None,
) -> str:
    """Write the pipeline bundle to ``path`` (a ``.tar.gz``); returns the
    archive's sha256 hex digest (the content address).

    ``registry_source``: Python source that re-registers the spec's named
    throttlers / LFs / custom matchers via the ``pipelines.spec``
    decorators; bundled verbatim and executed on load.
    ``artifacts``: named Arrow tables of trained state.
    ``metadata``: free-form JSON-able dict (git sha, corpus id, metrics).
    """
    import yaml

    members: dict[str, bytes] = {
        "spec.yaml": yaml.safe_dump(spec, sort_keys=True).encode()
    }
    if registry_source is not None:
        members["registry.py"] = registry_source.encode()
    for name, table in (artifacts or {}).items():
        if "/" in name or name.startswith("."):
            raise ValueError(f"bad artifact name {name!r}")
        members[f"artifacts/{name}.parquet"] = _table_bytes(table)
    manifest = {
        "format": FORMAT,
        "metadata": metadata or {},
        "members": {
            name: hashlib.sha256(data).hexdigest()
            for name, data in members.items()
        },
    }
    manifest_bytes = json.dumps(manifest, sort_keys=True, indent=1).encode()

    gz_buf = io.BytesIO()
    # mtime=0 fixes the gzip header timestamp -> deterministic bytes
    import gzip

    with gzip.GzipFile(fileobj=gz_buf, mode="wb", mtime=0) as gz:
        with tarfile.open(fileobj=gz, mode="w") as tar:
            _tar_add(tar, "MANIFEST.json", manifest_bytes)
            for name in sorted(members):
                _tar_add(tar, name, members[name])
    blob = gz_buf.getvalue()
    with open(path, "wb") as f:
        f.write(blob)
    return hashlib.sha256(blob).hexdigest()


class Package:
    """A loaded pipeline bundle: ``spec`` + ``artifacts`` + run surface."""

    def __init__(
        self, spec: dict, artifacts: dict[str, pa.Table], metadata: dict
    ) -> None:
        self.spec = spec
        self.artifacts = artifacts
        self.metadata = metadata

    def run(self, pages) -> Any:
        """pages Dataset -> canonical triples Dataset (``spec.run_spec``)."""
        from fonduer_ray.pipelines.spec import run_spec

        return run_spec(pages, self.spec)

    def predict(self, df) -> "Any":
        """pandas (url, html[, lang]) -> pandas triples — the MLflow
        ``pyfunc.predict`` surface (``fonduer_model.py:141-173``). Ray must
        already be initialised by the caller."""
        import ray.data

        pages = ray.data.from_pandas(df)
        return self.run(pages).to_pandas()


def load_package(path: str) -> Package:
    """Read + integrity-check a bundle; executes ``registry.py`` if bundled
    (the code_paths analog — the bundle is code, load only trusted ones)."""
    import yaml

    with tarfile.open(path, mode="r:gz") as tar:
        raw = {
            m.name: tar.extractfile(m).read()
            for m in tar.getmembers()
            if m.isfile()
        }
    if "MANIFEST.json" not in raw:
        raise ValueError("not a fonduer-ray package: MANIFEST.json missing")
    manifest = json.loads(raw.pop("MANIFEST.json"))
    if manifest.get("format") != FORMAT:
        raise ValueError(f"unsupported package format {manifest.get('format')!r}")
    declared = manifest["members"]
    if set(declared) != set(raw):
        raise ValueError(
            f"member set mismatch: manifest {sorted(declared)} != archive {sorted(raw)}"
        )
    for name, digest in declared.items():
        actual = hashlib.sha256(raw[name]).hexdigest()
        if actual != digest:
            raise ValueError(f"integrity check failed for {name!r}")
    if "registry.py" in raw:
        exec(compile(raw["registry.py"], "<package registry.py>", "exec"), {})
    spec = yaml.safe_load(raw["spec.yaml"])
    artifacts = {}
    for name, data in raw.items():
        if name.startswith("artifacts/") and name.endswith(".parquet"):
            import pyarrow.parquet as pq

            artifacts[name[len("artifacts/") : -len(".parquet")]] = pq.read_table(
                io.BytesIO(data)
            )
    return Package(spec, artifacts, manifest.get("metadata", {}))
