"""Stage checkpointing for the corpus pipeline: restart-safe multi-stage
runs over data too big to recompute.

At 100 TB a 15-stage preparation run WILL lose an executor, a spot
instance, or a whole driver before it finishes; without checkpoints the
retry pays every stage again. With ``checkpoint_dir`` set,
``prepare_training_corpus`` materializes each named stage's output as
parquet under the directory and records it in a manifest; a rerun with
the same configuration loads the latest still-valid stage and recomputes
only what follows. Changing a parameter invalidates exactly the stages
at and after the first stage whose inputs it feeds — everything earlier
is reused (the "I only changed the classifier floor" experiment loop).

Correctness model:

* Every stage carries a FINGERPRINT chained from (input fingerprint →
  stage name → that stage's own parameters → previous stage's
  fingerprint). A checkpoint is served only on an exact chain match, so
  a stale checkpoint can never silently feed a changed pipeline.
* The input fingerprint hashes the source's file listing + schema
  (``df.inputFiles()``). In-memory inputs (tests, notebooks) have no
  file lineage and hash as ``opaque:<schema>`` — resume still works but
  the caller owns input stability; production inputs are file-backed.
* The manifest is written atomically (tmp + rename) AFTER each parquet
  write succeeds, so a crash mid-write leaves the previous manifest
  intact and the next run simply recomputes that stage.
* Loading a checkpoint truncates lineage (the downstream plan reads
  parquet, not the 12-stage upstream graph) — the durable analog of
  ``localCheckpoint``, which also keeps driver plans small on long
  pipelines.

Cost model: one parquet write + metadata-count per stage per run.
Stage outputs shrink monotonically through the gates, so the extra IO
is bounded by a small multiple of the input size; pass a subset via
``checkpoint_stages`` to bound it further (e.g. only after the expensive
dedup stages).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "manifest.json"


def _canon(obj) -> str:
    """Deterministic JSON for fingerprinting parameter dicts."""
    return json.dumps(obj, sort_keys=True, default=repr, separators=(",", ":"))


def input_fingerprint(df: DataFrame) -> str:
    """Hash of the source file listing + schema; ``opaque:<schema>`` when
    the frame has no file lineage (see module docstring)."""
    files = sorted(df.inputFiles())
    schema = df.schema.json()
    if not files:
        return "opaque:" + hashlib.sha256(schema.encode()).hexdigest()[:16]
    h = hashlib.sha256(schema.encode())
    for f in files:
        h.update(f.encode())
    return h.hexdigest()[:16]


def frame_fingerprint(df: DataFrame | None) -> str:
    """Fingerprint for a DataFrame-valued PARAMETER (benchmark set, DSIR
    target): file lineage when available, else the logical plan text —
    enough to invalidate on a changed source or a changed derivation."""
    if df is None:
        return "none"
    files = sorted(df.inputFiles())
    if files:
        return input_fingerprint(df)
    plan = df._jdf.queryExecution().logical().toString()
    return "plan:" + hashlib.sha256(plan.encode()).hexdigest()[:16]


class StageCheckpointer:
    """Load-or-materialize named pipeline stages under one directory."""

    def __init__(
        self,
        spark: SparkSession,
        directory: str,
        input_fp: str,
        stages: set[str] | None = None,
        resume: bool = True,
    ):
        self.spark = spark
        self.dir = directory
        self.stages = stages  # None = checkpoint every offered stage
        self.resume = resume
        self.resumed: list[str] = []
        self._chain = input_fp
        os.makedirs(directory, exist_ok=True)
        self._manifest = self._read_manifest()

    # -- manifest ---------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.dir, MANIFEST)

    def _read_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return {"stages": {}}

    def _write_manifest(self) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".manifest.tmp")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(self._manifest, fh, indent=1, sort_keys=True)
            os.replace(tmp, self._manifest_path())
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    # -- stages -----------------------------------------------------------
    def wants(self, stage: str) -> bool:
        return self.stages is None or stage in self.stages

    def advance(self, stage: str, params: dict) -> str:
        """Extend the fingerprint chain through ``stage`` (called for
        every checkpointable stage in pipeline order, whether or not the
        stage is materialized — the chain is the pipeline's identity)."""
        h = hashlib.sha256(
            f"{self._chain}|{stage}|{_canon(params)}".encode()
        ).hexdigest()[:16]
        self._chain = h
        return h

    def stage(
        self, stage: str, params: dict, df, extra=None
    ) -> tuple[DataFrame, int, dict]:
        """Load ``stage`` from a valid checkpoint, or materialize it.

        ``df`` is the stage's output frame, or a zero-arg callable
        building it — pass the callable when CONSTRUCTING the frame runs
        driver jobs (DSIR fit, mixture-rate estimation), so a checkpoint
        hit skips that work entirely. ``extra`` (dict or zero-arg
        callable, evaluated after the build) round-trips stage metadata
        (e.g. applied mixture rates) through the manifest across resumed
        runs.

        Returns (frame, row_count, extra) where ``frame`` always reads
        from the checkpoint parquet (lineage truncated either way).
        """
        fp = self.advance(stage, params)
        path = os.path.join(self.dir, stage)
        entry = self._manifest["stages"].get(stage)
        if (
            self.resume
            and entry is not None
            and entry.get("fp") == fp
            and os.path.isdir(path)
        ):
            self.resumed.append(stage)
            return self.spark.read.parquet(path), entry["n"], entry.get("extra") or {}
        if callable(df):
            df = df()
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        n = out.count()  # parquet metadata count — no data scan
        extra_val = extra() if callable(extra) else (extra or {})
        self._manifest["stages"][stage] = {
            "fp": fp,
            "n": n,
            "extra": extra_val,
        }
        self._write_manifest()
        return out, n, extra_val
