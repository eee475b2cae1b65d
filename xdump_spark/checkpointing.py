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
* The input fingerprint hashes the source's file listing + each file's
  (size, mtime) + schema (``df.inputFiles()`` + one Hadoop
  ``listStatus`` per parent dir) — an input file overwritten IN PLACE
  under the same name (a re-dropped WET/CSV landing dir) invalidates,
  not just an added/renamed file. In-memory inputs (tests, notebooks)
  have no file lineage and fall back to a CONTENT fingerprint (one
  count+hash-sum pass — see ``frame_fingerprint``).
* The manifest is written atomically (tmp + rename, through the Hadoop
  FileSystem API so ``hdfs://``/object-store checkpoint dirs work)
  AFTER each parquet write succeeds, so a crash mid-write leaves the
  previous manifest intact and the next run simply recomputes that
  stage.
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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xdump_spark import fsutil

MANIFEST = "manifest.json"


def _canon(obj) -> str:
    """Deterministic JSON for fingerprinting parameter dicts."""
    return json.dumps(obj, sort_keys=True, default=repr, separators=(",", ":"))


def content_fingerprint(df: DataFrame) -> str:
    """Order-independent CONTENT hash of a (small) frame: row count +
    decimal sum of per-row ``xxhash64`` over all columns. Runs ONE Spark
    job over the frame — meant for parameter frames (benchmark sets,
    DSIR targets: thousands of rows), not the corpus. Stable across
    sessions and partitionings: xxhash64 is seed-fixed, decimal addition
    is associative/commutative, and decimal(38,0) cannot overflow below
    ~10^19 rows. Unlike a logical-plan hash, identical DATA fingerprints
    identically even when rebuilt in a new session (plan strings embed
    per-session expression IDs) and different data never matches just
    because the plan shape does (``createDataFrame`` plans don't print
    their rows)."""
    cols = [
        F.to_json(F.struct(f.name)).alias(f.name)
        if f.dataType.typeName() in ("map",)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    basis = f"content|{df.schema.json()}|{row['n']}|{row['s'] or 0}"
    return "content:" + hashlib.sha256(basis.encode()).hexdigest()[:16]


def _canonical_plan(df: DataFrame) -> str:
    """Session-stable text of the analyzed plan: canonicalization
    rewrites per-session expression IDs to positional ``none#N`` ids, so
    the same derivation rebuilt in a new driver prints identically
    (verified in tests; a raw plan string embeds ``col#123`` ids that
    differ every session)."""
    return df._jdf.queryExecution().analyzed().canonicalized().toString()


def input_fingerprint(df: DataFrame) -> str:
    """Hash of the source file listing + per-file (size, mtime) +
    schema + the canonicalized derivation plan; falls back to
    :func:`content_fingerprint` when the frame has no file lineage (see
    module docstring). The plan term matters: ``docs.filter(A)`` and
    ``docs.filter(B)`` read the same files with the same schema — without
    it they would share a fingerprint and resume each other's
    checkpoints."""
    files = sorted(df.inputFiles())
    schema = df.schema.json()
    if not files:
        return content_fingerprint(df)
    h = hashlib.sha256(schema.encode())
    h.update(_canonical_plan(df).encode())
    for path, length, mtime in fsutil.file_statuses(df.sparkSession, files):
        h.update(f"{path}|{length}|{mtime}".encode())
    return h.hexdigest()[:16]


def frame_fingerprint(df: DataFrame | None) -> str:
    """Fingerprint for a DataFrame-valued PARAMETER (benchmark set, DSIR
    target): file lineage when available (cheap — no data scan), else
    the content fingerprint (one pass over the param frame). Either way
    the fingerprint is stable across driver restarts — the resume-after-
    crash scenario that a logical-plan hash breaks (expression IDs are
    per-session)."""
    if df is None:
        return "none"
    files = sorted(df.inputFiles())
    if files:
        return input_fingerprint(df)
    return content_fingerprint(df)


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
        fsutil.mkdirs(spark, directory)
        self._manifest = self._read_manifest()

    # -- manifest ---------------------------------------------------------
    def _manifest_path(self) -> str:
        return fsutil.join(self.dir, MANIFEST)

    def _read_manifest(self) -> dict:
        if not fsutil.exists_atomic(self.spark, self._manifest_path()):
            return {"stages": {}}
        try:
            return json.loads(
                fsutil.read_text_atomic(self.spark, self._manifest_path())
            )
        except (json.JSONDecodeError, OSError):
            return {"stages": {}}

    def _write_manifest(self) -> None:
        fsutil.write_text_atomic(
            self.spark,
            self._manifest_path(),
            json.dumps(self._manifest, indent=1, sort_keys=True),
        )

    # -- stages -----------------------------------------------------------
    def wants(self, stage: str) -> bool:
        return self.stages is None or stage in self.stages

    @property
    def chain(self) -> str:
        """The current chain fingerprint — the identity of the pipeline
        up to and including the last advanced stage."""
        return self._chain

    # -- side-effect marks ------------------------------------------------
    def is_marked(self, name: str, fp: str) -> bool:
        """True iff the side effect ``name`` was already performed for
        chain fingerprint ``fp`` (see :meth:`mark`)."""
        return self._manifest.get("marks", {}).get(name) == fp

    def mark(self, name: str, fp: str) -> None:
        """Record that a NON-IDEMPOTENT side effect (e.g. an
        ExactHashStore append) ran for chain fingerprint ``fp``, so a
        resumed run skips it instead of doubling it. Mark AFTER the
        effect: a crash between effect and mark re-runs the effect on
        resume, so only effects whose duplicate application is harmless
        (store appends are — duplicate hashes cannot change an anti-join)
        should use this."""
        self._manifest.setdefault("marks", {})[name] = fp
        self._write_manifest()

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
        path = fsutil.join(self.dir, stage)
        entry = self._manifest["stages"].get(stage)
        if (
            self.resume
            and entry is not None
            and entry.get("fp") == fp
            and fsutil.is_dir(self.spark, path)
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
