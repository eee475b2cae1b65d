"""Binary token-shard sink: token-exact round-trips, dtype selection
and overflow, determinism across partitionings, manifest integrity."""

import json

import pytest

from xdump_spark.sources.token_shards import read_binary_shard, write_binary_shards


@pytest.fixture(scope="module")
def seqs(spark):
    rows = [
        (i, [j % 50_000 for j in range(i * 7, i * 7 + 5 + (i % 11))])
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "seq_id long, input_ids array<int>")


def _read_all(out_dir):
    with open(f"{out_dir}/manifest.json") as fh:
        manifest = json.load(fh)
    got = {}
    for s in manifest["shards"]:
        for sid, arr in read_binary_shard(out_dir, s["shard"], manifest):
            got[sid] = list(map(int, arr))
    return manifest, got


def test_roundtrip_token_exact(spark, seqs, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_binary_shards(seqs, out, n_shards=4)
    assert manifest["dtype"] == "uint16"        # max id 49_999 fits
    assert manifest["n_seqs"] == 200
    m2, got = _read_all(out)
    want = {r.seq_id: list(r.input_ids) for r in seqs.collect()}
    assert got == want
    assert m2["n_tokens"] == sum(len(v) for v in want.values())


def test_dtype_auto_and_overflow(spark, tmp_path):
    wide = spark.createDataFrame(
        [(1, [0, 70_000])], "seq_id long, input_ids array<int>"
    )
    m = write_binary_shards(wide, str(tmp_path / "w"), n_shards=1)
    assert m["dtype"] == "uint32"
    _, got = _read_all(str(tmp_path / "w"))
    assert got == {1: [0, 70_000]}

    with pytest.raises(ValueError, match="does not fit"):
        write_binary_shards(wide, str(tmp_path / "x"), dtype="uint16")
    neg = spark.createDataFrame(
        [(1, [0, -3])], "seq_id long, input_ids array<int>"
    )
    with pytest.raises(ValueError, match="negative"):
        write_binary_shards(neg, str(tmp_path / "n"))


def test_deterministic_across_input_partitionings(spark, seqs, tmp_path):
    """Shard membership and bytes are a function of seq_id only — the
    cluster-layout-independence the sink promises."""
    import hashlib
    import os

    def digest(out):
        h = hashlib.sha256()
        for name in sorted(os.listdir(out)):
            h.update(name.encode())
            with open(os.path.join(out, name), "rb") as fh:
                h.update(fh.read())
        return h.hexdigest()

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_binary_shards(seqs.repartition(3), a, n_shards=4)
    write_binary_shards(seqs.repartition(13), b, n_shards=4)
    assert digest(a) == digest(b)


def test_training_shards_to_binary_e2e(spark, tmp_path):
    """Full chain on real docs: build_vocab → training_shards → binary
    sink; token totals agree end to end."""
    from xdump_spark.operators.curation import build_vocab, training_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = build_vocab(docs, max_size=4096)
    seqs = training_shards(docs, vocab, budget=512)
    out = str(tmp_path / "bin")
    manifest = write_binary_shards(seqs, out)
    from pyspark.sql import functions as F

    want_tokens = seqs.select(F.sum("n_tokens")).collect()[0][0]
    assert manifest["n_tokens"] == want_tokens
    _, got = _read_all(out)
    assert len(got) == seqs.count()


def test_cli_binary_shards(spark, tmp_path, capsys):
    from xdump_spark import cli

    out = str(tmp_path / "corpus")
    shards = str(tmp_path / "bin")
    args = cli.build_parser().parse_args(
        [
            "curate", "-i", "/root/testdata/sf0.001/documents.parquet",
            "-o", out, "--span-k", "0", "--min-tokens", "1",
            "--pack-budget", "256", "--tokenize",
            "--shards-out", shards, "--shards-format", "binary",
        ]
    )
    assert cli.run(args, spark) == 0
    assert "binary shard" in capsys.readouterr().out
    m, got = _read_all(shards)
    assert m["n_seqs"] > 0 and len(got) == m["n_seqs"]

    bad = cli.build_parser().parse_args(
        ["curate", "-i", "x", "-o", "y", "--pack-budget", "256",
         "--shards-out", shards, "--shards-format", "binary"]
    )
    # no --tokenize: refuse before any Spark work would discover it
    with pytest.raises(SystemExit):
        bad_args = bad
        # reuse the same run path with a real input to hit the guard
        bad_args.input = "/root/testdata/sf0.001/documents.parquet"
        bad_args.output = str(tmp_path / "y")
        cli.run(bad_args, spark)
