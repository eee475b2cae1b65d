"""Binary token-shard sink: the flat ``.bin``/``.idx`` layout training
loaders actually mmap.

``training_shards`` (operators/curation.py) ends at (seq_id, input_ids)
parquet — queryable, but a training job wants a raw little-endian token
stream it can memory-map and index in O(1) (the Megatron-style
``indexed dataset`` family). This sink writes, per output shard:

- ``shard-NNNNN.bin`` — every sequence's token ids concatenated, fixed
  little-endian dtype (uint16 when the vocab fits, uint32 otherwise);
- ``shard-NNNNN.idx`` — int64 END-offset (in tokens) of each sequence:
  sequence i of the shard is ``bin[idx[i-1]:idx[i]]`` (idx[-1] = 0
  implicit), so random access is two array lookups;
- one ``manifest.json`` — dtype, shard list with sequence/token counts,
  total tokens — the file a loader reads first.

Scale shape: each shard is written BY ITS EXECUTOR TASK (mapInPandas
over one partition; works on any task-visible filesystem — local, NFS,
fuse-mounted object store), so the driver never sees token data; it
collects only the per-shard count rows for the manifest. Shard
membership and in-shard order are deterministic (hash repartition on
seq_id + in-partition sort), so two runs over the same frame produce
byte-identical shards regardless of cluster layout.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DTYPES = {"uint16": 2 ** 16, "uint32": 2 ** 32}
_NP_LE = {"uint16": "<u2", "uint32": "<u4"}  # numpy endian-explicit spellings


def write_binary_shards(
    seqs: DataFrame,
    out_dir: str,
    n_shards: int | None = None,
    dtype: str = "auto",
    seq_col: str = "seq_id",
    ids_col: str = "input_ids",
) -> dict:
    """Write (seq_id, input_ids) as binary token shards; returns the
    manifest dict (also written to ``out_dir/manifest.json``).

    ``dtype="auto"`` picks uint16 when every token id fits (one cheap
    max aggregation), else uint32; an explicit dtype that cannot hold
    the corpus's max id raises instead of silently wrapping."""
    import numpy as np  # noqa: F401  (validated importable up front)

    max_id = seqs.select(
        F.max(F.array_max(F.col(ids_col))).alias("m"),
        F.min(F.array_min(F.col(ids_col))).alias("lo"),
    ).collect()[0]
    max_tok = int(max_id["m"]) if max_id["m"] is not None else 0
    min_tok = int(max_id["lo"]) if max_id["lo"] is not None else 0
    if min_tok < 0:
        raise ValueError(f"negative token id {min_tok} cannot be binarized")
    if dtype == "auto":
        dtype = "uint16" if max_tok < _DTYPES["uint16"] else "uint32"
    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be uint16/uint32/auto, got {dtype!r}")
    if max_tok >= _DTYPES[dtype]:
        raise ValueError(
            f"max token id {max_tok} does not fit {dtype} — pass a wider dtype"
        )

    if n_shards is None:
        n_shards = max(1, seqs.rdd.getNumPartitions())
    os.makedirs(out_dir, exist_ok=True)

    arranged = seqs.select(seq_col, ids_col).repartition(
        n_shards, seq_col
    ).sortWithinPartitions(seq_col)

    def dump(batches):
        import numpy as np
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks, ends, seq_ids, total = [], [], [], 0
        for pdf in batches:
            for sid, ids in zip(pdf[seq_col], pdf[ids_col]):
                arr = np.asarray(ids, dtype=np.int64)
                chunks.append(arr.astype(dtype))
                total += len(arr)
                ends.append(total)
                seq_ids.append(int(sid))
        if not chunks:
            return
        base = os.path.join(out_dir, f"shard-{pid:05d}")
        with open(base + ".bin", "wb") as fh:
            fh.write(
                np.concatenate(chunks).astype(_NP_LE[dtype], copy=False).tobytes()
            )
        with open(base + ".idx", "wb") as fh:
            fh.write(np.asarray(ends, dtype="<i8").tobytes())
            fh.write(np.asarray(seq_ids, dtype="<i8").tobytes())
        yield pd.DataFrame(
            [{"shard": f"shard-{pid:05d}", "n_seqs": len(ends), "n_tokens": total}]
        )

    stats = arranged.mapInPandas(
        dump, schema="shard string, n_seqs long, n_tokens long"
    ).collect()
    shards = sorted(
        ({"shard": r["shard"], "n_seqs": int(r["n_seqs"]),
          "n_tokens": int(r["n_tokens"])} for r in stats),
        key=lambda s: s["shard"],
    )
    manifest = {
        "format": "xdump-spark-token-shards-v1",
        "dtype": dtype,
        "n_shards": len(shards),
        "n_seqs": sum(s["n_seqs"] for s in shards),
        "n_tokens": sum(s["n_tokens"] for s in shards),
        "shards": shards,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def read_binary_shard(out_dir: str, shard: str, manifest: dict | None = None):
    """Loader-side helper (and test oracle): one shard → list of
    (seq_id, np.ndarray of token ids), mmap-friendly layout."""
    import numpy as np

    if manifest is None:
        with open(os.path.join(out_dir, "manifest.json")) as fh:
            manifest = json.load(fh)
    dt = _NP_LE[manifest["dtype"]]
    bin_arr = np.fromfile(os.path.join(out_dir, shard + ".bin"), dtype=dt)
    side = np.fromfile(os.path.join(out_dir, shard + ".idx"), dtype="<i8")
    n = len(side) // 2
    ends, seq_ids = side[:n], side[n:]
    out, start = [], 0
    for sid, end in zip(seq_ids, ends):
        out.append((int(sid), bin_arr[start:end]))
        start = int(end)
    return out
