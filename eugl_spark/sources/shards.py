"""Training-shard export: the corpus leaves as the files a training
loader actually reads.

`export_training_shards` composes the training tail end-to-end:
pack_payload_from (fixed-length token sequences, two-phase prefix-sum
offsets) → shard_sequences (salted-hash epoch shuffle, key-modulo
shard) → `write_training_shards` (one text file per shard, sequences
in shuffled pos order, atomic publish).

Write path semantics (the repo's established shard-writer contract,
see sources/wet.py::write_wet_shards): every shard's rows land in one
partition (repartition on the shard column), arrive sorted by (shard,
pos), and stream into `_tmp.`-prefixed files that rename into place —
underscore temps are invisible to partition discovery, so a killed
run never publishes a half shard. Memory is O(arrow batch), not
O(shard): the writer appends batch-by-batch and only closes/renames
on shard change. The returned manifest (shard, n_seqs, sha256) is the
resume/verify surface: re-exporting the same corpus with the same
salt yields byte-identical files and identical digests.

Reference parity anchor: the reference's chunked writer + finalize
marker pattern (K3/K7 in SURVEY.md §2); the epoch salt plays the role
its reprocess trigger plays.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(seqs: DataFrame, out_dir: str) -> DataFrame:
    """(shard, pos, seq_text) → one ``shard-NNNNN.txt`` per shard in
    ``out_dir`` (one sequence per line, pos order) + a (shard,
    n_seqs, sha256) manifest DataFrame. ``out_dir`` must be reachable
    from every executor (local dir here; fuse/NFS on a cluster —
    object stores would use multipart-commit instead of rename)."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    part = seqs.select("shard", "pos", "seq_text").repartition(
        "shard"
    ).sortWithinPartitions("shard", "pos")

    def gen(batches):
        cur = None  # (shard, fh, hasher, n, tmp_path, final_path)

        def close(emit):
            shard, fh, hasher, n, tmp, final = cur
            fh.close()
            os.replace(tmp, final)
            emit.append((shard, n, hasher.hexdigest()))

        emitted: list[tuple[int, int, str]] = []
        for pdf in batches:
            for shard, text in zip(pdf["shard"], pdf["seq_text"]):
                shard = int(shard)
                if cur is None or cur[0] != shard:
                    if cur is not None:
                        close(emitted)
                    name = f"shard-{shard:05d}.txt"
                    final = os.path.join(out_dir, name)
                    # attempt-unique tmp (ADVICE r6 #2): under
                    # speculative execution / zombie retries two
                    # attempts of one partition write concurrently,
                    # and a SHARED tmp name could publish interleaved
                    # bytes; the rename itself stays atomic
                    from pyspark import TaskContext

                    tc = TaskContext.get()
                    att = tc.taskAttemptId() if tc is not None else os.getpid()
                    tmp = os.path.join(out_dir, f"_tmp.{att}.{name}")
                    cur = [shard, open(tmp, "wb"), hashlib.sha256(), 0,
                           tmp, final]
                line = (text + "\n").encode("utf-8")
                cur[1].write(line)
                cur[2].update(line)
                cur[3] += 1
        if cur is not None:
            close(emitted)
        yield pd.DataFrame(
            {
                "shard": pd.Series([e[0] for e in emitted], dtype="int64"),
                "n_seqs": pd.Series([e[1] for e in emitted], dtype="int64"),
                "sha256": pd.Series([e[2] for e in emitted], dtype="object"),
            }
        )

    return part.mapInPandas(gen, "shard long, n_seqs long, sha256 string")


def export_training_shards(
    docs: DataFrame,
    out_dir: str,
    seq_len: int | None = None,
    n_shards: int | None = None,
    salt: str = "shuf1:",
) -> DataFrame:
    """(doc_id, text, …) → published training shards + manifest: the
    full pack → shuffle → shard → write tail in one call. Defaults
    mirror the registry queries (512-token sequences, the fixture
    shard count); production sizes n_shards so one shard is one
    training file (~100 MB–1 GB)."""
    from eugl_spark.plans.queries import (
        _PACK_SEQ_LEN,
        _PACK_SHARDS,
        pack_payload_from,
        shard_sequences,
    )

    seq_len = _PACK_SEQ_LEN if seq_len is None else seq_len
    n_shards = _PACK_SHARDS if n_shards is None else n_shards
    payload = pack_payload_from(docs, seq_len)
    sharded = shard_sequences(
        payload.select("seq_id", "n_tokens"), n_shards, salt
    )
    return write_training_shards(
        payload.join(sharded.select("seq_id", "shard", "pos"), "seq_id"),
        out_dir,
    )
