"""Training-shard export: pack → shuffle → shard → published files.

Pinned contract: one file per shard (no temps left behind), each
file's lines are that shard's sequences in pos order, the union of
all files is exactly the packed payload (no sequence lost or
duplicated), the manifest matches the files on disk (count + sha256),
and a re-export with the same salt is byte-identical while a bumped
epoch salt deals a different order over the same sequences."""

from __future__ import annotations

import hashlib
import os

import pytest


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def exported(spark, sf_dir, tmp_path_factory):
    from eugl_spark.sources.shards import export_training_shards

    out = str(tmp_path_factory.mktemp("shards"))
    manifest = {
        r["shard"]: r
        for r in export_training_shards(_docs(spark, sf_dir), out).collect()
    }
    return out, manifest


def test_files_match_manifest_and_no_temps(exported):
    out, manifest = exported
    files = sorted(os.listdir(out))
    assert files == [f"shard-{s:05d}.txt" for s in sorted(manifest)]
    assert not [f for f in files if f.startswith("_tmp.")]
    for s, row in manifest.items():
        blob = open(os.path.join(out, f"shard-{s:05d}.txt"), "rb").read()
        assert hashlib.sha256(blob).hexdigest() == row["sha256"]
        assert blob.decode("utf-8").count("\n") == row["n_seqs"]


def test_union_of_files_is_the_payload_in_shard_order(
    spark, sf_dir, exported
):
    from eugl_spark.plans.queries import REGISTRY

    out, _ = exported
    payload = {
        r["seq_id"]: r["seq_text"]
        for r in REGISTRY["corpus_pack_payload"].spark(spark, sf_dir).collect()
    }
    sharded = REGISTRY["corpus_shard_sequences"].spark(spark, sf_dir).collect()
    lines: dict[int, list[str]] = {}
    for f in sorted(os.listdir(out)):
        s = int(f.split("-")[1].split(".")[0])
        lines[s] = (
            open(os.path.join(out, f), encoding="utf-8")
            .read()
            .splitlines()
        )
    assert sum(map(len, lines.values())) == len(payload)
    for r in sharded:
        assert lines[r["shard"]][r["pos"] - 1] == payload[r["seq_id"]]


def test_reexport_identical_and_salt_reshuffles(
    spark, sf_dir, exported, tmp_path
):
    from eugl_spark.sources.shards import export_training_shards

    _, manifest = exported
    again_dir = str(tmp_path / "again")
    again = {
        r["shard"]: r["sha256"]
        for r in export_training_shards(
            _docs(spark, sf_dir), again_dir
        ).collect()
    }
    assert again == {s: r["sha256"] for s, r in manifest.items()}

    epoch2_dir = str(tmp_path / "epoch2")
    epoch2 = {
        r["shard"]: r["sha256"]
        for r in export_training_shards(
            _docs(spark, sf_dir), epoch2_dir, salt="shuf2:"
        ).collect()
    }
    assert epoch2 != {s: r["sha256"] for s, r in manifest.items()}
    # same sequences either way — only the deal changes
    all_lines = lambda d: sorted(  # noqa: E731
        ln
        for f in os.listdir(d)
        for ln in open(os.path.join(d, f), encoding="utf-8")
        .read()
        .splitlines()
    )
    assert all_lines(epoch2_dir) == all_lines(again_dir)
