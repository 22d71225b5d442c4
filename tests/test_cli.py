"""The lrcli-analog CLI (letarette_spark/cli.py): every subcommand driven
end-to-end over a real temp index, same command surface as
/root/reference/cmd/lrcli/main.go:38-67."""

from __future__ import annotations

import json
import os

import pytest

from letarette_spark.cli import main


@pytest.fixture(scope="module")
def cli_index(spark, tmp_path_factory):
    """An index built THROUGH the CLI load command from a JSON docs file."""
    base = tmp_path_factory.mktemp("cli")
    docs_json = base / "docs.json"
    with open(docs_json, "w") as f:
        for i in range(40):
            f.write(json.dumps({
                "id": f"d{i}",
                "title": f"title {i}",
                "text": f"the quick brown fox number {i} jumps over value "
                        + ("lazy dog " * (1 + i % 3)),
            }) + "\n")
    root = str(base / "idx")
    rc = main(["load", "-d", root, "docs", str(docs_json)])
    assert rc == 0
    return root, str(docs_json)


class TestCLI:
    def test_load_builds_then_upserts(self, cli_index, capsys):
        root, docs_json = cli_index
        # second load over an existing index takes the upsert path
        rc = main(["load", "-d", root, "docs", docs_json, "-m", "5"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "upserted" in out

    def test_search_prints_hits_and_trailer(self, cli_index, capsys):
        root, _ = cli_index
        rc = main(["search", "-d", root, "-l", "5", "docs", "fox"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert any(line.startswith("docs\td") for line in out)
        assert out[-1].startswith("-- index_hit:")

    def test_search_missing_phrase_errors(self, cli_index):
        root, _ = cli_index
        with pytest.raises(SystemExit):
            main(["search", "-d", root, "docs"])

    def test_index_stats(self, cli_index, capsys):
        root, _ = cli_index
        assert main(["index", "stats", "-d", root]) == 0
        out = capsys.readouterr().out
        assert "documents: 40" in out  # the -m 5 upsert replaced existing ids
        assert "terms:" in out and "top terms:" in out

    def test_index_check_ok_and_stemmer_warning(self, cli_index, capsys):
        root, _ = cli_index
        assert main(["index", "check", "-d", root]) == 0
        assert "index OK" in capsys.readouterr().out
        # mismatched expected analyzer prints the reference's warning
        assert main(["index", "check", "-d", root,
                     "--mode", "letarette", "--languages", "swedish"]) == 0
        assert "mismatch" in capsys.readouterr().out

    def test_index_optimize(self, cli_index, capsys):
        root, _ = cli_index
        assert main(["index", "optimize", "-d", root]) == 0
        did = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert did["stopwords"] is True

    def test_spelling_update(self, cli_index, capsys):
        root, _ = cli_index
        assert main(["spelling", "update", "2", "-d", root]) == 0
        assert "spelling table updated" in capsys.readouterr().out

    def test_synonyms_roundtrip(self, cli_index, tmp_path, capsys):
        root, _ = cli_index
        syn = tmp_path / "syn.json"
        syn.write_text(json.dumps([
            {"description": "canines", "words": ["dog", "hound"]},
        ]))
        assert main(["synonyms", "-d", root, str(syn)]) == 0
        capsys.readouterr()
        assert main(["synonyms", "-d", root]) == 0
        dumped = [json.loads(l) for l in
                  capsys.readouterr().out.strip().splitlines()]
        assert dumped == [["canines", ["dog", "hound"]]]

    def test_sql_over_index_views(self, cli_index, capsys):
        root, _ = cli_index
        assert main(["sql", "-d", root,
                     "SELECT count(*) AS n FROM docs WHERE alive"]) == 0
        assert "4" in capsys.readouterr().out

    def test_monitor_snapshot(self, cli_index, capsys):
        root, _ = cli_index
        assert main(["monitor", root]) == 0
        out = capsys.readouterr().out
        assert root in out

    def test_env(self, capsys):
        assert main(["env"]) == 0
        assert "pyspark:" in capsys.readouterr().out

    def test_forcestemmer_restamps_manifest(self, spark, tmp_path, capsys):
        # build a tiny throwaway index (don't mutate the shared fixture)
        docs_json = tmp_path / "d.json"
        with open(docs_json, "w") as f:
            for i in range(5):
                f.write(json.dumps({"id": f"x{i}", "title": "t",
                                    "text": f"alpha beta gamma {i}"}) + "\n")
        root = str(tmp_path / "idx2")
        assert main(["load", "-d", root, "docs", str(docs_json)]) == 0
        from letarette_spark.analysis.tokenizer import AnalyzerConfig
        from letarette_spark.index.builder import Index

        with pytest.raises(ValueError):
            Index.open(spark, root, AnalyzerConfig(mode="porter"))
        assert main(["index", "forcestemmer", "-d", root,
                     "--mode", "porter"]) == 0
        Index.open(spark, root, AnalyzerConfig(mode="porter"))  # now accepted

    def test_index_rebuild_swaps_atomically(self, spark, tmp_path, capsys):
        docs_json = tmp_path / "d.json"
        with open(docs_json, "w") as f:
            for i in range(6):
                f.write(json.dumps({"id": f"r{i}", "title": "t",
                                    "text": f"delta epsilon {i}"}) + "\n")
        root = str(tmp_path / "idx3")
        assert main(["load", "-d", root, "docs", str(docs_json)]) == 0
        assert main(["index", "rebuild", "-d", root]) == 0
        assert "rebuilt" in capsys.readouterr().out
        assert not os.path.exists(root + ".rebuild")
        assert not os.path.exists(root + ".pre-rebuild")
        from letarette_spark.index.builder import Index
        from letarette_spark.query.executor import Searcher

        res = Searcher(Index.open(spark, root)).search("epsilon", limit=3)
        assert res.hits


class TestSnapshotCLI:
    def test_snapshots_expire_and_time_travel_search(
        self, spark, tmp_path_factory, capsys
    ):
        from pyspark.sql import functions as F

        from letarette_spark.analysis.tokenizer import AnalyzerConfig
        from letarette_spark.index.builder import build_index
        from letarette_spark.index.incremental import upsert_documents

        root = str(tmp_path_factory.mktemp("cli_tt") / "idx")
        docs = spark.createDataFrame([
            {"doc_id": f"d{i}", "space": "docs", "title": f"t{i}",
             "body": f"value number {i} quick fox", "alive": True}
            for i in range(8)
        ])
        build_index(spark, docs, root, config=AnalyzerConfig(mode="porter"),
                    n_build_partitions=2, chunk_size=2, snapshot_retention=3)
        up = spark.createDataFrame([
            {"doc_id": "d0", "space": "docs", "title": "t0",
             "body": "", "alive": False},
        ])
        upsert_documents(spark, root, up, batch_id=9)

        assert main(["index", "snapshots", "-d", root]) == 0
        out = capsys.readouterr().out
        assert out.splitlines()[0].startswith("snapshot\t")
        assert len(out.strip().splitlines()) == 3  # header + 2 snapshots

        # time-travel search at snapshot 1 still sees d0
        assert main(["search", "-d", root, "--snapshot", "1",
                     "-l", "10", "docs", "value"]) == 0
        old = capsys.readouterr().out
        assert "\td0\t" in old
        # current search does not
        assert main(["search", "-d", root, "-l", "10", "docs", "value"]) == 0
        cur = capsys.readouterr().out
        assert "\td0\t" not in cur

        assert main(["index", "expire", "-d", root, "--keep", "1"]) == 0
        out = capsys.readouterr().out
        assert out.startswith("retained: [2]")
        with pytest.raises(FileNotFoundError):
            main(["search", "-d", root, "--snapshot", "1", "docs", "value"])


def test_pipeline_command(spark, tmp_path_factory, capsys):
    """`pipeline` runs prepare_training_data end-to-end: audit parquet
    written, summary printed, drop reasons surfaced."""
    base = tmp_path_factory.mktemp("cli_pipe")
    src = str(base / "docs.parquet")
    body = "spark shuffle join window value table scan " * 12
    rows = [{"doc_id": i, "text": body + f" unique{i}"} for i in range(30)]
    rows.append({"doc_id": 97, "text": rows[0]["text"]})   # exact dup
    rows.append({"doc_id": 98, "text": "short"})            # quality drop
    spark.createDataFrame(rows).write.parquet(src)
    out = str(base / "audit.parquet")
    rc = main(["pipeline", src, "-o", out, "--threshold", "0.9"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "documents: 32" in printed
    assert "exact_dup" in printed and "quality" in printed
    audit = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert audit[97]["kept"] is False and audit[97]["reason"] == "exact_dup"
    assert audit[98]["kept"] is False and audit[98]["reason"] == "quality"
    assert audit[0]["kept"] is True


def test_pipeline_command_writes_shards(spark, tmp_path_factory, capsys):
    """`pipeline --shards-out` ends the run with the deterministic
    shard-shuffle write of the KEPT documents (one file per shard)."""
    import glob

    base = tmp_path_factory.mktemp("cli_pipe_sh")
    src = str(base / "docs.parquet")
    body = "spark shuffle join window value table scan " * 12
    rows = [{"doc_id": i, "text": body + f" unique{i}"} for i in range(30)]
    rows.append({"doc_id": 97, "text": rows[0]["text"]})   # exact dup
    spark.createDataFrame(rows).write.parquet(src)
    shards = str(base / "shards")
    rc = main([
        "pipeline", src, "--threshold", "0.9",
        "--shards-out", shards, "--n-shards", "4",
    ])
    assert rc == 0
    assert "4 deterministic shards" in capsys.readouterr().out
    dirs = glob.glob(shards + "/shard=*")
    assert len(dirs) == 4
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(shards).collect()
    )
    assert got == sorted(range(30))  # kept set only (97 deduped away)
