"""In-process integration tests for the CLI subcommands added in round 2
(blocks / curate) — main() is invoked directly so the session fixture is
reused; stdout JSON is the product contract."""

from __future__ import annotations

import json
import os

from document_ai_spark.__main__ import main


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, json.loads(out[-1])


def test_cli_blocks(spark, corpus_dir, tmp_path, capsys):
    out = str(tmp_path / "blocks")
    rc, res = _run(capsys, [
        "blocks", "--input", os.path.join(corpus_dir, "pages.parquet"),
        "--output", out,
    ])
    assert rc == 0
    assert res["blocks"] > 0
    assert set(res["accepted"]) <= {"True", "False"}
    assert spark.read.parquet(out).count() == res["blocks"]


def test_cli_curate(spark, corpus_dir, tmp_path, capsys):
    from document_ai_spark.operators.extraction import extract_pages

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    src = str(tmp_path / "ex")
    extract_pages(pages, salted=False).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "kept")
    rc, res = _run(capsys, [
        "curate", "--extracted", src, "--output", out,
        "--rules", "dedup,quality",
    ])
    assert rc == 0
    assert res["rules"] == ["dedup", "quality"]
    assert 0 < res["written"] <= res["total_docs"]
    assert res["written"] == res["after_quality"]
    assert spark.read.parquet(out).count() == res["written"]


def test_cli_hosts(spark, corpus_dir, tmp_path, capsys):
    from document_ai_spark.operators.extraction import extract_pages

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    src = str(tmp_path / "ex")
    extract_pages(pages, salted=False).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "hosts")
    rc, res = _run(capsys, [
        "hosts", "--extracted", src, "--output", out, "--top", "5",
    ])
    assert rc == 0
    assert res["domains"] > 0
    assert len(res["top"]) <= 5
    assert sum(r["docs"] for r in res["top"]) <= 200
    hm = spark.read.parquet(out)
    assert hm.agg({"docs": "sum"}).collect()[0][0] == 200
