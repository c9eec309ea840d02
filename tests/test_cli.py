"""CLI entry point: the REST surface as a shell command."""

from __future__ import annotations

import json

from time_series_db_spark.__main__ import main


def test_cli_m3ql_matrix(spark, sf_dir, capsys):
    rc = main(["fetch name:error | sum region | head 2", "--sf-dir", sf_dir])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["data"]["resultType"] == "matrix"
    assert out["data"]["result"]


def test_cli_promql_instant(spark, sf_dir, capsys):
    rc = main([
        "--lang", "promql", "--instant", "sum by (region) (error)",
        "--time", "1704074400000", "--step", "3600000",
        "--lookback", "7200000", "--sf-dir", sf_dir,
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["data"]["resultType"] == "vector"
    assert all(r["value"][0] == 1704074400000 for r in out["data"]["result"])


def test_cli_stats_and_errors(spark, sf_dir, capsys):
    rc = main(["--stats", "head,labels", "--sf-dir", sf_dir])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "headStats" in out and "labelStats" in out and "valueStats" not in out

    rc = main(["fetch name:error | bogusop 3", "--sf-dir", sf_dir])
    assert rc == 2
    assert "error:" in capsys.readouterr().err
