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


def test_cli_ingest_backfill_alert_loop(spark, tmp_path, capsys):
    """The full ops loop from the shell: drain docs → backfill a rule →
    evaluate an alert over the recorded series."""
    import json

    from time_series_db_spark.__main__ import main

    src = tmp_path / "docs"
    src.mkdir()
    T0 = 1_704_067_200_000
    M5 = 300_000
    docs = [
        {"labels": "name error region east", "timestamp": T0 + 10_000, "value": 20.0},
        {"labels": "name error region east", "timestamp": T0 + M5 + 10_000, "value": 30.0},
    ]
    (src / "d.json").write_text("\n".join(json.dumps(d) for d in docs))
    store = str(tmp_path / "metrics")
    rc = main(["--ingest", str(src), "--store", store])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["rows"] == 2

    rule = {
        "record": "region:error:sum", "match": {"name": ["error"]},
        "group_by": ["region"], "agg": "sum", "resolution_ms": M5,
    }
    out_dir = str(tmp_path / "recorded")
    rc = main(["--backfill-rule", json.dumps(rule), "--store", store,
               "--out", out_dir])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["rows"] == 2

    alert = {"alert": "High", "rule": rule, "op": ">", "threshold": 10.0,
             "for_windows": 2}
    rc = main(["--evaluate-alert", json.dumps(alert), "--store", out_dir])
    assert rc == 0
    alerts = json.loads(capsys.readouterr().out)["alerts"]
    states = {a["ts"]: a["labels"]["alertstate"] for a in alerts}
    assert states == {T0: "pending", T0 + M5: "firing"}


def test_cli_parse_exposition_to_query(spark, tmp_path, capsys):
    """Scrape-dump ingestion from the shell: parse Prometheus text
    exposition files into a metrics store, then query it with M3QL —
    the exposition source wired end-to-end."""
    import json

    from time_series_db_spark.__main__ import main

    T0 = 1_704_067_200_000
    src = tmp_path / "scrape"
    src.mkdir()
    (src / "dump.txt").write_text(
        "# HELP error Errors.\n"
        "# TYPE error counter\n"
        f'error{{region="east"}} 20.5 {T0 + 10_000}\n'
        f'error{{region="west"}} 7.5 {T0 + 10_000}\n'
        "error{region=\"east\"} 1 \n"   # malformed (trailing space) → dropped
        f'error{{region="nots"}} 3\n'   # no timestamp → dropped for the store
    )
    store = str(tmp_path / "metrics")
    rc = main(["--parse-exposition", str(src), "--store", store])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["rows"] == 2

    rows = spark.read.parquet(store).collect()
    got = {dict(r["labels"])["region"]: r["value"] for r in rows}
    assert got == {"east": 20.5, "west": 7.5}
    assert all(r["ts"] == T0 + 10_000 for r in rows)


def test_cli_parse_line_protocol_and_graphite(spark, tmp_path, capsys):
    """The other two wire formats load from the shell with the same
    contract as --parse-exposition."""
    import json

    from time_series_db_spark.__main__ import main

    T0 = 1_704_067_200_000
    lp = tmp_path / "lp"
    lp.mkdir()
    (lp / "t.lp").write_text(
        f"cpu,host=a usage=20.5 {T0 * 1_000_000}\n"
        "garbage\n"
    )
    store1 = str(tmp_path / "m1")
    assert main(["--parse-line-protocol", str(lp), "--store", store1]) == 0
    assert json.loads(capsys.readouterr().out)["rows"] == 1
    r = spark.read.parquet(store1).collect()[0]
    assert dict(r["labels"]) == {"name": "cpu_usage", "host": "a"}
    assert (r["ts"], r["value"]) == (T0, 20.5)

    gr = tmp_path / "carbon"
    gr.mkdir()
    (gr / "c.txt").write_text(f"sys.cpu;host=b 7.5 {T0 // 1000}\n# c\n")
    store2 = str(tmp_path / "m2")
    assert main(["--parse-graphite", str(gr), "--store", store2]) == 0
    assert json.loads(capsys.readouterr().out)["rows"] == 1
    r = spark.read.parquet(store2).collect()[0]
    assert dict(r["labels"]) == {"name": "sys.cpu", "host": "b"}
    assert (r["ts"], r["value"]) == (T0, 7.5)


def test_cli_format_and_parse_query(capsys):
    import json as _json

    from time_series_db_spark.__main__ import main

    assert main(["--lang", "promql", "--format-query",
                 "sum by(region)(rate(error[5m]))"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["data"] == "sum by (region)(rate(error[5m]))"

    assert main(["--lang", "promql", "--parse-query", "rate(error[5m])"]) == 0
    ast = _json.loads(capsys.readouterr().out)
    assert ast["data"]["type"] == "FunctionCall"

    assert main(["--lang", "promql", "--format-query", "rate("]) == 1
