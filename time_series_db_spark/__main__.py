"""Command-line query runner: the REST surface as a shell command.

    python -m time_series_db_spark 'fetch name:error | sum region' \
        --sf-dir /root/testdata/sf0.001 --start <ms> --end <ms> --step 3600000
    python -m time_series_db_spark --lang promql 'sum by (region) (error)' ...
    python -m time_series_db_spark --lang promql --instant 'error' --time <ms>
    python -m time_series_db_spark --stats head,labels --sf-dir ...
    python -m time_series_db_spark --ingest docs_dir --store metrics_dir
    python -m time_series_db_spark --backfill-rule rule.json \
        --store metrics_dir --out recorded_dir
    python -m time_series_db_spark --evaluate-alert alert.json --store recorded_dir
    python -m time_series_db_spark --parse-exposition scrape_dir --store metrics_dir

Prints the same JSON the service facade returns (matrix / vector /
stats), one document on stdout — pipeable to jq. Exits non-zero with
the parse/validation error message on stderr for malformed queries.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m time_series_db_spark",
        description="Run an M3QL or PromQL query against a testdata sf dir",
    )
    p.add_argument("query", nargs="?", help="query text (required unless --stats)")
    p.add_argument("--lang", choices=["m3ql", "promql"], default="m3ql")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--start", type=int, default=None, help="epoch ms")
    p.add_argument("--end", type=int, default=None, help="epoch ms")
    p.add_argument("--step", type=int, default=3_600_000, help="ms")
    p.add_argument("--instant", action="store_true",
                   help="PromQL instant query (vector result)")
    p.add_argument("--time", type=int, default=None,
                   help="instant evaluation time, epoch ms")
    p.add_argument("--lookback", type=int, default=None,
                   help="instant lookback window, ms")
    p.add_argument("--explain", action="store_true",
                   help="print the physical plan instead of results")
    p.add_argument("--profile", action="store_true",
                   help="append per-stage wall time to the response")
    p.add_argument("--stats", default=None,
                   help="comma list of head,labels,values — stats instead of a query")
    p.add_argument("--ingest", default=None, metavar="JSON_DIR",
                   help="drain a JSON doc dir into --store (availableNow)")
    p.add_argument("--backfill-rule", default=None, metavar="RULE_JSON",
                   help="backfill a recording rule (file or inline JSON) from --store to --out")
    p.add_argument("--evaluate-alert", default=None, metavar="ALERT_JSON",
                   help="evaluate an alert spec over the recorded store; prints alert rows")
    p.add_argument("--parse-line-protocol", default=None, metavar="TEXT_DIR",
                   help="load Influx line-protocol files into --store")
    p.add_argument("--parse-graphite", default=None, metavar="TEXT_DIR",
                   help="load Graphite plaintext files into --store")
    p.add_argument("--parse-exposition", default=None, metavar="TEXT_DIR",
                   help="parse Prometheus text-exposition files into --store")
    p.add_argument("--store", default=None, help="metrics/rule table path")
    p.add_argument("--out", default=None, help="output table path")
    p.add_argument("--format-query", action="store_true",
                   help="canonically pretty-print the PromQL query and exit")
    p.add_argument("--parse-query", action="store_true",
                   help="print the PromQL query's JSON AST and exit")
    p.add_argument("--cpus", type=int, default=4)
    args = p.parse_args(argv)

    if args.format_query or args.parse_query:
        # parser-only paths — no Spark session, instant exit
        if args.lang != "promql":
            p.error("--format-query/--parse-query require --lang promql")
        if not args.query:
            p.error("query is required with --format-query/--parse-query")
        from time_series_db_spark import service as _svc

        resp = (
            _svc.prom_format_query if args.format_query
            else _svc.prom_parse_query
        )(args.query)
        print(json.dumps(resp, indent=2))
        return 0 if resp.get("status") == "success" else 1

    rules_mode = (
        args.ingest or args.backfill_rule or args.evaluate_alert
        or args.parse_exposition or args.parse_line_protocol
        or args.parse_graphite
    )
    if args.stats is None and not rules_mode and not args.query:
        p.error("query is required unless --stats or a rules mode is given")
    if rules_mode and not args.store:
        p.error("--store is required with --ingest/--backfill-rule/"
                "--evaluate-alert/--parse-exposition")
    if args.backfill_rule and not args.out:
        p.error("--out is required with --backfill-rule")
    if args.instant and args.lang != "promql":
        p.error("--instant requires --lang promql")

    from time_series_db_spark import service
    from time_series_db_spark.session import get_spark
    from time_series_db_spark.sources import (
        DEFAULT_STEP_MS,
        EVENTS_MAX_TS,
        EVENTS_MIN_TS,
    )
    from time_series_db_spark.sources.m3source import EventsSource

    import os as _os

    _os.environ.setdefault("SPARK_GRAFT_CPUS", str(args.cpus))
    spark = get_spark("tsdb-cli")
    spark.sparkContext.setLogLevel("ERROR")
    src = EventsSource(spark, args.sf_dir)
    start = args.start if args.start is not None else EVENTS_MIN_TS
    end = args.end if args.end is not None else EVENTS_MAX_TS

    def _spec(arg: str) -> dict:
        import os
        if os.path.exists(arg):
            with open(arg) as fh:
                return json.load(fh)
        return json.loads(arg)

    wire_dir = (
        args.parse_exposition or args.parse_line_protocol
        or args.parse_graphite
    )
    try:
        if wire_dir is not None:
            from pyspark.sql import functions as F

            from time_series_db_spark.streaming.ingest import (
                DEFAULT_BLOCK_MS,
                write_blocks,
            )

            if args.parse_exposition is not None:
                from time_series_db_spark.sources.exposition import (
                    parse_exposition as parse_fn,
                )
            elif args.parse_line_protocol is not None:
                from time_series_db_spark.sources.lineprotocol import (
                    parse_line_protocol as parse_fn,
                )
            else:
                from time_series_db_spark.sources.graphite import (
                    parse_graphite as parse_fn,
                )
            lines = spark.read.text(wire_dir).withColumnRenamed(
                "value", "line"
            )
            parsed = parse_fn(lines).where(
                F.col("ts").isNotNull()  # a store row needs a timestamp
            ).withColumn(
                "block",
                F.col("ts") - F.col("ts") % F.lit(DEFAULT_BLOCK_MS),
            )
            write_blocks(parsed, args.store)
            n = spark.read.parquet(args.store).count()
            out = {"status": "success", "store": args.store, "rows": n}
        elif args.ingest is not None:
            from time_series_db_spark.streaming import start_ingest

            q = start_ingest(spark, args.ingest, args.store, available_now=True)
            q.awaitTermination()
            n = spark.read.parquet(args.store).count()
            out = {"status": "success", "store": args.store, "rows": n}
        elif args.backfill_rule is not None:
            from time_series_db_spark.streaming import backfill_recording_rule

            n = backfill_recording_rule(
                spark, args.store, args.out, _spec(args.backfill_rule),
                min_ts=args.start, max_ts=args.end,
            )
            out = {"status": "success", "out": args.out, "rows": n}
        elif args.evaluate_alert is not None:
            from time_series_db_spark.streaming import evaluate_alert_frame
            from time_series_db_spark.streaming.rules import (
                dedup_rule_history,
            )

            # ANY_WINS dedup first: a re-run backfill (mode=append) or a
            # replayed streaming epoch can leave duplicate (series, ts)
            # rows, which would corrupt the island run-length arithmetic
            recorded = dedup_rule_history(spark.read.parquet(args.store))
            rows = evaluate_alert_frame(recorded, _spec(args.evaluate_alert))
            out = {
                "status": "success",
                "alerts": [
                    {"labels": dict(r["labels"]), "ts": r["ts"], "value": r["value"]}
                    for r in rows.collect()
                ],
            }
        elif args.stats is not None:
            names = {
                "head": "headStats", "labels": "labelStats",
                "values": "valueStats",
            }
            include = tuple(
                names[part.strip()] for part in args.stats.split(",") if part.strip()
            )
            sf = src.fetch({}, {}, start, end, args.step)
            out = service.tsdb_stats(sf, include=include)
        elif args.instant:
            kw = {}
            if args.lookback is not None:
                kw["lookback_ms"] = args.lookback
            out = service.promql_query(
                src, args.query, time_ms=args.time, step=args.step, **kw
            )
        else:
            fn = (
                service.m3ql_query_range
                if args.lang == "m3ql"
                else service.promql_query_range
            )
            out = fn(
                src, args.query, start=start, end=end,
                step=args.step or DEFAULT_STEP_MS,
                explain=args.explain, profile=args.profile,
                include_metadata=False,
            )
    except Exception as e:  # parse/validation errors → message, not traceback
        print(f"error: {e}", file=sys.stderr)
        return 2
    if isinstance(out, str):  # --explain returns the plan text
        print(out)
    else:
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
