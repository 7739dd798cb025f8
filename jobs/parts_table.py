#!/usr/bin/env python
"""Job: operate a parts table (the MergeTree lifecycle) from the CLI.

    python jobs/parts_table.py create  --table /lake/t --engine replacing \\
        --key o_custkey --version-col o_orderkey [--partition-col month]
    python jobs/parts_table.py create  --table /lake/t --engine collapsing \\
        --key uid --sign-col sign --version-col ver
    python jobs/parts_table.py create  --table /lake/t --engine aggregating \\
        --key uid --agg-spec n=sum total=sum hi=max
    python jobs/parts_table.py create  --table /lake/t \\
        [--ttl-col born --ttl-seconds 94608000] \\
        [--projection by_status:status:n=sum,spend=sum]
    python jobs/parts_table.py insert  --table /lake/t --src batch.parquet \\
        [--batch-id 7] [--app-id nightly]
    python jobs/parts_table.py read    --table /lake/t [--version 3] [--final] \\
        [--as-of 946684800] [--out out.parquet] [--limit 20]
    python jobs/parts_table.py read    --table /lake/t --projection by_status \\
        [--group-cols status]
    python jobs/parts_table.py optimize --table /lake/t [--max-seq 5] \\
        [--as-of 946684800] [--partitions A,B]
    python jobs/parts_table.py vacuum  --table /lake/t [--keep-versions 1] \\
        [--orphan-ttl-secs 86400]
    python jobs/parts_table.py mutate  --table /lake/t \\
        [--delete-where "custkey % 10 = 0"] [--set "total=total*2"] \\
        [--update-where "status = 'F'"]
    python jobs/parts_table.py stats   --table /lake/t
    python jobs/parts_table.py maintain --table /lake/t [--max-parts 8] \\
        [--keep-versions 2] [--as-of 946684800]
    python jobs/parts_table.py history --table /lake/t
    python jobs/parts_table.py diff    --table /lake/t --from 1 --to 3

Prints one JSON stats line per operation (the contract every jobs/ CLI
follows). ``read`` without ``--out`` prints row count + a bounded sample.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark import (
        get_spark,
    )
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
        create_parts_table,
        insert_into_parts,
        optimize_parts,
        parts_table_diff,
        read_parts,
        read_projection,
        table_history,
        vacuum_parts,
    )

    def _agg_spec(pairs: list[str]) -> dict[str, str]:
        return dict(p.split("=", 1) for p in pairs)

    def _projections(specs: list[str]) -> dict | None:
        out = {}
        for s in specs:
            name, keys, aggs = s.split(":", 2)
            out[name] = {
                "key_cols": keys.split(","),
                "agg_spec": _agg_spec(aggs.split(",")),
            }
        return out or None

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "op",
        choices=(
            "create", "insert", "read", "optimize",
            "vacuum", "history", "diff", "mutate", "stats", "maintain",
        ),
    )
    ap.add_argument("--table", required=True)
    ap.add_argument("--engine", default="append")
    ap.add_argument("--key", nargs="*", default=[])
    ap.add_argument("--version-col", default=None)
    ap.add_argument("--sum-cols", nargs="*", default=[])
    ap.add_argument("--sign-col", default=None)
    ap.add_argument("--agg-spec", nargs="*", default=[], help="col=sum|min|max")
    ap.add_argument("--ttl-col", default=None)
    ap.add_argument("--ttl-seconds", type=float, default=None)
    ap.add_argument(
        "--projection",
        action="append",
        default=[],
        help="name:key1,key2:col1=sum,col2=max (repeatable)",
    )
    ap.add_argument("--as-of", type=float, default=None, help="TTL as-of epoch secs")
    ap.add_argument("--group-cols", nargs="*", default=None)
    ap.add_argument("--partition-col", default=None)
    ap.add_argument("--order-by", nargs="*", default=[])
    ap.add_argument("--src", default=None, help="parquet path for insert")
    ap.add_argument("--batch-id", type=int, default=None)
    ap.add_argument("--app-id", default=None)
    ap.add_argument("--version", type=int, default=None)
    ap.add_argument("--final", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--max-seq", type=int, default=None)
    ap.add_argument(
        "--partitions",
        default=None,
        help="comma-separated partition values: OPTIMIZE PARTITION "
        "(ClickHouse's merge unit) instead of the full-table merge",
    )
    ap.add_argument("--max-parts", type=int, default=8)
    ap.add_argument("--keep-versions", type=int, default=1)
    ap.add_argument("--orphan-ttl-secs", type=float, default=24 * 3600.0)
    ap.add_argument("--from", dest="v_from", type=int, default=None)
    ap.add_argument("--to", dest="v_to", type=int, default=None)
    ap.add_argument("--delete-where", default=None)
    ap.add_argument("--set", nargs="*", default=[], help="col=expr (UPDATE)")
    ap.add_argument("--update-where", default=None)
    args = ap.parse_args()

    if args.op == "create":
        meta = create_parts_table(
            args.table,
            engine=args.engine,
            key_cols=tuple(args.key),
            version_col=args.version_col,
            sum_cols=tuple(args.sum_cols),
            sign_col=args.sign_col,
            agg_spec=_agg_spec(args.agg_spec) or None,
            ttl_col=args.ttl_col,
            ttl_seconds=args.ttl_seconds,
            partition_col=args.partition_col,
            order_by=tuple(args.order_by),
            projections=_projections(args.projection),
        )
        print(json.dumps({"op": "create", "table": args.table, "meta": meta}))
        return
    if args.op == "stats":
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
            parts_stats,
        )

        print(json.dumps({"op": "stats", "parts": parts_stats(args.table)}))
        return
    if args.op == "history":
        print(json.dumps({"op": "history", "versions": table_history(args.table)}))
        return
    if args.op == "vacuum":
        res = vacuum_parts(
            args.table,
            keep_versions=args.keep_versions,
            orphan_ttl_secs=args.orphan_ttl_secs,
        )
        print(json.dumps({"op": "vacuum", **res}))
        return

    spark = get_spark(app_name="kickhouse-parts-table")
    if args.op == "insert":
        if not args.src:
            ap.error("insert needs --src")
        res = insert_into_parts(
            spark.read.parquet(args.src),
            args.table,
            batch_id=args.batch_id,
            app_id=args.app_id,
        )
        print(json.dumps({"op": "insert", **res}))
    elif args.op == "read":
        if args.projection:
            df = read_projection(
                spark,
                args.table,
                args.projection[0],
                version=args.version,
                group_cols=tuple(args.group_cols) if args.group_cols else None,
            )
        else:
            df = read_parts(
                spark,
                args.table,
                version=args.version,
                final=args.final,
                as_of=args.as_of,
            )
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(json.dumps({"op": "read", "rows": df.count(), "out": args.out}))
        else:
            rows = [r.asDict() for r in df.limit(args.limit).collect()]
            print(
                json.dumps(
                    {"op": "read", "rows": df.count(), "sample": rows}, default=str
                )
            )
    elif args.op == "optimize":
        if args.partitions:
            from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
                optimize_partitions,
            )

            res = optimize_partitions(
                spark, args.table, args.partitions.split(","), as_of=args.as_of
            )
        else:
            res = optimize_parts(
                spark, args.table, max_seq=args.max_seq, as_of=args.as_of
            )
        print(json.dumps({"op": "optimize", **res}))
    elif args.op == "maintain":
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
            maintain_parts,
        )

        res = maintain_parts(
            spark,
            args.table,
            max_parts=args.max_parts,
            keep_versions=args.keep_versions,
            as_of=args.as_of,
            orphan_ttl_secs=args.orphan_ttl_secs,
        )
        print(json.dumps({"op": "maintain", **res}))
    elif args.op == "mutate":
        from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.sources.parts import (
            mutate_parts,
        )

        res = mutate_parts(
            spark,
            args.table,
            delete_where=args.delete_where,
            set_exprs=dict(s.split("=", 1) for s in args.set) or None,
            update_where=args.update_where,
        )
        print(json.dumps({"op": "mutate", **res}))
    elif args.op == "diff":
        if args.v_from is None or args.v_to is None:
            ap.error("diff needs --from and --to")
        from pyspark.sql import functions as F

        d = parts_table_diff(spark, args.table, args.v_from, args.v_to)
        counts = {
            r["status"]: r["n"]
            for r in d.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        print(json.dumps({"op": "diff", "from": args.v_from, "to": args.v_to, "counts": counts}))


if __name__ == "__main__":
    main()
