"""`python -m degdb_spark` — the reference binary's surface as a CLI.

The reference ships one binary whose flags boot a node (main.go:15-20:
-port, -peers, -disk, -nodes). A Spark deployment has no gossip ring to
join and no per-node disk quota to carve (the cluster manager owns
placement and storage), so the CLI keeps the node-boot verb and adds
the library's day-one verbs:

    python -m degdb_spark serve  [--port 7946] [--host 127.0.0.1]
                                 [--load-sf-dir DIR] [--signing-key HEX]
        Boot a node: SparkSession + TripleStore + the HTTP/API surface
        (/api/v1/* + /static/ UI). --load-sf-dir seeds the store with
        the testdata-derived triples. Ctrl-C stops it.

    python -m degdb_spark query '<json>' [--load-sf-dir DIR] [--limit N]
        One-shot pattern query (same JSON the HTTP endpoint takes),
        printed as JSON lines.

    python -m degdb_spark bench
        Run the headline benchmark suite (bench.py contract).

-peers / -nodes / -disk have no analogue here by design: peer topology
is SURVEY §2.6 infrastructure the Spark platform supplies.
"""

from __future__ import annotations

import argparse
import json
import sys


def _db(args):
    from degdb_spark.api import DegDB
    from degdb_spark.session import get_spark

    spark = get_spark(app_name="degdb_cli")
    key = bytes.fromhex(args.signing_key) if getattr(args, "signing_key", None) else None
    db = DegDB(spark, signing_key=key)
    if getattr(args, "load_sf_dir", None):
        from degdb_spark.catalog import register_all
        from degdb_spark.sources.triples import triples_df

        register_all(spark, args.load_sf_dir)
        db.insert(triples_df(spark))
    return db


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="degdb_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    serve = sub.add_parser("serve", help="boot a node (HTTP API + UI)")
    serve.add_argument("--port", type=int, default=7946)  # reference default port
    serve.add_argument("--host", default="127.0.0.1")
    serve.add_argument("--load-sf-dir", default=None)
    serve.add_argument("--signing-key", default=None, help="hex key for W1 signing")

    query = sub.add_parser("query", help="one-shot JSON pattern query")
    query.add_argument("q")
    query.add_argument("--load-sf-dir", default=None)
    query.add_argument("--limit", type=int, default=-1)
    query.add_argument("--signing-key", default=None)

    sub.add_parser("bench", help="run the headline benchmark suite")

    prof = sub.add_parser(
        "profile", help="one-pass column profile of a testdata table"
    )
    prof.add_argument("table")
    prof.add_argument("--sf-dir", default=None)
    prof.add_argument("--columns", default=None, help="comma-separated subset")
    prof.add_argument(
        "--approx", action="store_true",
        help="HLL distinct counts (the at-scale mode) instead of exact",
    )

    sql = sub.add_parser(
        "sql", help="run ANSI SQL over the registered testdata tables"
    )
    sql.add_argument("q")
    sql.add_argument("--sf-dir", default=None)
    sql.add_argument("--limit", type=int, default=100)

    search = sub.add_parser(
        "search", help="BM25 ranked retrieval over the documents table"
    )
    search.add_argument("terms", help="space-separated query terms")
    search.add_argument("--sf-dir", default=None)
    search.add_argument("-k", type=int, default=10)

    dedup = sub.add_parser(
        "dedup-report",
        help="near-duplicate rate per source (verified MinHash pipeline)",
    )
    dedup.add_argument("--sf-dir", default=None)

    pipe = sub.add_parser(
        "pipeline",
        help="full curation run: filters -> dedup -> decontaminate -> "
        "token-budget select -> split -> pack",
    )
    pipe.add_argument("--sf-dir", default=None)
    pipe.add_argument("--out", default=None, help="write corpus/packing/report here")
    pipe.add_argument(
        "--rewrite-dedup",
        choices=("span", "substring"),
        default="span",
        help="stage-3b rewrite: aligned 10-token spans (C4) or "
        "variable-length ExactSubstr repeats",
    )
    pipe.add_argument(
        "--packing",
        choices=("concat", "bestfit"),
        default="concat",
        help="final placement: concat-and-chunk (fills windows, "
        "truncates straddlers) or document-preserving best-fit "
        "(harmonic length classes, zero split in-budget docs)",
    )

    mpipe = sub.add_parser(
        "media-pipeline",
        help="media curation run over the synthetic media table: codec "
        "validation -> exact dedup -> fingerprintability gate -> "
        "per-modality perceptual near-dup keep-policy",
    )
    mpipe.add_argument("--n", type=int, default=60, help="synthetic media rows")
    mpipe.add_argument("--out", default=None, help="write curated/report here")

    args = p.parse_args(argv)

    if args.cmd == "media-pipeline":
        from degdb_spark.operators.multimodal import synthetic_media
        from degdb_spark.pipeline import curate_media
        from degdb_spark.session import get_spark

        spark = get_spark(app_name="degdb_media_pipeline")
        for row in curate_media(spark, synthetic_media(spark, args.n), args.out):
            print(json.dumps(row, sort_keys=True))
        return 0

    if args.cmd == "pipeline":
        from degdb_spark.catalog import DEFAULT_SF_DIR
        from degdb_spark.pipeline import curate
        from degdb_spark.session import get_spark

        spark = get_spark(app_name="degdb_pipeline")
        for row in curate(
            spark, args.sf_dir or DEFAULT_SF_DIR, args.out,
            rewrite_dedup=args.rewrite_dedup, packing=args.packing,
        ):
            print(json.dumps(row, sort_keys=True))
        return 0

    if args.cmd == "dedup-report":
        from degdb_spark.catalog import DEFAULT_SF_DIR
        from degdb_spark.queries.text_queries import dup_rate_by_source
        from degdb_spark.session import get_spark

        spark = get_spark(app_name="degdb_dedup_report")
        for row in dup_rate_by_source(spark, args.sf_dir or DEFAULT_SF_DIR).collect():
            print(json.dumps(row.asDict(), sort_keys=True, default=str))
        return 0

    if args.cmd == "search":
        from degdb_spark.catalog import DEFAULT_SF_DIR, load_table
        from degdb_spark.operators.search import bm25_topk
        from degdb_spark.session import get_spark

        spark = get_spark(app_name="degdb_search")
        docs = load_table(spark, args.sf_dir or DEFAULT_SF_DIR, "documents")
        hits = bm25_topk(docs, args.terms.split(), k=args.k).collect()
        snippets = {
            r.doc_id: r.text[:80]
            for r in docs.filter(
                docs.doc_id.isin([h.doc_id for h in hits])
            ).collect()
        }
        for h in hits:
            print(json.dumps({
                "rank": h.rank, "doc_id": h.doc_id, "score": h.score,
                "n_terms_hit": h.n_terms_hit, "snippet": snippets.get(h.doc_id, ""),
            }, sort_keys=True))
        return 0

    if args.cmd == "sql":
        from degdb_spark.catalog import DEFAULT_SF_DIR, register_all
        from degdb_spark.session import get_spark

        spark = get_spark(app_name="degdb_sql")
        register_all(spark, args.sf_dir or DEFAULT_SF_DIR)
        for row in spark.sql(args.q).limit(args.limit).collect():
            print(json.dumps(row.asDict(), sort_keys=True, default=str))
        return 0

    if args.cmd == "profile":
        from degdb_spark.catalog import DEFAULT_SF_DIR, load_table
        from degdb_spark.operators.profile import profile_table
        from degdb_spark.session import get_spark

        spark = get_spark(app_name="degdb_profile")
        sf_dir = args.sf_dir or DEFAULT_SF_DIR
        df = load_table(spark, sf_dir, args.table)
        cols = args.columns.split(",") if args.columns else None
        for row in profile_table(
            df, columns=cols, exact_distinct=not args.approx
        ).collect():
            print(json.dumps(row.asDict(), sort_keys=True, default=str))
        return 0

    if args.cmd == "bench":
        import bench  # repo-root module (driver contract)

        bench.main()
        return 0

    if args.cmd == "query":
        db = _db(args)
        for row in db.query_json(args.q, limit=args.limit):
            print(json.dumps(row, sort_keys=True))
        return 0

    # serve
    from degdb_spark.server import DegDBServer

    db = _db(args)
    srv = DegDBServer(db, host=args.host, port=args.port).start()
    print(f"degdb_spark serving on http://{srv.host}:{srv.port} "
          f"(UI: /static/, API: /api/v1/)", flush=True)
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
