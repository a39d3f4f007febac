"""CLI -- the reference's cmd/bleve cobra commands re-expressed:
build (bulk), create, index, search/query, count, fields, mapping,
registry, dictionary, dump, dumpdoc, check, delete, forcemerge,
topterms, stats.

  python -m bleve_ray build  INDEX_DIR INPUT.parquet [...] [--field col=analyzer] ...
  python -m bleve_ray search INDEX_DIR 'query string' [--size N]
  python -m bleve_ray query  INDEX_DIR '{"term": "x", "field": "content"}'
  python -m bleve_ray count  INDEX_DIR
  python -m bleve_ray fields INDEX_DIR
  python -m bleve_ray dictionary INDEX_DIR FIELD [--limit N]
  python -m bleve_ray dump   INDEX_DIR [--limit N]
  python -m bleve_ray check  INDEX_DIR
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_parquet_inputs(inputs, index_dir):
    """The reference indexes JSON documents; here .json/.jsonl/.ndjson
    inputs are converted to parquet once via a streaming ray.data pass
    (read_json -> write_parquet) and the build proceeds on the parquet."""
    import os

    json_in = [
        p for p in inputs
        if p.endswith((".json", ".jsonl", ".ndjson"))
    ]
    if not json_in:
        return inputs
    import ray.data

    conv_dir = os.path.join(index_dir, "_json_inputs")
    os.makedirs(conv_dir, exist_ok=True)
    ray.data.read_json(json_in).write_parquet(conv_dir)
    out = [p for p in inputs if p not in json_in]
    out.extend(
        sorted(
            os.path.join(conv_dir, f)
            for f in os.listdir(conv_dir)
            if f.endswith(".parquet")
        )
    )
    return out


def _register_nested_roots(opts) -> None:
    """Each nested path's ROOT column becomes a docvalue so the
    query-time same-element verifier (search/nested.py) can read the
    structure back (same rule as index/nested.options_from_mapping)."""
    for p in opts.nested_paths:
        root = p.split(".", 1)[0]
        if root not in opts.docvalue_fields:
            opts.docvalue_fields.append(root)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="bleve_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("index_dir")
    b.add_argument("inputs", nargs="+")
    b.add_argument("--field", action="append", default=[],
                   help="col=analyzer (default content=standard)")
    b.add_argument("--doc-id-fields", default=None)
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--scoring", default="bm25", choices=["bm25", "tfidf"])
    b.add_argument("--docvalues", default="", help="comma-separated columns")
    b.add_argument("--store", default="", help="comma-separated columns")
    b.add_argument("--nested", action="append", default=[],
                   help="dotted property path whose array elements are "
                        "NESTED sub-documents (repeatable); conjunctions "
                        "over its fields scope to the same element and "
                        "the path's root column is stored as a docvalue")
    b.add_argument("--bleve-mapping", default=None,
                   help="path to a bleve JSON index mapping; inputs must "
                        "then be JSON document files (one doc per file, "
                        "doc id = file name sans extension) -- the "
                        "migration path for existing bleve users")

    for name in ("count", "fields", "check", "stats"):
        p = sub.add_parser(name)
        p.add_argument("index_dir")

    s = sub.add_parser("search")
    s.add_argument("index_dir")
    s.add_argument("query_string")
    s.add_argument("--size", type=int, default=10)
    s.add_argument("--from", dest="from_", type=int, default=0)
    s.add_argument("--synonym-source", default="",
                   help="default synonym source (thesaurus collection)")

    q = sub.add_parser("query")
    q.add_argument("index_dir")
    q.add_argument("query_json")
    q.add_argument("--size", type=int, default=10)
    q.add_argument("--synonym-source", default="",
                   help="default synonym source (thesaurus collection)")

    fm = sub.add_parser("forcemerge")
    fm.add_argument("index_dir")
    fm.add_argument("--target", type=int, default=1)

    tt = sub.add_parser("topterms")
    tt.add_argument("index_dir")
    tt.add_argument("field")
    tt.add_argument("--limit", type=int, default=20)

    cc = sub.add_parser("centroids")
    cc.add_argument("index_dir")
    cc.add_argument("field")
    cc.add_argument("--limit", type=int, default=20)

    d = sub.add_parser("dictionary")
    d.add_argument("index_dir")
    d.add_argument("field")
    d.add_argument("--limit", type=int, default=50)

    du = sub.add_parser("dump")
    du.add_argument("index_dir")
    du.add_argument("--limit", type=int, default=20)

    dl = sub.add_parser("delete")
    dl.add_argument("index_dir")
    dl.add_argument("doc_ids", nargs="+")

    cr = sub.add_parser("create", help="create an empty index with a mapping")
    cr.add_argument("index_dir")
    cr.add_argument("--field", action="append", default=[],
                    help="col=analyzer (default content=standard)")
    cr.add_argument("--doc-id-fields", default=None)
    cr.add_argument("--shards", type=int, default=8)
    cr.add_argument("--scoring", default="bm25", choices=["bm25", "tfidf"])
    cr.add_argument("--docvalues", default="")
    cr.add_argument("--store", default="")
    cr.add_argument("--nested", action="append", default=[])

    ix = sub.add_parser("index", help="index one document (id + JSON)")
    ix.add_argument("index_dir")
    ix.add_argument("doc_id")
    ix.add_argument("doc_json")

    mp = sub.add_parser("mapping", help="print the index mapping/options")
    mp.add_argument("index_dir")

    sub.add_parser("registry", help="list registered analyzers")

    dd = sub.add_parser("dumpdoc", help="dump one document by external id")
    dd.add_argument("index_dir")
    dd.add_argument("doc_id")

    sy = sub.add_parser(
        "synonyms", help="persist synonym definitions into the index"
    )
    sy.add_argument("index_dir")
    sy.add_argument("definitions_json",
                    help='[{"synonyms": [...]}, {"input": [...], ...}]')
    sy.add_argument("--analyzer", default="")
    sy.add_argument(
        "--collection",
        default="",
        help="index the definitions as thesaurus-segment DOCUMENTS in "
             "this synonym collection (IndexSynonym); ids are "
             "syn-<n> in list order, or each def's 'id' key",
    )

    um = sub.add_parser(
        "update-mapping",
        help="drop-only live mapping update (index_update.go rules)",
    )
    um.add_argument("index_dir")
    um.add_argument("--drop-field", action="append", default=[])
    um.add_argument("--drop-store", action="append", default=[])
    um.add_argument("--drop-docvalues", action="append", default=[])

    sn = sub.add_parser(
        "snapshots",
        help="list rollback points; --rollback EPOCH restores one "
             "(cmd/bleve scorch snapshot role)",
    )
    sn.add_argument("index_dir")
    sn.add_argument("--rollback", type=int, default=None)

    de = sub.add_parser("deleted",
                        help="tombstoned doc ids (scorch deleted role)")
    de.add_argument("index_dir")

    iv = sub.add_parser("internal",
                        help="internal KV entries (scorch internal role)")
    iv.add_argument("index_dir")

    ki = sub.add_parser(
        "knn-ivf",
        help="build the per-index IVF sidecar for a vector field so knn "
             "requests probe cells instead of scanning every vector "
             "(per-segment faiss role)",
    )
    ki.add_argument("index_dir")
    ki.add_argument("field")
    ki.add_argument("--nlist", type=int, default=16)

    args = ap.parse_args(argv)

    if args.cmd == "synonyms":
        from .search import Index

        idx = Index.open(args.index_dir)
        defs = json.loads(args.definitions_json)
        if args.collection:
            from .index.thesaurus import add_synonym_documents

            docs = [
                (d.pop("id", f"syn-{i}"), d) for i, d in enumerate(defs)
            ]
            man = add_synonym_documents(
                args.index_dir,
                args.collection,
                docs,
                args.analyzer,
                man=idx.reader.manifest,
            )
            print(json.dumps({"definitions": len(docs),
                              "collection": args.collection,
                              "epoch": man.epoch}))
            return
        idx.define_synonyms(defs, analyzer_name=args.analyzer)
        print(json.dumps({"definitions": len(defs),
                          "epoch": idx.reader.manifest.epoch + 1}))
        return

    if args.cmd == "update-mapping":
        from .index import IndexOptions, apply_mapping_update
        from .index import manifest as manifest_mod

        man = manifest_mod.load(args.index_dir)
        opts = IndexOptions.from_dict(man.options)
        for f in args.drop_field:
            opts.fields.pop(f, None)
        opts.store_fields = [
            f for f in opts.store_fields
            if f not in args.drop_store and f not in args.drop_field
        ]
        opts.docvalue_fields = [
            f for f in opts.docvalue_fields
            if f not in args.drop_docvalues and f not in args.drop_field
        ]
        info = apply_mapping_update(args.index_dir, opts)
        print(json.dumps(
            {
                f: {
                    "deleted": i.deleted,
                    "store": i.store,
                    "docvalues": i.docvalues,
                }
                for f, i in info.items()
            },
            indent=1, sort_keys=True,
        ))
        return

    if args.cmd == "snapshots":
        from .index import manifest as manifest_mod

        if args.rollback is not None:
            man = manifest_mod.rollback(args.index_dir, args.rollback)
            print(json.dumps({"epoch": man.epoch, "rolled_back": True}))
        else:
            print(json.dumps(
                {"rollback_points": manifest_mod.rollback_points(
                    args.index_dir)}))
        return

    if args.cmd == "deleted":
        from .index import manifest as manifest_mod
        from .index.mutate import load_deleted

        man = manifest_mod.load(args.index_dir)
        dn = load_deleted(args.index_dir, man)
        print(json.dumps({"deleted_count": len(dn)}))
        return

    if args.cmd == "internal":
        from .index import manifest as manifest_mod

        man = manifest_mod.load(args.index_dir)
        print(json.dumps(dict(man.internal), indent=1, sort_keys=True))
        return

    if args.cmd == "registry":
        from .analysis.analyzers import registered_analyzers
        from .analysis.token_filters import registered_token_filters

        print(
            json.dumps(
                {
                    "analyzers": registered_analyzers(),
                    "token_filters": registered_token_filters(),
                }
            )
        )
        return

    if args.cmd == "create":
        from .index import FieldConfig, IndexOptions, build_index

        fields = {}
        for f in args.field or []:
            col, _, an = f.partition("=")
            fields[col] = FieldConfig(analyzer=an or "standard")
        if not fields:
            fields = {"content": FieldConfig()}
        opts = IndexOptions(
            fields=fields,
            doc_id_fields=(
                args.doc_id_fields.split(",") if args.doc_id_fields else None
            ),
            num_shards=args.shards,
            scoring_model=args.scoring,
            docvalue_fields=[c for c in args.docvalues.split(",") if c],
            store_fields=[c for c in args.store.split(",") if c],
            nested_paths=list(args.nested or []),
        )
        _register_nested_roots(opts)
        man = build_index([], args.index_dir, opts)
        print(json.dumps({"doc_count": man.stats.get("doc_count", 0),
                          "epoch": man.epoch}))
        return

    if args.cmd == "index":
        from .search import Index

        idx = Index.open(args.index_dir)
        idx.index(args.doc_id, json.loads(args.doc_json))
        print(json.dumps({"doc_count": idx.doc_count(),
                          "epoch": idx.reader.manifest.epoch}))
        return

    if args.cmd == "mapping":
        from .index import manifest as manifest_mod

        man = manifest_mod.load(args.index_dir)
        print(json.dumps(man.options, indent=1, sort_keys=True))
        return

    if args.cmd == "dumpdoc":
        from .search import Index

        idx = Index.open(args.index_dir)
        doc = idx.document(args.doc_id)
        if doc is None:
            print(json.dumps(None))
            sys.exit(1)
        print(json.dumps(doc, default=str, indent=1))
        return

    if args.cmd == "delete":
        from .index.mutate import delete_ids

        man = delete_ids(args.index_dir, args.doc_ids)
        print(json.dumps({"deleted_total": man.deleted_count,
                          "epoch": man.epoch}))
        return

    if args.cmd == "build":
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="error", log_to_driver=False)
        from .index import FieldConfig, IndexOptions, build_index

        if args.bleve_mapping:
            import glob as _glob
            import os as _os

            import pyarrow.parquet as _pq

            from .index.json_mapping import options_from_bleve_mapping

            mapping = json.load(open(args.bleve_mapping))
            docs = []
            for pat in args.inputs:
                for f in sorted(_glob.glob(pat)) or [pat]:
                    doc_id = _os.path.splitext(_os.path.basename(f))[0]
                    docs.append((doc_id, json.load(open(f))))
            tbl, opts = options_from_bleve_mapping(
                mapping, docs,
                num_shards=args.shards,
                nested_paths=list(args.nested or []),
            )
            _os.makedirs(args.index_dir, exist_ok=True)
            src = _os.path.join(args.index_dir, "_bleve_docs.parquet")
            _pq.write_table(tbl, src)
            _register_nested_roots(opts)
            man = build_index([src], args.index_dir, opts)
            print(json.dumps({"doc_count": man.stats["doc_count"],
                              "segments": len(man.segments),
                              "epoch": man.epoch}))
            ray.shutdown()
            return
        args.inputs = _ensure_parquet_inputs(args.inputs, args.index_dir)
        fields = {}
        for f in args.field or []:
            col, _, an = f.partition("=")
            fields[col] = FieldConfig(analyzer=an or "standard")
        if not fields:
            fields = {"content": FieldConfig()}
        opts = IndexOptions(
            fields=fields,
            doc_id_fields=(
                args.doc_id_fields.split(",") if args.doc_id_fields else None
            ),
            num_shards=args.shards,
            scoring_model=args.scoring,
            docvalue_fields=[c for c in args.docvalues.split(",") if c],
            store_fields=[c for c in args.store.split(",") if c],
            nested_paths=list(args.nested or []),
        )
        _register_nested_roots(opts)
        man = build_index(args.inputs, args.index_dir, opts)
        print(json.dumps({"doc_count": man.stats["doc_count"],
                          "segments": len(man.segments),
                          "epoch": man.epoch}))
        ray.shutdown()
        return

    if args.cmd == "forcemerge":
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="error", log_to_driver=False)
        from .index.build import IndexOptions, run_merge_phase
        from .index import manifest as manifest_mod

        man = manifest_mod.load(args.index_dir)
        opts = IndexOptions(target_segments_per_shard=args.target)
        man.merge_done = False
        man = run_merge_phase(args.index_dir, man, opts)
        print(json.dumps({"segments": len(man.segments), "epoch": man.epoch}))
        ray.shutdown()
        return

    from .search import Index

    idx = Index.open(args.index_dir)
    if args.cmd == "count":
        print(idx.reader.doc_count())
    elif args.cmd == "knn-ivf":
        from .index.knn_ivf import build_knn_ivf

        meta = build_knn_ivf(args.index_dir, args.field, nlist=args.nlist)
        print(json.dumps(meta, sort_keys=True))
    elif args.cmd == "stats":
        print(json.dumps(idx.reader.stats(), sort_keys=True))
    elif args.cmd == "fields":
        print(json.dumps(list(idx.reader.options["fields"])))
    elif args.cmd == "check":
        man = idx.reader.manifest
        import os

        ok = all(
            os.path.exists(os.path.join(args.index_dir, s.path))
            for s in man.segments
        )
        n_terms = sum(s.term_count for s in man.segments)
        print(json.dumps({"ok": ok, "epoch": man.epoch,
                          "segments": len(man.segments), "terms": n_terms}))
        sys.exit(0 if ok else 1)
    elif args.cmd == "search":
        if args.synonym_source:
            idx.mapping.default_synonym_source = args.synonym_source
        res = idx.search(
            {"query": {"query": args.query_string}, "size": args.size,
             "from": args.from_}
        )
        print(json.dumps(res.to_dict(), indent=1))
    elif args.cmd == "query":
        if args.synonym_source:
            idx.mapping.default_synonym_source = args.synonym_source
        res = idx.search(
            {"query": json.loads(args.query_json), "size": args.size}
        )
        print(json.dumps(res.to_dict(), indent=1))
    elif args.cmd == "topterms":
        for term, df in idx.term_frequencies(args.field, args.limit):
            print(f"{term}\t{df}")
    elif args.cmd == "centroids":
        for e in idx.centroid_cardinalities(args.field, args.limit):
            print(json.dumps(e))
    elif args.cmd == "dictionary":
        for term, df in idx.reader.dictionary(args.field)[: args.limit]:
            print(f"{term}\t{df}")
    elif args.cmd == "dump":
        man = idx.reader.manifest
        for s in man.segments[: args.limit]:
            print(json.dumps(vars(s)))


if __name__ == "__main__":
    main()
