"""Command-line entry points.

  python -m veritasfi_tpu.cli ingest --config c.yaml --collection zeekr \
      --source-dir data/processed_pdf/zeekr
      (reference analogue: python src/load_data.py, load_data.py:132-169)

  python -m veritasfi_tpu.cli serve --config c.yaml --port 8080
      (the HTTP front the reference implies but doesn't ship)

  python -m veritasfi_tpu.cli query --config c.yaml "What is the margin?"
      (one-shot QA through the async path)

  python -m veritasfi_tpu.cli e2e --config c.yaml --questions qs.json \
      --out-dir runs/e2e
      (reference analogue: experiments/e2e/qa_e2e_async.py)
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def _train_reranker(args) -> int:
    """CLI front of train.reranker_lora (reference: torchrun +
    FlagEmbedding run.py via train_bge_rr.sh:7-39)."""
    from .models.reranker import DECODER_PRESETS
    from .train.reranker_lora import (LoRATrainConfig, RerankerTrainer,
                                      anonymize_company)

    groups = []
    with open(args.data) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if not row.get("pos"):
                continue                       # incomplete row, like below
            passages = ([row["pos"][0]] +
                        list(row.get("neg", []))[: args.group_size - 1])
            if len(passages) < args.group_size:
                continue                       # need a full group
            query = row["query"]
            if args.anonymize:
                query = anonymize_company(query, args.anonymize)
                passages = [anonymize_company(p, args.anonymize)
                            for p in passages]
            groups.append((query, passages))
    if not groups:
        print(json.dumps({"error": "no complete groups in data"}))
        return 1

    cfg = LoRATrainConfig(learning_rate=args.lr, group_size=args.group_size,
                          total_steps=args.steps)
    mesh = None
    if args.mesh:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        dp, tp = (int(x) for x in args.mesh.lower().split("x"))
        mesh = Mesh(np.asarray(jax.devices()[: dp * tp]).reshape(dp, tp),
                    ("data", "model"))
    trainer = RerankerTrainer(arch=DECODER_PRESETS[args.preset], config=cfg,
                              mesh=mesh)
    if args.resume:
        trainer.restore_checkpoint(args.resume)

    def batches():
        i = 0
        for _ in range(args.steps):
            batch = [groups[(i + j) % len(groups)]
                     for j in range(args.groups_per_batch)]
            i += args.groups_per_batch
            yield batch

    losses = trainer.fit(batches(), checkpoint_dir=args.out_dir)
    path = trainer.save_checkpoint(args.out_dir)
    print(json.dumps({"steps": trainer.step_count,
                      "final_loss": losses[-1] if losses else None,
                      "first_loss": losses[0] if losses else None,
                      "checkpoint": path}))
    return 0


def main(argv=None) -> int:
    # global options live on a PARENT parser shared by every subcommand, so
    # `cli ingest --config c.yaml` (options after the subcommand, as every
    # docstring example writes them) parses as well as `cli --config c.yaml
    # ingest`
    # SUPPRESS defaults: the parent is attached to the main parser AND each
    # subparser, and argparse applies every parser's defaults in sequence —
    # a plain default=None on the subparser copy would CLOBBER a value
    # parsed before the subcommand (`cli --config c.yaml ingest` silently
    # ran on defaults)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--config", default=argparse.SUPPRESS)
    common.add_argument("--log-level", default=argparse.SUPPRESS)
    parser = argparse.ArgumentParser(prog="veritasfi_tpu", parents=[common])
    sub = parser.add_subparsers(dest="cmd", required=True)

    def add_parser(name, **kw):
        return sub.add_parser(name, parents=[common], **kw)

    p_ingest = add_parser("ingest")
    p_ingest.add_argument("--collection", required=True)
    p_ingest.add_argument("--source-dir", required=True)
    p_ingest.add_argument("--ignore-range", action="store_true")

    p_pre = add_parser(
        "preprocess",
        help="raw .txt/.md documents -> processed-JSON chunk files "
             "(page-aware chunking, table/figure bundles, section title "
             "summaries) ready for `ingest`")
    p_pre.add_argument("--source-dir", required=True)
    p_pre.add_argument("--out-dir", required=True)
    p_pre.add_argument("--target-chars", type=int, default=1200)
    p_pre.add_argument("--default-date", default="1970-01-01",
                       help="date_published when the filename has no "
                            "YYYY-MM-DD pattern")

    p_ocr = add_parser(
        "ocr",
        help="scanned page images (sorted filenames = page order) -> one "
             "processed-JSON chunk file, via the in-repo glyph recognizer "
             "(trained on first use and cached in --model-dir)")
    p_ocr.add_argument("--images-dir", required=True)
    p_ocr.add_argument("--out", required=True)
    p_ocr.add_argument("--model-dir", default=None,
                       help="recognizer checkpoint dir; loaded if it "
                            "exists, else trained and saved there")
    p_ocr.add_argument("--train-steps", type=int, default=700)
    p_ocr.add_argument("--fonts", default="default",
                       help="comma-separated font families to train "
                            "across (see ingest.ocr.FONT_FAMILIES; "
                            "'all' = every family on this host)")
    p_ocr.add_argument("--rotate-deg", type=float, default=0.0,
                       help="uniform +-deg rotation jitter on training "
                            "crops (scans are rarely perfectly deskewed)")
    p_ocr.add_argument("--date", default="1970-01-01",
                       help="date_published for the produced chunks")
    p_ocr.add_argument("--doc-name", default=None)

    p_serve = add_parser("serve")
    p_serve.add_argument("--host", default="0.0.0.0")
    p_serve.add_argument("--port", type=int, default=8080)

    p_query = add_parser("query")
    p_query.add_argument("question")
    p_query.add_argument("--session", default="cli")

    p_e2e = add_parser("e2e")
    p_e2e.add_argument("--questions", required=True)
    p_e2e.add_argument("--out-dir", required=True)
    p_e2e.add_argument("--self-judge", action="store_true")
    p_e2e.add_argument("--batch-size", type=int, default=1,
                       help="questions per session (reference "
                            "qa_e2e_async.py BATCH_SIZE=1: fresh session "
                            "per question, no QA-history contamination)")

    # retrieval-quality pipeline (reference experiments/retriever stages 1-4)
    p_ret = add_parser("eval-retrieval")
    p_ret.add_argument("--samples", required=True,
                       help="JSON list of {question, evidences: [str]}")
    p_ret.add_argument("--out", required=True, help="statistic.json path")
    p_ret.add_argument("--judge", default="cos",
                       choices=["cos", "string", "llm"])
    p_ret.add_argument("--sim-threshold", type=float, default=0.9)
    p_ret.add_argument("--use-hyde", action="store_true")
    p_ret.add_argument("--judge-model", default=None,
                       help="dedicated judge embedder: local HF checkpoint "
                            "dir (Qwen3-Embedding-class last-token pooling "
                            "or BERT-class) or decoder preset; default = "
                            "the retrieval encoder (reference judges with "
                            "Qwen3-Embedding-4B, step3_mul.py:384)")

    p_col = add_parser(
        "collect", help="tabulate + chart statistic.json trees "
                        "(reference collect_*.py parity)")
    p_col.add_argument("--root", required=True,
                       help="directory of <version>/<experiment>/"
                            "statistic.json")
    p_col.add_argument("--out-csv", default=None)
    p_col.add_argument("--charts", default=None,
                       help="directory for grouped-bar PNGs "
                            "(avg_hit_rate / avg_chunk)")

    p_nr = add_parser(
        "collect-num-recalls",
        help="per-file + overall num_recalls / unique-recall statistics "
             "over a result-file tree (reference "
             "collect_num_recalls.py:57-129)")
    p_nr.add_argument("--root", required=True,
                      help="base directory searched recursively")
    p_nr.add_argument("--filename", default="result.json",
                      help="result filename to match (default result.json)")
    p_nr.add_argument("--out", default=None,
                      help="write the JSON summary here (default: "
                           "<root>/num_recalls_summary.json)")

    p_m3 = add_parser(
        "m3-eval",
        help="fused dense+sparse+ColBERT vs dense-only ranking on the "
             "graded fixture (evals/m3_eval.py; M3_r04.json evidence)")
    p_m3.add_argument("--seed", type=int, default=0)
    p_m3.add_argument("--steps", type=int, default=160)
    p_m3.add_argument("--out", default=None)

    p_tr = add_parser(
        "train-reranker",
        help="LoRA fine-tune the cross-encoder reranker (the reference's "
             "train_bge_rr.sh surface; FlagEmbedding JSONL data format)")
    p_tr.add_argument("--data", required=True,
                      help="JSONL of {query, pos: [str], neg: [str]}")
    p_tr.add_argument("--out-dir", required=True)
    p_tr.add_argument("--steps", type=int, default=100)
    p_tr.add_argument("--groups-per-batch", type=int, default=2)
    p_tr.add_argument("--group-size", type=int, default=8,
                      help="1 positive + N-1 negatives (train_bge_rr.sh:20)")
    p_tr.add_argument("--preset", default="gemma-2b")
    p_tr.add_argument("--lr", type=float, default=1e-4)
    p_tr.add_argument("--anonymize", default=None, metavar="COMPANY",
                      help="two-stage recipe stage 1: strip the company "
                           "name from all texts (README.md:24-27)")
    p_tr.add_argument("--resume", default=None,
                      help="orbax checkpoint path to continue from")
    p_tr.add_argument("--mesh", default=None, metavar="DATAxMODEL",
                      help="e.g. 4x2 = dp4 tp2 over the available devices")

    args = parser.parse_args(argv)
    logging.basicConfig(level=getattr(args, "log_level", "INFO"))

    if args.cmd == "train-reranker":
        return _train_reranker(args)

    if args.cmd == "ocr":
        import os

        import numpy as np
        from PIL import Image

        from .ingest.ocr import (OCRModel, available_fonts,
                                 ocr_pages_to_processed, train_ocr)

        if args.model_dir and os.path.exists(
                os.path.join(args.model_dir, "meta.json")):
            model = OCRModel.load(args.model_dir)
        else:
            fonts = (available_fonts() if args.fonts == "all"
                     else [f.strip() for f in args.fonts.split(",")])
            model = train_ocr(steps=args.train_steps, fonts=fonts,
                              rotate_deg=args.rotate_deg)
            if args.model_dir:
                model.save(args.model_dir)
        exts = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")
        paths = sorted(
            os.path.join(args.images_dir, f)
            for f in os.listdir(args.images_dir)
            if f.lower().endswith(exts))
        if not paths:
            parser.error(f"no page images in {args.images_dir}")
        pages = [np.asarray(Image.open(p).convert("L")) for p in paths]
        doc = args.doc_name or os.path.basename(
            os.path.normpath(args.images_dir))
        rows = ocr_pages_to_processed(model, pages, args.date,
                                      doc_name=doc, out_path=args.out)
        print(json.dumps({"pages": len(pages), "chunks": len(rows) - 1,
                          "out": args.out}))
        return 0

    if args.cmd == "preprocess":
        from .ingest.chunker import preprocess_dir

        written = preprocess_dir(args.source_dir, args.out_dir,
                                 target_chars=args.target_chars,
                                 default_date=args.default_date)
        print(json.dumps({"files": len(written), "out_dir": args.out_dir}))
        return 0

    from .config import load_config

    config = load_config(getattr(args, "config", None))
    if not hasattr(args, "log_level"):
        # no explicit --log-level: the config file's log_level applies
        # (basicConfig above already ran, so set the level directly)
        logging.getLogger().setLevel(config.log_level)

    if args.cmd == "collect":
        from .evals.retrieval_eval import collect_experiments, plot_experiments

        rows = collect_experiments(args.root, out_csv=args.out_csv)
        charts = plot_experiments(rows, args.charts) if args.charts else []
        print(json.dumps({"rows": len(rows), "charts": charts}))
        return 0

    if args.cmd == "collect-num-recalls":
        import os as _os

        from .evals.retrieval_eval import (collect_num_recalls,
                                           summarize_num_recalls)

        stats = collect_num_recalls(args.root, filename=args.filename)
        out = args.out or _os.path.join(args.root,
                                        "num_recalls_summary.json")
        summary = summarize_num_recalls(stats, out_path=out)
        print(json.dumps({k: v for k, v in summary.items()
                          if k != "per_file"} | {"out": out}))
        return 0

    if args.cmd == "m3-eval":
        from .evals.m3_eval import main as m3_main

        m3_args = ["--seed", str(args.seed), "--steps", str(args.steps)]
        if args.out:
            m3_args += ["--out", args.out]
        m3_main(m3_args)
        return 0

    if args.cmd == "ingest":
        from .engine import RAGEngine

        engine = RAGEngine(config)
        index = engine.create_collection(args.collection, args.source_dir,
                                         ignore_range=args.ignore_range)
        print(json.dumps({"collection": args.collection,
                          "chunks": index.num_chunks,
                          "titles": len(index.title_texts),
                          "bundles": len(index.bundle_names)}))
        return 0

    from .stack import build_stack

    stack = build_stack(config)
    if not stack.chat_service.retrievers:
        # build_stack degrades a missing collection to a warning (library
        # users may assemble retrievers later); every CLI command past
        # this point needs one — fail fast with the real cause instead of
        # an IndexError mid-serve or after expensive eval stages
        print(json.dumps({
            "error": f"no collection loaded (persist_directory="
                     f"{config.persist_directory!r}, collection="
                     f"{config.collection!r}); run `ingest` first"}))
        stack.close()
        return 1
    try:
        if args.cmd == "serve":
            from .serving.server import serve

            serve(stack, host=args.host, port=args.port)
        elif args.cmd == "query":
            answer, _, rag_info, rewrittens, *_ = (
                stack.chat_service.generate_response_async(
                    args.question, args.session))
            print(json.dumps({"answer": answer, "rewrittens": rewrittens,
                              "rag_info": rag_info}, ensure_ascii=False))
        elif args.cmd == "e2e":
            from .evals import load_questions, run_e2e

            questions = load_questions(args.questions)
            # one SESSION per batch: a single big batch would condition
            # every answer on all previous questions' QA history
            b = max(args.batch_size, 1)
            batches = [questions[i: i + b]
                       for i in range(0, len(questions), b)]
            arts = run_e2e(stack.chat_service, batches, args.out_dir,
                           self_judge=args.self_judge)
            print(json.dumps({"questions": len(arts),
                              "out_dir": args.out_dir}))
        elif args.cmd == "eval-retrieval":
            from .evals import (aggregate_hit_stats, collect_recall,
                                hit_rate_eval, rewrite_dataset)
            from .evals.retrieval_eval import hyde_with_perplexity

            # JSON array or JSONL (the reference eval sets ship as
            # JSONL of {question, evidences} rows - RECIPES.md step 4)
            with open(args.samples, encoding="utf-8") as f:
                text = f.read()
            try:
                samples = json.loads(text)
                if isinstance(samples, dict):
                    samples = [samples]     # single-row JSONL parses as one
            except json.JSONDecodeError:
                samples = [json.loads(line) for line in text.splitlines()
                           if line.strip()]
            manager = stack.chat_service.get_or_create_chat_manager(
                "eval-retrieval")
            records = rewrite_dataset(samples, manager)
            if args.use_hyde:
                records = hyde_with_perplexity(records, manager)
            retriever = stack.chat_service.retrievers[0]
            records = collect_recall(records, retriever,
                                     use_hyde=args.use_hyde)
            # --judge llm votes through the manager's YES/NO relevance
            # judge (reference step3_mul.py:291-353 LLM-vote mode)
            llm_vote = (
                (lambda evidence, chunk: manager.evaluate_chunk(
                    chunk, evidence, evidence))
                if args.judge == "llm" else None)
            if args.judge_model:
                from .evals.retrieval_eval import build_judge_embed_fn

                judge_embed = build_judge_embed_fn(args.judge_model)
            else:
                judge_embed = stack.engine.embed_fn
            results = hit_rate_eval(records, judge_embed,
                                    method=args.judge,
                                    sim_threshold=args.sim_threshold,
                                    llm_vote=llm_vote)
            stats = aggregate_hit_stats(results, args.out)
            print(json.dumps(stats))
    finally:
        stack.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
