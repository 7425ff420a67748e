"""End-to-end quickstart: synthesize a processed-JSON corpus, ingest it,
retrieve through the public engine API, and answer through the full
serving stack with an offline LLM.

Runs on CPU in ~a minute (random-weight tiny models; on a real TPU with
local checkpoints, point ``encoder.model_name`` / ``rerank.model_name``
at HF checkpoint directories instead — see README "Model weights").

    JAX_PLATFORMS=cpu python examples/quickstart.py
"""
import json
import os
import sys
import tempfile

# runnable from anywhere without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = tempfile.mkdtemp(prefix="veritasfi_quickstart_")


# 1. A processed-PDF JSON document: header row {start, end, date_published}
#    then chunk rows {content, page_number, title_summary?, bundle_id?}
#    (the contract `cli preprocess` / `cli ocr` produce from raw files).
def write_corpus_dir() -> str:
    d = os.path.join(BASE, "processed")
    os.makedirs(d)
    rows = [{"start": 1, "end": 3, "date_published": "2024-03-01"}]
    facts = [
        ("zeekr reported quarterly revenue growth of forty percent",
         "Q4 revenue"),
        ("vehicle deliveries rose year over year beating guidance",
         "Deliveries"),
        ("gross margin expanded on battery cost declines", "Margins"),
        ("the company announced a new sedan platform launch", "Products"),
        ("operating expenses grew with research spending", "Opex"),
        ("cash position remains strong after the ipo proceeds", "Cash"),
    ]
    for i, (content, title) in enumerate(facts):
        rows.append({"content": content, "page_number": 1 + i % 3,
                     "title_summary": title})
    with open(os.path.join(d, "annual_report.json"), "w") as f:
        json.dump(rows, f)
    return d


def main() -> None:
    import jax.numpy as jnp

    from veritasfi_tpu.config import Config
    from veritasfi_tpu.engine import RAGEngine
    from veritasfi_tpu.models.encoder import TextEncoder
    from veritasfi_tpu.models.encoder_reranker import EncoderReranker
    from veritasfi_tpu.serving.llm_client import FakeLLM, ProtocolResponder
    from veritasfi_tpu.stack import build_stack

    cfg = Config()
    cfg.persist_directory = os.path.join(BASE, "index")
    cfg.llm.base_url = ""            # offline: protocol-faithful FakeLLM
    cfg.rerank.max_candidates = 10   # enables the fused serve path

    # tiny random-weight models so the example runs anywhere
    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    reranker = EncoderReranker(preset="tiny-test", passage_max_length=64)

    # 2. ingest: processed JSON -> CorpusIndex (embedding matrix + metadata
    #    arrays + text store) + BM25 index, persisted under the config dir
    engine = RAGEngine(cfg, embed_fn=encoder.encode)
    index = engine.create_collection("annual", write_corpus_dir())
    print(f"ingested {index.num_chunks} chunks, "
          f"{len(index.title_texts)} titles")

    # 3. retrieve through the engine API (dense + title + BM25, fused into
    #    one device dispatch; HyDE chunks ride the same program)
    retriever = engine.create_retriever(4, "annual")
    chunks = retriever.invoke("what was the revenue growth",
                              ["revenue grew strongly in the quarter"])
    for c in chunks[:3]:
        print(f"  [{c['retriever']}] {c['score']:.3f} "
              f"{c['page_content'][:60]!r}")

    # 4. full serving stack: rewrite -> retrieve -> rerank -> answer
    #    (single-readback fused path + continuous batcher), same call the
    #    HTTP front (`cli serve`) makes per request
    #    ProtocolResponder speaks the 3-line rewrite / ANSWER: protocols so
    #    the FULL RAG path runs offline (swap for LLMClient + a vLLM-protocol
    #    endpoint, or the in-process generation server, in production)
    stack = build_stack(cfg, collections={"annual": 4},
                        embed_fn=encoder.encode, reranker=reranker,
                        llm=FakeLLM(ProtocolResponder()))
    try:
        answer, _, rag_info, rewrittens, *_ = (
            stack.chat_service.generate_response_async(
                "what was the revenue growth", "quickstart"))
        print(f"rewritten: {rewrittens}")
        print(f"answer: {answer!r}")
    finally:
        stack.close()
    print("QUICKSTART OK")


if __name__ == "__main__":
    main()
