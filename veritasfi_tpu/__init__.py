"""veritasfi_tpu — a TPU-native multi-tiered RAG framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
simplew4y/VeritasFi (an adaptable, multi-tiered RAG framework for
multi-modal financial question answering).

Layer map (mirrors the reference's capability surface, not its code):

    ingest/    processed-PDF JSON contract -> CorpusIndex (arrays, not a doc DB)
    models/    Flax encoder (BGE-class) + decoder cross-encoder reranker
    ops/       jitted & Pallas retrieval kernels (MIPS top-k, rank-of, cosine)
    retrieval/ multi-path ensemble engine, BM25, memory bank, QA vector store
    rerank/    score fusion (rerank+time, sim dedup, bundle-capped select),
               continuous batcher
    serving/   ChatManager / ChatService equivalents, LLM protocol client,
               prompts, tools, SSE
    parallel/  mesh construction, corpus sharding, distributed top-k merge
    train/     LoRA fine-tune of the reranker (pjit data/tensor parallel)
    evals/     retrieval / reranker / e2e QA eval harnesses, stress tests
    utils/     profiler, logging, typed config
"""

__version__ = "0.1.0"
