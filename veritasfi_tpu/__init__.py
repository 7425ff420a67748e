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

_LAZY = {
    "Config": ("veritasfi_tpu.config", "Config"),
    "load_config": ("veritasfi_tpu.config", "load_config"),
    "RAGEngine": ("veritasfi_tpu.engine", "RAGEngine"),
    "build_stack": ("veritasfi_tpu.stack", "build_stack"),
    "CorpusIndex": ("veritasfi_tpu.ingest.corpus", "CorpusIndex"),
    "EnsembleRetriever": ("veritasfi_tpu.retrieval.ensemble",
                          "EnsembleRetriever"),
}


def __getattr__(name):
    """Lazy top-level API (keeps `import veritasfi_tpu` free of jax/flax
    import cost until a component is actually used)."""
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'veritasfi_tpu' has no attribute {name!r}")
