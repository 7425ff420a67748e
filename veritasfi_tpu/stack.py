"""Composition root: build the full serving stack from one Config.

The reference wires RAGManager + FlagLLMReranker + ChatService ad-hoc in
each entry point (reference: experiments/e2e/qa_e2e_async.py:54-80,
vllmChatService.py:76-102); here one factory builds the whole stack —
engine, reranker behind the continuous batcher, memory bank, QA store,
tools, ChatService — so the server, CLI and eval harnesses share identical
construction.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Dict, Optional

from .config import Config
from .engine import RAGEngine
from .rerank.batcher import ContinuousBatcher
from .retrieval.memory_bank import MemoryBank
from .retrieval.qa_store import QAVectorStore
from .serving.chat_service import ChatService
from .serving.llm_client import FakeLLM, LLMClient
from .serving.prompts import CompanyProfile
from .serving.tools import FinnhubTools

logger = logging.getLogger(__name__)


def build_reranker(config: Config):
    """Reranker selection: local HF dir > LLM (gemma) preset > encoder-class
    preset > tiny test model. Random init when no checkpoint is present."""
    import jax.numpy as jnp

    name = config.rerank.model_name
    dtype = jnp.bfloat16
    if os.path.isdir(name):
        import json

        with open(os.path.join(name, "config.json")) as f:
            cfg = json.load(f)
        model_type = cfg.get("model_type", "")
        if model_type in ("gemma", "qwen2", "qwen3"):
            from .models.hf_loader import (_load_state_dict,
                                           decoder_arch_from_config,
                                           load_decoder_params)
            from .models.reranker import CrossEncoderReranker
            from .models.tokenizer import load_hf_tokenizer

            # map the checkpoint's real dims (like the encoder branch
            # below) — hardcoded preset defaults would SILENTLY truncate
            # a deeper variant to its first N layers
            arch = decoder_arch_from_config(cfg)
            params = load_decoder_params(_load_state_dict(name), arch)
            try:
                tokenizer = load_hf_tokenizer(name)
            except Exception:
                logger.warning("checkpoint %s has weights but no loadable "
                               "tokenizer; falling back to the hash "
                               "tokenizer (plumbing mode)", name,
                               exc_info=True)
                tokenizer = None
            return CrossEncoderReranker(
                arch=arch, params=params, tokenizer=tokenizer,
                dtype=dtype,
                query_max_length=config.rerank.query_max_length,
                passage_max_length=config.rerank.passage_max_length)
        from .models.encoder import EncoderArch
        from .models.encoder_reranker import (EncoderReranker,
                                              load_encoder_reranker_params)
        from .models.hf_loader import _load_state_dict
        from .models.tokenizer import load_hf_tokenizer

        arch = EncoderArch(
            vocab_size=cfg["vocab_size"], hidden=cfg["hidden_size"],
            layers=cfg["num_hidden_layers"],
            heads=cfg["num_attention_heads"],
            intermediate=cfg["intermediate_size"],
            max_positions=cfg["max_position_embeddings"],
            type_vocab=cfg.get("type_vocab_size", 1),
            pad_id=cfg.get("pad_token_id", 1),
            pos_offset=2 if "roberta" in cfg.get("model_type", "") else 0,
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5))
        params = load_encoder_reranker_params(_load_state_dict(name), arch)
        return EncoderReranker(
            arch=arch, params=params, tokenizer=load_hf_tokenizer(name),
            dtype=dtype,
            query_max_length=config.rerank.query_max_length,
            passage_max_length=config.rerank.passage_max_length)
    from .models.reranker import DECODER_PRESETS, CrossEncoderReranker
    from .models.encoder_reranker import (RERANKER_ENCODER_PRESETS,
                                          EncoderReranker)

    hf_aliases = {
        "BAAI/bge-reranker-v2-gemma": "gemma-2b",
        "BAAI/bge-reranker-base": "bge-reranker-base",
        "BAAI/bge-reranker-large": "bge-reranker-large",
    }
    name = hf_aliases.get(name, name)
    if name in DECODER_PRESETS:
        logger.warning("reranker '%s': random weights (no checkpoint)", name)
        return CrossEncoderReranker(
            preset=name, dtype=dtype,
            query_max_length=config.rerank.query_max_length,
            passage_max_length=config.rerank.passage_max_length)
    if name in RERANKER_ENCODER_PRESETS:
        logger.warning("reranker '%s': random weights (no checkpoint)", name)
        return EncoderReranker(
            preset=name, dtype=dtype,
            query_max_length=config.rerank.query_max_length,
            passage_max_length=config.rerank.passage_max_length)
    # bge-reranker-v2-gemma etc. map onto the gemma-2b architecture
    logger.warning("reranker '%s' unknown; using gemma-2b arch with random "
                   "weights", name)
    return CrossEncoderReranker(
        preset="gemma-2b", dtype=dtype,
        query_max_length=config.rerank.query_max_length,
        passage_max_length=config.rerank.passage_max_length)


@dataclass
class Stack:
    config: Config
    engine: RAGEngine
    reranker: object
    batcher: ContinuousBatcher
    chat_service: ChatService
    llm: object
    retrieval_batcher: object = None

    def scorer(self, pairs):
        rows = [self.reranker.encode_pair(q, p) for q, p in pairs]
        return self.batcher.score(rows, timeout=120)

    def fused_scorer(self, question, texts, emb):
        """Rerank scores + candidate similarity in one device dispatch
        (skips the batcher; the dispatch queue still serializes devices)."""
        if hasattr(self.reranker, "encode_pairs_cached"):
            rows = self.reranker.encode_pairs_cached(question, texts)
        else:
            rows = [self.reranker.encode_pair(question, t) for t in texts]
        return self.reranker.score_and_sim(rows, emb)

    def close(self) -> None:
        self.batcher.close()
        if self.retrieval_batcher is not None:
            self.retrieval_batcher.close()
        close = getattr(self.llm, "close", None)
        if close:
            close()


def build_stack(config: Optional[Config] = None,
                collections: Optional[Dict[str, int]] = None,
                llm=None, embed_fn=None, reranker=None,
                company: Optional[CompanyProfile] = None) -> Stack:
    config = config or Config()
    collections = collections if collections is not None else {
        config.collection: config.retrieval.k}

    engine = RAGEngine(config, embed_fn=embed_fn)
    retrievers = []
    for name, k in collections.items():
        try:
            engine.load_collection(name)
            retrievers.append(engine.create_retriever(k, name))
        except FileNotFoundError as exc:
            logger.warning("collection '%s' unavailable under %s: %s", name,
                           config.persist_directory, exc)

    reranker = reranker or build_reranker(config)
    batcher = ContinuousBatcher(reranker.score_tokens,
                                max_batch=max(config.rerank.batch_size * 4, 8),
                                max_pending=config.rerank.max_pending)

    if llm is None:
        if config.llm.base_url and "localhost:0" not in config.llm.base_url:
            llm = LLMClient(config.llm.base_url, config.llm.api_key)
        else:
            llm = FakeLLM()

    mb = config.memory_bank
    memory_bank = (MemoryBank(mb.frequent_qa_path or None,
                              mb.qa_table_path or None,
                              company_pattern=mb.company_pattern)
                   if (mb.frequent_qa_path or mb.qa_table_path) else None)
    qa_store = (QAVectorStore(engine.embed_fn, persist_directory=mb.qa_vector_dir)
                if mb.qa_vector_dir else None)
    tools = (FinnhubTools(config.serving.finnhub_api_key)
             if config.serving.finnhub_api_key else None)

    retrieval_batcher = None
    if (config.serving.fused_serve and retrievers
            and config.rerank.max_candidates):
        try:
            from .retrieval.fused_serve import FusedServePath
            from .serving.retrieval_batcher import RetrievalBatcher

            r0 = retrievers[0]
            serve_path = FusedServePath(
                r0.corpus, reranker, embed_fn=engine.embed_fn, bm25=r0.bm25,
                k=r0.faiss_k, ts_k=r0.faiss_ts_k, bm25_k=r0.bm25_k,
                enable_expand=r0.enable_expand, depth=r0.depth,
                expand_trigger=r0.expand_trigger,
                expand_accept=r0.expand_accept,
                expand_max_chunks=r0.expand_max_chunks,
                rerank_cap=config.rerank.max_candidates,
                chunk_topk=config.rerank.rerank_topk,
                sim_threshold=config.rerank.similar_threshold,
                # respect retrieval.corpus_dtype and SHARE the retriever's
                # device matrices — a second multi-GB copy would defeat the
                # bf16 mode's memory budget at 10M-row scale
                corpus_dtype=config.retrieval.corpus_dtype,
                device_emb=(r0.dense.corpus if r0.dense is not None
                            else None),
                device_ts_emb=(r0.ts_dense.corpus
                               if r0.ts_dense is not None else None),
                # retrieval.m3_fusion rides inside the serve program here
                # (zero extra readbacks) — the classic path's separate
                # gather+score dispatch costs ~30 ms of relay round-trip
                m3_scorer=getattr(r0, "m3_scorer", None),
                m3_pool=config.retrieval.m3_candidate_pool)
            retrieval_batcher = RetrievalBatcher(serve_path)
            logger.info("fused single-readback serve path enabled "
                        "(cap=%d)", config.rerank.max_candidates)
        except Exception:
            logger.warning("fused serve path unavailable; using the classic "
                           "two-dispatch path", exc_info=True)

    stack = Stack(config=config, engine=engine, reranker=reranker,
                  batcher=batcher, chat_service=None, llm=llm,
                  retrieval_batcher=retrieval_batcher)
    stack.chat_service = ChatService(
        llm, config.llm.model_name, retrievers, stack.scorer,
        fused_scorer=stack.fused_scorer,
        memory_bank=memory_bank, qa_store=qa_store,
        rerank_topk=config.rerank.rerank_topk,
        rerank_max_candidates=config.rerank.max_candidates,
        session_timeout=config.serving.session_timeout_s,
        company=company or CompanyProfile(), tools=tools,
        seq_threshold=mb.seq_threshold, bm25_threshold=mb.bm25_threshold,
        db_top_n=mb.db_top_n, table_top_n=mb.table_top_n,
        vector_top_n=mb.vector_top_n,
        retrieval_batcher=retrieval_batcher,
        history_limit=config.serving.history_limit,
        num_hypo=config.serving.num_hypo,
        temperature=config.llm.temperature, top_p=config.llm.top_p,
        hyde_timeout_s=config.llm.hyde_timeout_s,
        chat_timeout_s=config.llm.chat_timeout_s,
        max_retry=config.llm.max_retry,
        similar_threshold=config.rerank.similar_threshold,
        min_bundle_chars=config.rerank.min_bundle_chars)
    return stack
