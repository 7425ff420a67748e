"""Typed configuration for the whole framework.

The reference uses a flat, unvalidated YAML loaded ad-hoc per entry point
(reference: config/example.yaml:1-15, src/load_data.py:19-21). Here a single
typed config spans ingest, engine, rerank, serving and eval, with YAML
round-tripping and validation. Unknown keys are rejected so config drift is
caught early.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import yaml


@dataclass
class EncoderConfig:
    """Embedding model (reference: BGE-M3 via HuggingFaceEmbeddings,
    src/utils/ragManager.py:50)."""

    model_name: str = "bge-small-en"   # preset name or HF path
    max_length: int = 512
    pooling: str = "cls"               # cls | mean
    dtype: str = "bfloat16"            # compute dtype on TPU
    batch_size: int = 256              # bulk-embed batch at ingest


@dataclass
class RetrievalConfig:
    """Multi-path engine knobs (reference: src/utils/ensembleRetriever.py)."""

    k: int = 10                  # default per-path top-k
    faiss_k: Optional[int] = None
    bm25_k: Optional[int] = None
    faiss_ts_k: Optional[int] = None
    depth: int = 2048            # dense search depth (ensembleRetriever.py:66)
    enable_expand: bool = False
    expand_trigger: float = 0.72   # ensembleRetriever.py:86
    expand_accept: float = 0.66    # ensembleRetriever.py:93,102
    expand_max_chunks: int = 4     # ensembleRetriever.py:89
    max_queries: int = 4         # 1 original + up to 3 HyDE rewrites
    native_bm25: bool = True     # prefer the C++ BM25 engine when built
    # Storage dtype of the content embedding matrix on device.
    # "float32" = exact FAISS parity (default). "bfloat16" = half the HBM
    # footprint/traffic; dense search then routes through the fused Pallas
    # MIPS kernel on real TPUs (ops/pallas_mips.py) — the BASELINE config
    # #5 (10M-chunk single-chip) storage mode. Scores stay exact f32
    # products of the bf16-rounded embeddings (see ops.topk.dense_topk_large).
    corpus_dtype: str = "float32"
    # Beyond-reference opt-in: candidate-stage fusion of the BGE-M3
    # sparse + ColBERT heads the reference computes and throws away
    # (models/m3_heads.py, retrieval/m3_scorer.py). Requires an M3-family
    # encoder (encoder.model_name "bge-m3" or a local BGE-M3 checkpoint);
    # when on, EnsembleRetriever output is stable-reordered by the fused
    # score. Default off = exact reference path ordering.
    m3_fusion: bool = False
    m3_weights: tuple = (0.4, 0.2, 0.4)   # dense / sparse / colbert
    m3_doc_max_length: int = 128          # per-chunk token budget on device
    # Fused-serve M3 pool: the serve program's fusion loop over-emits to
    # this many candidate rows before the M3 order picks the top
    # rerank.max_candidates — matches the classic "reorder everything,
    # then cap" whenever the pool holds every candidate. Grows the
    # in-program gather/score working set linearly; no extra dispatches.
    m3_candidate_pool: int = 128


@dataclass
class RerankConfig:
    """Cross-encoder rerank + fusion (reference: src/utils/vllmManager.py:430-483)."""

    model_name: str = "bge-reranker-v2-gemma"
    rerank_topk: int = 5           # config/example.yaml:10
    batch_size: int = 8            # vllmManager.py:451
    similar_threshold: float = 0.9  # vllmManager.py:43
    # Optional cap on candidates scored by the cross-encoder (retrieval
    # order, like BASELINE config #3's "top-50"). None = reference behavior
    # (every retrieved chunk is scored, vllmManager.py:436).
    max_candidates: Optional[int] = None
    query_max_length: int = 512    # train_bge_rr.sh:20
    passage_max_length: int = 1024  # train_bge_rr.sh:21
    min_bundle_chars: int = 50     # vllmChatService.py:49
    max_pending: int = 256         # continuous batcher queue bound


@dataclass
class LLMConfig:
    """External chat-LLM endpoint (OpenAI protocol, as in the reference)."""

    base_url: str = "http://localhost:8000/v1"
    api_key: str = "EMPTY"
    model_name: str = "Qwen2.5-72B-Instruct-AWQ"
    temperature: float = 0.0       # vllmManager.py:137
    top_p: float = 0.8             # vllmManager.py:138
    hyde_timeout_s: float = 30.0   # vllmManager.py:273
    chat_timeout_s: float = 60.0   # vllmManager.py:605
    max_retry: int = 3             # vllmManager.py:127


@dataclass
class MemoryBankConfig:
    """High-frequency QA memory bank (reference: src/utils/frequentQA.py)."""

    frequent_qa_path: str = ""
    qa_table_path: str = ""
    qa_vector_dir: str = ""
    seq_threshold: float = 0.55    # frequentQA.py:132
    bm25_threshold: float = 3.0    # frequentQA.py:162
    company_pattern: str = r"(?i)zeekr(?:'s)?"  # frequentQA.py:14
    db_top_n: int = 2              # vllmChatService.py:156-161
    table_top_n: int = 3           # vllmChatService.py:204-209
    vector_top_n: int = 2          # vllmChatService.py:379


@dataclass
class ServingConfig:
    session_timeout_s: int = 1800  # vllmChatService.py:76
    history_limit: int = 20        # vllmManager.py:25
    num_hypo: int = 3              # vllmManager.py:240
    bearer_token: str = ""
    finnhub_api_key: str = ""
    # Single-readback fused retrieve+rerank path for the async/stream
    # answer legs, wave-batched across sessions (retrieval_batcher.py).
    # Requires rerank.max_candidates (the device program's candidate cap);
    # falls back to the classic two-dispatch path when off or unavailable.
    fused_serve: bool = True
    # Host allocator hygiene (utils/allocator.py): glibc arena retention
    # grows a long-running server's RSS unboundedly (SOAK_r04 measured
    # ~0.65 MB/s with Python retention bounded). arena_max caps malloc
    # arenas at startup (0 = leave the glibc default); malloc_trim_s runs
    # a periodic trim thread returning freed pages to the kernel
    # (0 = disabled).
    malloc_arena_max: int = 2
    malloc_trim_s: float = 60.0
    # RSS watermark (MB, 0 = off): /v1/health reports status
    # "rss_over_limit" and the GC loop logs a warning past it. SOAK_r05's
    # leak_localization measured ~17 KB of LIVE native memory accrued per
    # request inside the device-client path — python retention is
    # GC-bounded and the arena-cap/malloc_trim hygiene measurably did
    # nothing — so long-lived deployments must watch RSS and recycle
    # workers until the platform client is fixed.
    rss_limit_mb: int = 0


@dataclass
class MeshConfig:
    """Device mesh for ICI/DCN scale-out (no reference counterpart; the
    reference's only parallelism is per-GPU process pools)."""

    data_axis: str = "data"
    corpus_axis: str = "corpus"
    model_axis: str = "model"
    # >1: RAGEngine.create_retriever shards the corpus over the first N
    # devices (ICI top-k merge, bit-identical to single-chip); callers
    # needing DCN x ICI tuple axes pass an explicit mesh instead
    corpus_shards: int = 1


@dataclass
class Config:
    persist_directory: str = "./index"
    collection: str = "zeekr"
    log_level: str = "INFO"
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    rerank: RerankConfig = field(default_factory=RerankConfig)
    llm: LLMConfig = field(default_factory=LLMConfig)
    memory_bank: MemoryBankConfig = field(default_factory=MemoryBankConfig)
    serving: ServingConfig = field(default_factory=ServingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # ------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        return _build(cls, d, path="config")

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        # Accept the reference's flat YAML keys for drop-in compatibility
        # (config/example.yaml:1-15).
        raw = _lift_reference_keys(raw)
        return cls.from_dict(raw)


# Mapping from the reference's flat YAML keys to nested typed fields.
_REFERENCE_KEYS = {
    "embeddings_model_name": ("encoder", "model_name"),
    "llm_model_name": ("llm", "model_name"),
    "llm_base_url": ("llm", "base_url"),
    "llm_api_key": ("llm", "api_key"),
    "rerank_model": ("rerank", "model_name"),
    "rerank_topk": ("rerank", "rerank_topk"),
    "frequent_qa_directory": ("memory_bank", "frequent_qa_path"),
    "qa_table_directory": ("memory_bank", "qa_table_path"),
    "qa_table_persist_directory": ("memory_bank", "qa_vector_dir"),
}


def _lift_reference_keys(raw: Dict[str, Any]) -> Dict[str, Any]:
    # two passes so a flat reference key and its nested section can
    # coexist regardless of YAML key order (a single pass either dropped
    # the lifted key when the nested mapping came later, or mutated the
    # caller's nested dict). The nested form wins for the same field.
    out: Dict[str, Any] = {}
    for key, value in raw.items():
        if key not in _REFERENCE_KEYS:
            out[key] = dict(value) if isinstance(value, dict) else value
    for key, value in raw.items():
        if key in _REFERENCE_KEYS:
            section, field_name = _REFERENCE_KEYS[key]
            out.setdefault(section, {}).setdefault(field_name, value)
    return out


def _build(cls, d: Dict[str, Any], path: str):
    if not dataclasses.is_dataclass(cls):
        return d
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in d.items():
        if key not in fields:
            raise ValueError(f"Unknown config key {path}.{key}")
        f = fields[key]
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, str) and f.type in _NESTED
        ):
            sub_cls = _NESTED[f.type] if isinstance(f.type, str) else f.type
            if not isinstance(value, dict):
                raise ValueError(f"Config key {path}.{key} must be a mapping")
            kwargs[key] = _build(sub_cls, value, f"{path}.{key}")
        else:
            # YAML/JSON have no tuples; tuple-defaulted fields (e.g.
            # retrieval.m3_weights) round-trip as lists — coerce back so
            # save->load is identity
            if isinstance(f.default, tuple) and isinstance(value, list):
                value = tuple(value)
            kwargs[key] = value
    return cls(**kwargs)


_NESTED = {
    "EncoderConfig": EncoderConfig,
    "RetrievalConfig": RetrievalConfig,
    "RerankConfig": RerankConfig,
    "LLMConfig": LLMConfig,
    "MemoryBankConfig": MemoryBankConfig,
    "ServingConfig": ServingConfig,
    "MeshConfig": MeshConfig,
}


def load_config(path: Optional[str] = None) -> Config:
    """Load config from ``path`` or the ``CONFIG_PATH`` env var, else defaults.

    (env override mirrors reference faissRetriever.py:43.)
    """
    path = path or os.getenv("CONFIG_PATH")
    if not path:
        return Config()
    if not os.path.exists(path):
        # a typo'd --config silently serving all-defaults (wrong index
        # dir, empty bearer token, ...) is far worse than failing fast
        raise FileNotFoundError(f"config file not found: {path!r}")
    return Config.load(path)
