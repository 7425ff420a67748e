"""RAGEngine — index/collection management facade (L2).

Capability parity with the reference RAGManager singleton
(reference: src/utils/ragManager.py): owns the embedding model, creates
per-collection index pairs (content + title-summary), exposes a retriever
factory and document access, and supports eager ``collections={name: k}``
initialization populating ``_retrievers``.

TPU-native storage: a collection is a CorpusIndex directory (embedding
matrix shards + metadata arrays + text store) plus a BM25 directory — not a
Chroma database. Ingestion is a bulk batched encoder job; rebuilds are
explicit (the reference rm -rf's the persist dir, load_data.py:143-144).
"""

from __future__ import annotations

import logging
import os
import shutil
from typing import Dict, List, Optional


from .config import Config
from .ingest.contract import load_processed_dir
from .ingest.corpus import CorpusIndex, build_corpus_index
from .retrieval.bm25 import BM25Index
from .retrieval.ensemble import EnsembleRetriever
from .utils.profiler import profiler

logger = logging.getLogger(__name__)


class RAGEngine:
    def __init__(self, config: Optional[Config] = None, embed_fn=None,
                 collections: Optional[Dict[str, int]] = None) -> None:
        self.config = config or Config()
        if embed_fn is None:
            embed_fn = self._load_encoder()
        self.embed_fn = embed_fn
        self._collections: Dict[str, CorpusIndex] = {}
        self._bm25: Dict[str, BM25Index] = {}
        self._m3_scorers: Dict[str, object] = {}
        self._retrievers: List[EnsembleRetriever] = []
        if collections:
            for name, top_k in collections.items():
                self.load_collection(name)
                self._retrievers.append(self.create_retriever(top_k, name))

    # ------------------------------------------------------------------
    def _load_encoder(self):
        """Encoder selection: local HF checkpoint dir > named preset with
        random init > lexical hash embedder."""
        name = self.config.encoder.model_name
        if os.path.isdir(name):
            import jax.numpy as jnp

            from .models.hf_loader import load_encoder_from_dir

            dtype = (jnp.bfloat16 if self.config.encoder.dtype == "bfloat16"
                     else jnp.float32)
            return load_encoder_from_dir(
                name, max_length=self.config.encoder.max_length,
                dtype=dtype).encode
        from .models.encoder import ENCODER_PRESETS, TextEncoder

        # map HF-style names onto architecture presets
        hf_aliases = {
            "BAAI/bge-m3": "bge-m3",
            "BAAI/bge-small-en-v1.5": "bge-small-en",
            "BAAI/bge-base-en-v1.5": "bge-base-en",
            "BAAI/bge-large-en-v1.5": "bge-large-en",
        }
        name = hf_aliases.get(name, name)
        if name in ENCODER_PRESETS:
            import jax.numpy as jnp

            dtype = (jnp.bfloat16 if self.config.encoder.dtype == "bfloat16"
                     else jnp.float32)
            enc = TextEncoder(preset=name, dtype=dtype,
                              max_length=self.config.encoder.max_length)
            logger.warning(
                "encoder '%s' initialized with random weights (no local "
                "checkpoint found) — retrieval quality is lexical-only", name)
            return enc.encode
        from .models.hash_embedder import HashEmbedder

        logger.warning("unknown encoder '%s'; using HashEmbedder", name)
        return HashEmbedder(dim=256).encode

    # -- paths -----------------------------------------------------------
    def _collection_dir(self, name: str) -> str:
        return os.path.join(self.config.persist_directory, "collections", name)

    def _bm25_dir(self, name: str) -> str:
        return os.path.join(self.config.persist_directory, "bm25_index", name)

    # -- ingestion ---------------------------------------------------------
    @profiler.profile_function(name="ingest")
    def create_collection(self, name: str, source_dir: str,
                          ignore_range: bool = False,
                          reset: bool = True) -> CorpusIndex:
        """Ingest a processed-PDF JSON dir into a persisted collection
        (ingest -> dedup/link -> bulk embed -> BM25 index; reference call
        stack: load_data.py:132-169)."""
        if reset:
            for d in (self._collection_dir(name), self._bm25_dir(name)):
                if os.path.exists(d):
                    shutil.rmtree(d)
        records, titles = load_processed_dir(source_dir,
                                             ignore_range=ignore_range)
        index = build_corpus_index(
            records, titles, embed_fn=self.embed_fn,
            batch_size=self.config.encoder.batch_size)
        index.save(self._collection_dir(name))
        bm25 = BM25Index.build(index.texts, index.doc_ids)
        bm25.save(self._bm25_dir(name))
        self._collections[name] = index
        # serve through the same engine a later load_collection would pick
        # (native when enabled/built) — the persisted format stays the
        # Python index, but the in-process object must not differ between
        # an ingest-then-serve session and a restart-then-serve session
        self._bm25[name] = self._make_bm25(name, index)
        logger.info("collection %s: %d chunks, %d titles, %d bundles",
                    name, index.num_chunks, len(index.title_texts),
                    len(index.bundle_names))
        self._log_device_memory(f"after ingest of {name}")
        return index

    def _log_device_memory(self, milestone: str) -> None:
        """Device-memory snapshot at load milestones (the reference logs
        torch.cuda.max_memory_allocated at the same points,
        ragManager.py:53,85)."""
        try:
            stats = profiler.device_memory_stats()
            for device, s in stats.items():
                logger.info("%s: %s bytes_in_use=%s peak=%s", milestone,
                            device, s.get("bytes_in_use"),
                            s.get("peak_bytes_in_use"))
        except Exception:
            pass

    def load_collection(self, name: str) -> CorpusIndex:
        if name not in self._collections:
            index = CorpusIndex.load(self._collection_dir(name))
            # build BM25 BEFORE registering: a failure here must not leave
            # a half-initialized collection that later loads would return
            # silently without its sparse path
            bm25 = self._make_bm25(name, index)
            self._collections[name] = index
            self._bm25[name] = bm25
        return self._collections[name]

    def _make_bm25(self, name: str, index: CorpusIndex):
        """Native C++ BM25 when available (identical scores to the Python
        engine — tests/test_native_bm25.py); persisted scipy index
        otherwise (or a fresh build when no persisted dir exists)."""
        if self.config.retrieval.native_bm25:
            try:
                from .native.bm25_native import NativeBM25, native_available

                if native_available():
                    return NativeBM25(index.texts, index.doc_ids)
            except Exception as e:
                logger.warning("native bm25 unavailable (%s); using Python "
                               "engine", e)
        bm25_dir = self._bm25_dir(name)
        if os.path.isdir(bm25_dir):
            return BM25Index.load(bm25_dir)
        return BM25Index.build(index.texts, index.doc_ids)

    def register_collection(self, name: str, index: CorpusIndex,
                            bm25: Optional[BM25Index] = None) -> None:
        """Register an in-memory collection (tests, synthetic benches)."""
        self._collections[name] = index
        if bm25 is not None:
            self._bm25[name] = bm25
        else:
            # never pair a NEW index with a STALE sparse engine from a
            # previous registration under the same name
            self._bm25.pop(name, None)

    # -- access (reference: ragManager.py:87-114) ---------------------------
    def get_collection(self, name: str) -> CorpusIndex:
        return self._collections[name]

    def get_collection_documents(self, name: str,
                                 ids: Optional[List[str]] = None):
        index = self._collections[name]
        if ids is None:
            rows = range(index.num_chunks)
        else:
            doc_index = index.doc_index()
            rows = [doc_index[d] for d in ids]
        return [{"page_content": index.texts[r], "metadata": index.metadata(r)}
                for r in rows]

    def create_retriever(self, k: int, name: str,
                         retriever_type: str = "ensemble",
                         **kwargs) -> EnsembleRetriever:
        index = self._collections[name]
        r = self.config.retrieval
        mesh = kwargs.get("mesh")
        if mesh is None and self.config.mesh.corpus_shards > 1:
            # config-driven scale-out: shard the corpus over the first
            # corpus_shards devices (BASELINE config #5 via Config alone;
            # callers wanting DCN x ICI tuple axes pass an explicit mesh)
            import jax

            from .parallel.mesh import make_mesh

            n = self.config.mesh.corpus_shards
            mesh = make_mesh([(self.config.mesh.corpus_axis, n)],
                             devices=jax.devices()[:n])
        m3_scorer = kwargs.get("m3_scorer")
        if m3_scorer is None and r.m3_fusion:
            m3_scorer = self._make_m3_scorer(name)
        return EnsembleRetriever(
            index, self.embed_fn, bm25=self._bm25.get(name), k=k,
            faiss_k=kwargs.get("faiss_k", r.faiss_k),
            bm25_k=kwargs.get("bm25_k", r.bm25_k),
            faiss_ts_k=kwargs.get("faiss_ts_k", r.faiss_ts_k),
            enable_expand=kwargs.get("enable_expand", r.enable_expand),
            corpus_dtype=kwargs.get("corpus_dtype", r.corpus_dtype),
            depth=r.depth,
            expand_trigger=r.expand_trigger,
            expand_accept=r.expand_accept,
            expand_max_chunks=r.expand_max_chunks,
            encoder=kwargs.get("encoder"),
            mesh=mesh,
            corpus_axis=kwargs.get("corpus_axis", self.config.mesh.corpus_axis),
            m3_scorer=m3_scorer,
        )

    def _make_m3_scorer(self, name: str):
        """Collection-resident M3 candidate scorer (retrieval.m3_fusion).

        Built once per collection and cached: encodes every chunk through
        the M3 multi-head encoder and ships the token representations to
        the device (the ingest-time half of the candidate-stage fusion).
        The M3 encoder resolves from encoder.model_name the same way
        _load_encoder does — preset name (e.g. "BAAI/bge-m3") with random
        or in-repo-trained weights; for a real local checkpoint, graft the
        head weights with models.m3_heads.load_m3_head_params and pass the
        scorer via create_retriever(m3_scorer=...)."""
        if name in self._m3_scorers:
            return self._m3_scorers[name]
        from .models.m3_heads import M3_PRESETS, M3Encoder
        from .retrieval.m3_scorer import M3CandidateScorer

        enc_name = self.config.encoder.model_name
        preset = {"BAAI/bge-m3": "bge-m3"}.get(enc_name, enc_name)
        if preset not in M3_PRESETS:
            logger.warning(
                "retrieval.m3_fusion is on but encoder '%s' has no M3 "
                "preset (known: %s); falling back to tiny-test heads — "
                "train them (train/m3.py) or load a checkpoint "
                "(models/m3_heads.py::load_m3_head_params) for real "
                "quality", enc_name, sorted(M3_PRESETS))
            preset = "tiny-test"
        m3_enc = M3Encoder(preset=preset,
                           max_length=self.config.encoder.max_length)
        r = self.config.retrieval
        scorer = M3CandidateScorer(
            m3_enc, self._collections[name].texts,
            doc_max_length=r.m3_doc_max_length,
            weights=tuple(r.m3_weights))
        self._m3_scorers[name] = scorer
        self._log_device_memory(f"m3_scorer[{name}]")
        return scorer
