"""Convert HuggingFace BERT/XLM-R checkpoints to FlaxEncoder params.

Lets the framework load real BGE weights from a local checkpoint directory
(offline; this environment has no network egress). Accepts either a
state-dict mapping (str -> np.ndarray) or a local HF model directory.

The reference consumes these models through langchain's
HuggingFaceEmbeddings (reference: src/utils/ragManager.py:50); here the
weights are converted once into the Flax tree used by the jitted encoder.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from .encoder import EncoderArch


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_bert_params(
    state: Mapping[str, Any], arch: EncoderArch, prefix: str = ""
) -> Dict[str, Any]:
    """Map a (XLM-)BERT HF state dict onto the FlaxEncoder param tree."""

    def get(name: str) -> np.ndarray:
        for cand in (prefix + name, name, "bert." + name, "roberta." + name):
            if cand in state:
                return _np(state[cand])
        raise KeyError(f"missing weight: {name}")

    def dense(name: str) -> Dict[str, np.ndarray]:
        return {"kernel": get(f"{name}.weight").T, "bias": get(f"{name}.bias")}

    def ln(name: str) -> Dict[str, np.ndarray]:
        return {"scale": get(f"{name}.weight"), "bias": get(f"{name}.bias")}

    params: Dict[str, Any] = {
        "word_embeddings": {"embedding": get("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": get("embeddings.position_embeddings.weight")
        },
        "token_type_embeddings": {
            "embedding": get("embeddings.token_type_embeddings.weight")
        },
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(arch.layers):
        base = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{base}.attention.self.query"),
                "key": dense(f"{base}.attention.self.key"),
                "value": dense(f"{base}.attention.self.value"),
                "out": dense(f"{base}.attention.output.dense"),
            },
            "attention_ln": ln(f"{base}.attention.output.LayerNorm"),
            "intermediate": dense(f"{base}.intermediate.dense"),
            "output": dense(f"{base}.output.dense"),
            "output_ln": ln(f"{base}.output.LayerNorm"),
        }
    return {"params": params}


def load_encoder_from_dir(path: str, arch: Optional[EncoderArch] = None,
                          max_length: Optional[int] = None,
                          dtype=None):
    """Build a TextEncoder from a local HF checkpoint directory.
    ``max_length``/``dtype`` mirror the preset path's config knobs (they
    were silently ignored for local checkpoints before)."""
    import json
    import os

    from .encoder import TextEncoder
    from .tokenizer import load_hf_tokenizer

    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    if arch is None:
        arch = EncoderArch(
            vocab_size=cfg["vocab_size"],
            hidden=cfg["hidden_size"],
            layers=cfg["num_hidden_layers"],
            heads=cfg["num_attention_heads"],
            intermediate=cfg["intermediate_size"],
            max_positions=cfg["max_position_embeddings"],
            type_vocab=cfg.get("type_vocab_size", 2),
            pad_id=cfg.get("pad_token_id", 0),
            pos_offset=2 if cfg.get("model_type") in ("roberta", "xlm-roberta") else 0,
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
        )
    state = _load_state_dict(path)
    params = load_bert_params(state, arch)
    tokenizer = load_hf_tokenizer(path)
    kw = {}
    if max_length is not None:
        kw["max_length"] = max_length
    if dtype is not None:
        kw["dtype"] = dtype
    return TextEncoder(arch=arch, params=params, tokenizer=tokenizer, **kw)


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import json
    import os

    st_path = os.path.join(path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    # sharded safetensors (model.safetensors.index.json + model-0000N-of-M)
    # — how real gemma-2b / bge-reranker-v2-gemma checkpoints ship
    idx_path = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(idx_path):
        from safetensors.numpy import load_file

        with open(idx_path) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
        state: Dict[str, np.ndarray] = {}
        for shard in shards:
            state.update(load_file(os.path.join(path, shard)))
        return state
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: _np(v) for k, v in sd.items()}
    # sharded torch checkpoints (pytorch_model.bin.index.json)
    tidx = os.path.join(path, "pytorch_model.bin.index.json")
    if os.path.exists(tidx):
        import torch

        with open(tidx) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
        state = {}
        for shard in shards:
            sd = torch.load(os.path.join(path, shard), map_location="cpu",
                            weights_only=True)
            state.update({k: _np(v) for k, v in sd.items()})
        return state
    raise FileNotFoundError(f"no model weights found under {path}")


def load_gemma_params(state: Mapping[str, Any], arch) -> Dict[str, Any]:
    """Map a HF Gemma(-family) causal-LM state dict onto FlaxDecoderLM.

    Covers bge-reranker-v2-gemma (google/gemma-2b backbone); the LM head is
    tied to the embedding, as in Gemma."""

    def get(name: str) -> np.ndarray:
        for cand in (name, "model." + name):
            if cand in state:
                return _np(state[cand])
        raise KeyError(f"missing weight: {name}")

    def lin(name: str) -> Dict[str, np.ndarray]:
        return {"kernel": get(f"{name}.weight").T}

    def attn_lin(name: str) -> Dict[str, Any]:
        # with LoRA enabled, the frozen base kernel nests under "base"
        if getattr(arch, "lora_rank", 0) > 0:
            return {"base": lin(name)}
        return lin(name)

    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": get("embed_tokens.weight")},
        # our RMSNorm stores w with effective scale (1 + w), matching Gemma
        "final_ln": {"weight": get("norm.weight")},
    }
    for i in range(arch.layers):
        base = f"layers.{i}"
        params[f"layer_{i}"] = {
            "attn": {
                "q_proj": attn_lin(f"{base}.self_attn.q_proj"),
                "k_proj": attn_lin(f"{base}.self_attn.k_proj"),
                "v_proj": attn_lin(f"{base}.self_attn.v_proj"),
                "o_proj": attn_lin(f"{base}.self_attn.o_proj"),
            },
            "input_ln": {"weight": get(f"{base}.input_layernorm.weight")},
            "post_ln": {"weight": get(f"{base}.post_attention_layernorm.weight")},
            "gate_proj": lin(f"{base}.mlp.gate_proj"),
            "up_proj": lin(f"{base}.mlp.up_proj"),
            "down_proj": lin(f"{base}.mlp.down_proj"),
        }
    return {"params": params}
