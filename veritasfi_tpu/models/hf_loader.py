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


def load_decoder_params(state: Mapping[str, Any], arch) -> Dict[str, Any]:
    """Map a HF Gemma/Qwen2/Qwen3-family causal-LM state dict onto
    FlaxDecoderLM.

    Covers bge-reranker-v2-gemma (google/gemma-2b backbone) and the
    reference's Qwen line (chat: Qwen2.5-*, config/example.yaml:5;
    eval judge: Qwen3-Embedding-*, step3_mul.py:384). Driven by the arch
    flags: ``attn_bias`` (Qwen2 q/k/v biases), ``qk_norm`` (Qwen3 per-head
    norms) and ``tied_head`` (separate lm_head.weight when False)."""

    def get(name: str) -> np.ndarray:
        for cand in (name, "model." + name):
            if cand in state:
                return _np(state[cand])
        raise KeyError(f"missing weight: {name}")

    def lin(name: str, bias: bool = False) -> Dict[str, np.ndarray]:
        out = {"kernel": get(f"{name}.weight").T}
        if bias:
            out["bias"] = get(f"{name}.bias")
        return out

    def attn_lin(name: str, bias: bool = False) -> Dict[str, Any]:
        # with LoRA enabled, the frozen base kernel nests under "base"
        if getattr(arch, "lora_rank", 0) > 0:
            return {"base": lin(name, bias)}
        return lin(name, bias)

    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": get("embed_tokens.weight")},
        # our RMSNorm stores w; rms_plus_one applies Gemma's (1 + w)
        "final_ln": {"weight": get("norm.weight")},
    }
    if not getattr(arch, "tied_head", True):
        params["lm_head"] = get("lm_head.weight")
    qkv_bias = getattr(arch, "attn_bias", False)
    for i in range(arch.layers):
        base = f"layers.{i}"
        attn = {
            "q_proj": attn_lin(f"{base}.self_attn.q_proj", qkv_bias),
            "k_proj": attn_lin(f"{base}.self_attn.k_proj", qkv_bias),
            "v_proj": attn_lin(f"{base}.self_attn.v_proj", qkv_bias),
            "o_proj": attn_lin(f"{base}.self_attn.o_proj"),
        }
        if getattr(arch, "qk_norm", False):
            attn["q_norm"] = {"weight": get(f"{base}.self_attn.q_norm.weight")}
            attn["k_norm"] = {"weight": get(f"{base}.self_attn.k_norm.weight")}
        params[f"layer_{i}"] = {
            "attn": attn,
            "input_ln": {"weight": get(f"{base}.input_layernorm.weight")},
            "post_ln": {"weight": get(f"{base}.post_attention_layernorm.weight")},
            "gate_proj": lin(f"{base}.mlp.gate_proj"),
            "up_proj": lin(f"{base}.mlp.up_proj"),
            "down_proj": lin(f"{base}.mlp.down_proj"),
        }
    return {"params": params}


# back-compat name (pre-Qwen rounds exposed the Gemma-only mapper)
load_gemma_params = load_decoder_params


def decoder_arch_from_config(cfg: Mapping[str, Any]):
    """Build a DecoderArch from a HF config.json dict for the supported
    decoder families (gemma / qwen2 / qwen3). Mapping the checkpoint's real
    dims matters: preset defaults would silently truncate deeper variants."""
    from .reranker import DecoderArch

    model_type = cfg.get("model_type", "gemma")
    if model_type not in ("gemma", "qwen2", "qwen3"):
        raise ValueError(f"unsupported decoder family: {model_type!r}")
    gemma = model_type == "gemma"
    heads = cfg.get("num_attention_heads", 8 if gemma else 14)
    hidden = cfg.get("hidden_size", 2048)
    vocab = cfg.get("vocab_size", 256_000 if gemma else 151_936)

    def tok(key, default):
        v = cfg.get(key)
        if isinstance(v, (list, tuple)):    # HF allows eos_token_id lists
            v = v[0] if v else None
        if v is None or not (0 <= v < vocab):
            # out-of-vocab ids (e.g. Qwen's 151643 against a tiny test
            # vocab) would index the embedding out of bounds
            return default if 0 <= default < vocab else 0
        return v

    return DecoderArch(
        vocab_size=vocab,
        hidden=hidden,
        layers=cfg.get("num_hidden_layers", 18),
        heads=heads,
        kv_heads=cfg.get("num_key_value_heads", 1 if gemma else heads),
        head_dim=cfg.get("head_dim", 256 if gemma else hidden // heads),
        intermediate=cfg.get("intermediate_size", 16_384),
        rope_theta=cfg.get("rope_theta", 10_000.0 if gemma else 1e6),
        rms_eps=cfg.get("rms_norm_eps", 1e-6),
        pad_id=tok("pad_token_id", 0 if gemma else 151_643),
        bos_id=tok("bos_token_id", 2 if gemma else 151_643),
        eos_id=tok("eos_token_id", 1 if gemma else 151_645),
        embed_scale=gemma,
        rms_plus_one=gemma,
        attn_bias=model_type == "qwen2",
        mlp_act="gelu" if gemma else "silu",
        tied_head=cfg.get("tie_word_embeddings", gemma),
        qk_norm=model_type == "qwen3",
        add_bos=gemma,
    )
