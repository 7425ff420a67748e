"""Prompt-lookup speculative decoding: measured win on a quoting workload.

The generation server's opt-in speculator (serving/generation_server.py,
vLLM's ngram-speculator design) drafts continuation tokens by n-gram
lookup into the prompt. On generic prompts it is a measured LOSS on this
relay (~1 accepted token/slot/step, round-2 notes) — it only pays when the
model actually QUOTES its context, which is exactly the RAG answer shape
(answers quoting retrieved filings).

Random weights cannot quote, so this eval first TRAINS a tiny copy-LM
(2-layer decoder; the classic induction-head task: ``ctx SEP -> ctx``) and
then measures tokens/s with speculation off vs on, plus the acceptance
rate, on prompts the model reproduces verbatim. This is the round-3
keep-or-delete evidence for the speculative path: a >=1.3x measured win on
its intended workload.

Run: python -m veritasfi_tpu.evals.spec_eval [--out F]
"""

from __future__ import annotations

import json
import time
from typing import Optional, Tuple

import numpy as np

SEP = 3          # separator token (vocab ids: 0 pad, 1 bos, 2 eos-ish, 3 sep)
TOK_LO, TOK_HI = 8, 500


def train_copy_lm(steps: int = 300, ctx_len: int = 48, batch: int = 32,
                  seed: int = 0, learning_rate: float = 3e-3
                  ) -> Tuple[object, object, dict]:
    """Train FlaxDecoderLM (tiny) on the copy task: [ctx] SEP [ctx].
    Returns (module, params, diagnostics)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.reranker import DECODER_PRESETS, FlaxDecoderLM

    arch = DECODER_PRESETS["tiny-test"]
    module = FlaxDecoderLM(arch)
    rng = np.random.default_rng(seed)
    seq = 2 * ctx_len + 1

    ids0 = jnp.zeros((1, 8), jnp.int32)
    params = module.init(jax.random.PRNGKey(seed), ids0,
                         jnp.ones_like(ids0))
    opt = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, max(steps // 10, 1), steps))
    opt_state = opt.init(params)

    def loss_fn(p, ids, mask):
        logits = module.apply(p, ids, mask)
        # next-token CE on the copy region only (positions after SEP)
        targets = ids[:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None],
                                   axis=-1)[..., 0]
        pos = jnp.arange(targets.shape[1])
        copy_region = (pos >= ctx_len)[None, :]
        return (nll * copy_region).sum() / copy_region.sum() / ids.shape[0] \
            * 1.0

    @jax.jit
    def step(p, s, ids, mask):
        loss, grads = jax.value_and_grad(loss_fn)(p, ids, mask)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    def make_batch():
        ctx = rng.integers(TOK_LO, TOK_HI, size=(batch, ctx_len))
        rows = np.concatenate(
            [ctx, np.full((batch, 1), SEP), ctx], axis=1).astype(np.int32)
        return rows, np.ones_like(rows)

    losses = []
    for _ in range(steps):
        ids, mask = make_batch()
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(ids), jnp.asarray(mask))
        losses.append(float(loss))
    # copy accuracy: greedy argmax over a held-out batch's copy region
    ids, mask = make_batch()
    import jax.numpy as jnp2
    logits = module.apply(params, jnp2.asarray(ids), jnp2.asarray(mask))
    pred = np.asarray(jnp2.argmax(logits[:, :-1], axis=-1))
    tgt = ids[:, 1:]
    region = np.arange(tgt.shape[1]) >= ctx_len
    acc = float((pred[:, region] == tgt[:, region]).mean())
    return module, params, {"steps": steps,
                            "first_loss": round(losses[0], 4),
                            "final_loss": round(losses[-1], 4),
                            "copy_accuracy": round(acc, 4)}


def measure(module, params, *, ctx_len: int = 48, n_requests: int = 8,
            slots: int = 8, max_new: int = 40, k: int = 4,
            seed: int = 7) -> dict:
    """Tokens/s through the GenerationServer on quoting prompts, spec off
    vs on (same prompts, same trained weights, greedy)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..serving.generation_server import GenerationServer

    rng = np.random.default_rng(seed)
    prompts = []
    for _ in range(n_requests):
        ctx = rng.integers(TOK_LO, TOK_HI, size=(ctx_len,)).tolist()
        prompts.append(ctx + [SEP])

    def run_server(spec_k: int) -> dict:
        server = GenerationServer(module, params, slots=slots, window=256,
                                  chunk=16, max_prompt_len=128,
                                  speculative_k=spec_k)
        counts = []

        def run(p):
            n = 0
            for _ in server.stream(p, max_new_tokens=max_new, eos_id=-1,
                                   temperature=0.0):
                n += 1
            counts.append(n)

        server.generate(prompts[0], max_new_tokens=4, eos_id=-1,
                        temperature=0.0)   # warm/compile
        t0 = time.perf_counter()
        with ThreadPoolExecutor(n_requests) as ex:
            list(ex.map(run, prompts))
        wall = time.perf_counter() - t0
        out = {"tok_s": round(sum(counts) / wall, 1),
               "wall_s": round(wall, 3), "tokens": sum(counts)}
        if spec_k > 0:
            st = server.stats
            steps = max(st.get("spec_steps", 0), 1)
            out["spec_steps"] = st.get("spec_steps", 0)
            out["accepted_per_step"] = round(
                st.get("spec_accepted_tokens", 0) / steps, 2)
        return out

    off = run_server(0)
    on = run_server(k)
    return {"off": off, "on": on, "speculative_k": k,
            "speedup": round(on["tok_s"] / off["tok_s"], 2)}


def main(argv: Optional[list] = None) -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--max-new", type=int, default=40)
    parser.add_argument("--k", type=int, default=4)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)
    module, params, train_diag = train_copy_lm(steps=args.steps)
    result = measure(module, params, max_new=args.max_new, k=args.k)
    result["train"] = train_diag
    result["metric"] = "spec_decode_quoting_speedup"
    result["value"] = result["speedup"]
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
