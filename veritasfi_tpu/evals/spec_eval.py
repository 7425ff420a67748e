"""In-program prompt-lookup speculation: measured A/B on a quoting workload.

Round 3 REMOVED host-side prompt-lookup speculation after measuring a loss
in every configuration, even at 100% draft acceptance (SPEC_DECODE_r03.json):
its verify step was a separate dispatch+readback, while the plain chunked
scan already amortizes one readback over chunk x occupancy tokens — the
loss was structural on this transport, not an acceptance problem.

Round 5 re-architects the idea so that structure no longer applies
(serving/generation_server.py ``spec_lookup_k``): drafting (2-gram lookup
into the slot's device-resident prompt tokens) AND verification (one
[S, k+1] forward through the per-row multi-token cache path) both live
INSIDE the scan step, so a chunk is still one dispatch + one readback but
emits between ``chunk`` and ``chunk*(k+1)`` tokens per slot. At small
batch the [S, k+1] forward is memory-bound like [S, 1] — it reads the
same weights — so accepted tokens are nearly free.

Speculation only pays when the model actually QUOTES its context — the
RAG answer-with-citations shape. Random weights cannot quote, so this
eval first TRAINS a tiny copy-LM (2-layer decoder; the classic
induction-head task ``ctx SEP -> ctx``) and then measures tokens/s
through the GenerationServer on prompts the model reproduces verbatim,
in INTERLEAVED off/on rounds (ambient relay RTT drifts minute-to-minute;
unpaired runs lie — the BF16_AB_r04 protocol). Greedy outputs must be
identical in both arms; keep-or-delete bar: a measured win on this
workload, plus no regression on a non-quoting workload.

Run: python -m veritasfi_tpu.evals.spec_eval [--out F]
"""

from __future__ import annotations

import json
import statistics
import time
from typing import Optional, Tuple

import numpy as np

SEP = 3          # separator token (vocab ids: 0 pad, 1 bos, 2 eos-ish, 3 sep)
TOK_LO, TOK_HI = 8, 500


def train_copy_lm(steps: int = 300, ctx_len: int = 48, batch: int = 32,
                  seed: int = 0, learning_rate: float = 3e-3,
                  arch_name: str = "tiny-test"
                  ) -> Tuple[object, object, dict]:
    """Train FlaxDecoderLM on the copy task: [ctx] SEP [ctx].
    Returns (module, params, diagnostics). ``arch_name='gemma-mini'``
    (8L/1024H) gives the A/B a forward with real cost — at tiny-test
    shapes both arms are dispatch-bound and the comparison says nothing.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.reranker import DECODER_PRESETS, FlaxDecoderLM

    arch = DECODER_PRESETS[arch_name]
    module = FlaxDecoderLM(arch)
    rng = np.random.default_rng(seed)

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
        return (nll * copy_region).sum() / copy_region.sum() / ids.shape[0]

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
    logits = module.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    pred = np.asarray(jnp.argmax(logits[:, :-1], axis=-1))
    tgt = ids[:, 1:]
    region = np.arange(tgt.shape[1]) >= ctx_len
    acc = float((pred[:, region] == tgt[:, region]).mean())
    return module, params, {"steps": steps,
                            "first_loss": round(losses[0], 4),
                            "final_loss": round(losses[-1], 4),
                            "copy_accuracy": round(acc, 4)}


def _quoting_prompts(n: int, ctx_len: int, rng) -> list:
    return [rng.integers(TOK_LO, TOK_HI, size=(ctx_len,)).tolist() + [SEP]
            for _ in range(n)]


def measure(module, params, *, ctx_len: int = 48, n_requests: int = 8,
            slots: int = 8, max_new: int = 40, k: int = 4,
            rounds: int = 3, chunk_off: int = 16, chunk_on: int = 8,
            seed: int = 7) -> dict:
    """Tokens/s through the GenerationServer on quoting prompts, spec off
    vs on: interleaved rounds over the SAME prompts and trained weights,
    greedy, outputs asserted identical."""
    from concurrent.futures import ThreadPoolExecutor

    from ..serving.generation_server import GenerationServer

    rng = np.random.default_rng(seed)
    prompts = _quoting_prompts(n_requests, ctx_len, rng)

    def build(spec_k: int, chunk: int) -> "GenerationServer":
        server = GenerationServer(module, params, slots=slots, window=256,
                                  chunk=chunk, max_prompt_len=128,
                                  prefix_cache=False,
                                  spec_lookup_k=spec_k)
        server.generate(prompts[0], max_new_tokens=4, eos_id=-1,
                        temperature=0.0)   # warm/compile
        return server

    def run_round(server) -> Tuple[float, list]:
        outs = [None] * len(prompts)

        def run(i):
            outs[i] = server.generate(prompts[i], max_new_tokens=max_new,
                                      eos_id=-1, temperature=0.0)

        t0 = time.perf_counter()
        with ThreadPoolExecutor(n_requests) as ex:
            list(ex.map(run, range(n_requests)))
        wall = time.perf_counter() - t0
        return sum(len(o) for o in outs) / wall, outs

    srv_off = build(0, chunk_off)
    srv_on = build(k, chunk_on)
    off_ts, on_ts = [], []
    match_counts = []
    ref_out = None
    try:
        for _ in range(rounds):
            ts, outs_off = run_round(srv_off)
            off_ts.append(ts)
            ts, outs_on = run_round(srv_on)
            on_ts.append(ts)
            matches = sum(a == b for a, b in zip(outs_off, outs_on))
            match_counts.append((matches, len(outs_off)))
            ref_out = outs_on
        st = srv_on.stats
        emitted_per_step = (st["spec_emitted"] / st["spec_steps"]
                            if st["spec_steps"] else 0.0)
    finally:
        srv_off.close()
        srv_on.close()
    del ref_out
    return {
        "off_tok_s_rounds": [round(t, 1) for t in off_ts],
        "on_tok_s_rounds": [round(t, 1) for t in on_ts],
        "off_tok_s": round(statistics.median(off_ts), 1),
        "on_tok_s": round(statistics.median(on_ts), 1),
        "speedup": round(statistics.median(on_ts)
                         / statistics.median(off_ts), 2),
        "emitted_per_verify_step": round(emitted_per_step, 2),
        "speculative_k": k, "chunk_off": chunk_off, "chunk_on": chunk_on,
        # exact greedy equality holds in exact arithmetic (unit tests pin
        # it in fp32); on bf16 real-valued models a near-tie argmax can
        # differ between the [S,1] and [S,k+1] forwards — report the rate
        "output_match": [f"{m}/{n}" for m, n in match_counts],
    }


def measure_nonquoting(module, params, *, n_requests: int = 8,
                       slots: int = 8, max_new: int = 32, k: int = 4,
                       seed: int = 11) -> dict:
    """Regression guard: the same A/B on prompts the model does NOT quote
    (random tokens, no SEP pattern) — speculation should cost ~nothing
    (rejected drafts ride the same program), not regress throughput."""
    rng = np.random.default_rng(seed)
    prompts = [rng.integers(TOK_LO, TOK_HI, size=(24,)).tolist()
               for _ in range(n_requests)]
    from concurrent.futures import ThreadPoolExecutor

    from ..serving.generation_server import GenerationServer

    def run(spec_k: int, chunk: int) -> float:
        server = GenerationServer(module, params, slots=slots, window=256,
                                  chunk=chunk, max_prompt_len=128,
                                  prefix_cache=False,
                                  spec_lookup_k=spec_k)
        try:
            server.generate(prompts[0], max_new_tokens=4, eos_id=-1,
                            temperature=0.0)
            t0 = time.perf_counter()
            with ThreadPoolExecutor(n_requests) as ex:
                outs = list(ex.map(
                    lambda p: server.generate(p, max_new_tokens=max_new,
                                              eos_id=-1, temperature=0.0),
                    prompts))
            return sum(len(o) for o in outs) / (time.perf_counter() - t0)
        finally:
            server.close()

    off = run(0, 16)
    on = run(k, 16)
    return {"off_tok_s": round(off, 1), "on_tok_s": round(on, 1),
            "ratio": round(on / off, 2)}


def main(argv: Optional[list] = None) -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--max-new", type=int, default=40)
    parser.add_argument("--k", type=int, default=4)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--arch", default="gemma-mini",
                        choices=["tiny-test", "gemma-mini"])
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)
    module, params, train_diag = train_copy_lm(steps=args.steps,
                                               arch_name=args.arch)
    train_diag["arch"] = args.arch
    result = measure(module, params, max_new=args.max_new, k=args.k,
                     rounds=args.rounds)
    result["nonquoting_guard"] = measure_nonquoting(module, params,
                                                    k=args.k)
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
