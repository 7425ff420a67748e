"""In-program prompt-lookup speculation: exactness is unconditional.

The speculative decode path (generation_server.py::_decode_spec_impl)
accepts draft tokens only where they equal the model's own greedy chain,
so its emitted stream must be IDENTICAL to the plain server's for any
weights — random weights (everything rejected), a trained copy-LM
(long accepted runs), ring wrap (rejected writes restored over
still-visible keys), and eos arriving inside an accepted draft."""

from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

import jax.numpy as jnp

from veritasfi_tpu.models.reranker import CrossEncoderReranker
from veritasfi_tpu.serving.generation_server import GenerationServer

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def decoder():
    return CrossEncoderReranker(preset="tiny-test", dtype=jnp.float32)


@pytest.fixture(scope="module")
def copy_lm():
    from veritasfi_tpu.evals.spec_eval import train_copy_lm

    module, params, diag = train_copy_lm(steps=350, ctx_len=24, batch=32)
    assert diag["copy_accuracy"] > 0.9, diag
    return module, params


def run_server(module, params, rows, max_new, *, spec_k, window=128,
               chunk=4, eos=-1, temperature=None):
    server = GenerationServer(module, params, slots=2, window=window,
                              chunk=chunk, max_prompt_len=64,
                              cache_dtype=jnp.float32, prefix_cache=False,
                              spec_lookup_k=spec_k)
    try:
        with ThreadPoolExecutor(len(rows)) as ex:
            futs = [ex.submit(server.generate, r, max_new, eos,
                              temperature) for r in rows]
            out = [f.result(180) for f in futs]
        return out, dict(server.stats)
    finally:
        server.close()


def test_random_weights_all_rejected_matches_plain(decoder):
    """Random weights cannot quote: drafts reject, output must still be
    the exact plain greedy stream (3 requests through 2 slots)."""
    rr = decoder
    rows = [rr._encode_raw(f"question {i} about metric value")
            for i in range(3)]
    plain, _ = run_server(rr.module, rr.params, rows, 12, spec_k=0)
    spec, _ = run_server(rr.module, rr.params, rows, 12, spec_k=4)
    assert spec == plain, (spec, plain)


def test_quoting_accepts_and_matches(copy_lm):
    """The trained copy-LM quotes its prompt, so drafts accept in runs:
    emitted-per-verify-step must exceed 1 by a clear margin AND the
    stream must equal the plain server's token-for-token."""
    from veritasfi_tpu.evals.spec_eval import SEP, TOK_HI, TOK_LO

    module, params = copy_lm
    rng = np.random.default_rng(5)
    rows = [rng.integers(TOK_LO, TOK_HI, size=(24,)).tolist() + [SEP]
            for _ in range(3)]
    plain, _ = run_server(module, params, rows, 20, spec_k=0)
    spec, stats = run_server(module, params, rows, 20, spec_k=4)
    assert spec == plain, (spec, plain)
    assert stats["spec_steps"] > 0
    assert stats["spec_emitted"] / stats["spec_steps"] > 1.5, stats


def test_ring_wrap_falls_back_to_plain(decoder):
    """Generation long enough to wrap a small ring: the [S, k+1] block
    forward would overwrite still-visible old keys (and the write-
    causality mask hides those slots wholesale), so the host wrap-gate
    must route such chunks through the PLAIN program — the stream must
    equal the plain server's and the fallback must actually fire."""
    rr = decoder
    rows = [rr._encode_raw("alpha beta gamma delta epsilon zeta")[:16]]
    plain, _ = run_server(rr.module, rr.params, rows, 40, spec_k=0,
                          window=32)
    spec, stats = run_server(rr.module, rr.params, rows, 40, spec_k=4,
                             window=32)
    assert spec == plain, (spec, plain)
    assert stats["spec_fallback_chunks"] > 0, stats


def test_wrap_gate_reopens_after_slot_churn(copy_lm):
    """A wrapping tenancy closes the gate (prev rows go stale through the
    plain-decode chunks); after that slot finishes, a fresh quoting
    request must speculate again with a refreshed prev — stream equal to
    plain, and accepted runs on the second request prove the gate
    reopened with correct (prev, tok) lookup state."""
    from veritasfi_tpu.evals.spec_eval import SEP, TOK_HI, TOK_LO

    module, params = copy_lm
    rng = np.random.default_rng(13)
    quote_row = rng.integers(TOK_LO, TOK_HI, size=(20,)).tolist() + [SEP]

    def run(spec_k):
        server = GenerationServer(module, params, slots=2, window=64,
                                  chunk=4, max_prompt_len=32,
                                  prefill_chunk=16,
                                  cache_dtype=jnp.float32,
                                  prefix_cache=False, spec_lookup_k=spec_k)
        try:
            # tenancy 1 wraps the 64-ring (hw = 21 + 48 > 64): gate closes
            first = server.generate(quote_row, 48, -1)
            spec_before = server.stats["spec_emitted"]
            # tenancy 2 (fresh hw) must reopen the gate and quote
            second = server.generate(quote_row, 16, -1)
            return first, second, dict(server.stats), spec_before
        finally:
            server.close()

    p1, p2, _, _ = run(0)
    s1, s2, stats, spec_before = run(4)
    assert s1 == p1, (s1, p1)
    assert s2 == p2, (s2, p2)
    assert stats["spec_fallback_chunks"] > 0, stats
    assert stats["spec_emitted"] > spec_before, \
        "second tenancy never speculated; gate failed to reopen"


def test_eos_inside_accepted_draft(copy_lm):
    """eos set to a token the model will quote mid-copy: the eos arrives
    INSIDE an accepted draft run and the stream must stop exactly where
    the plain server stops."""
    from veritasfi_tpu.evals.spec_eval import SEP

    module, params = copy_lm
    rng = np.random.default_rng(9)
    ctx = rng.integers(8, 500, size=(24,)).tolist()
    row = ctx + [SEP]
    eos = ctx[10]        # quoted ~11 tokens into the copy
    plain, _ = run_server(module, params, [row], 24, spec_k=0, eos=eos)
    spec, _ = run_server(module, params, [row], 24, spec_k=4, eos=eos)
    assert spec == plain, (spec, plain)
    assert len(plain[0]) < 24, "eos never hit; fixture broken"


def test_sampling_slot_unspeculated_but_reproducible(decoder):
    """A temperature>0 request decodes unspeculated inside the spec
    program; with the same seed the spec server must reproduce the plain
    server's sampled stream (both consume one rng split per step —
    sampling slots' streams depend only on the per-step key sequence)."""
    rr = decoder
    row = rr._encode_raw("sampled generation request")
    out_a, _ = run_server(rr.module, rr.params, [row], 10, spec_k=4,
                          temperature=0.9)
    out_b, _ = run_server(rr.module, rr.params, [row], 10, spec_k=4,
                          temperature=0.9)
    assert out_a == out_b
    assert len(out_a[0]) == 10
