"""GenerationServer: continuous batching must reproduce solo generations."""

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

import jax.numpy as jnp

from veritasfi_tpu.models.reranker import CrossEncoderReranker
from veritasfi_tpu.serving.generation_server import GenerationServer


@pytest.fixture(scope="module")
def decoder():
    rr = CrossEncoderReranker(preset="tiny-test", dtype=jnp.float32)
    return rr


def prompts(rr, n):
    return [rr._encode_raw(f"question {i} about metric {i % 3} value")
            for i in range(n)]


def solo_generate(rr, prompt, max_new=12):
    from veritasfi_tpu.models.generate import Generator

    gen = Generator(rr.module, rr.params, max_prompt_len=64,
                    max_new_tokens=max_new, cache_dtype=jnp.float32)
    return gen.generate_tokens([prompt], max_new_tokens=max_new,
                               eos_id=-1)[0]


def test_concurrent_matches_solo(decoder):
    rr = decoder
    rows = prompts(rr, 3)
    solo = [solo_generate(rr, r) for r in rows]
    server = GenerationServer(rr.module, rr.params, slots=3, window=128,
                              chunk=4, max_prompt_len=64,
                              cache_dtype=jnp.float32)
    try:
        with ThreadPoolExecutor(3) as ex:
            futs = [ex.submit(server.generate, r, 12, -1) for r in rows]
            got = [f.result(120) for f in futs]
        assert got == solo, (got, solo)
    finally:
        server.close()


def test_join_mid_flight(decoder):
    """A request admitted while another decodes must produce the same
    tokens as its solo run (slot isolation)."""
    rr = decoder
    rows = prompts(rr, 2)
    solo = [solo_generate(rr, r, max_new=16) for r in rows]
    server = GenerationServer(rr.module, rr.params, slots=2, window=128,
                              chunk=2, max_prompt_len=64,
                              cache_dtype=jnp.float32)
    try:
        req0 = server.submit(rows[0], 16, -1)
        # wait until request 0 produced its first token, then join
        req0.tokens.get(timeout=120)
        req1 = server.submit(rows[1], 16, -1)
        got1 = req1.result.result(120)
        got0_full = req0.result.result(120)
        assert got0_full == solo[0]
        assert got1 == solo[1]
    finally:
        server.close()


def test_streaming_order_and_eos(decoder):
    rr = decoder
    row = prompts(rr, 1)[0]
    solo = solo_generate(rr, row, max_new=10)
    server = GenerationServer(rr.module, rr.params, slots=2, window=128,
                              chunk=3, max_prompt_len=64,
                              cache_dtype=jnp.float32)
    try:
        streamed = list(server.stream(row, max_new_tokens=10, eos_id=-1))
        assert streamed == solo
        # eos stops generation without emitting the eos token itself
        eos_tok = solo[1]
        stopped = server.generate(row, max_new_tokens=10, eos_id=eos_tok)
        assert stopped == solo[: solo.index(eos_tok)]
    finally:
        server.close()


def test_slot_reuse_after_finish(decoder):
    """More requests than slots: later ones reuse freed slots cleanly."""
    rr = decoder
    rows = prompts(rr, 4)
    solo = [solo_generate(rr, r, max_new=8) for r in rows]
    server = GenerationServer(rr.module, rr.params, slots=2, window=128,
                              chunk=4, max_prompt_len=64,
                              cache_dtype=jnp.float32)
    try:
        with ThreadPoolExecutor(4) as ex:
            futs = [ex.submit(server.generate, r, 8, -1) for r in rows]
            got = [f.result(180) for f in futs]
        assert got == solo
    finally:
        server.close()


def test_chunked_prefill_matches_solo(decoder):
    """prefill_chunk smaller than the prompt: the host-chunked prefill
    (one compiled [1, C] program replayed) must reproduce greedy solo
    generation exactly."""
    rr = decoder
    rows = prompts(rr, 2)
    assert all(len(r) > 4 for r in rows)
    solo = [solo_generate(rr, r) for r in rows]
    server = GenerationServer(rr.module, rr.params, slots=2, window=128,
                              chunk=4, max_prompt_len=64, prefill_chunk=4,
                              cache_dtype=jnp.float32)
    try:
        got = [server.generate(r, 12, -1) for r in rows]
        assert got == solo, (got, solo)
    finally:
        server.close()


def test_per_slot_sampling_params(decoder):
    """A greedy (temperature=0) request must be unaffected by a sampling
    (temperature>0) request decoding in the neighbouring slot, and the
    sampling request must actually diverge from greedy."""
    rr = decoder
    rows = prompts(rr, 2)
    solo = [solo_generate(rr, r, max_new=16) for r in rows]
    server = GenerationServer(rr.module, rr.params, slots=2, window=128,
                              chunk=4, max_prompt_len=64,
                              cache_dtype=jnp.float32, seed=5)
    try:
        with ThreadPoolExecutor(2) as ex:
            f_greedy = ex.submit(server.generate, rows[0], 16, -1)
            f_sample = ex.submit(server.generate, rows[1], 16, -1, 1.5, 1.0)
            greedy = f_greedy.result(120)
            sampled = f_sample.result(120)
        assert greedy == solo[0], (greedy, solo[0])
        assert sampled != solo[1]  # ~zero chance of 16 greedy matches at T=1.5
        assert len(sampled) > 0
    finally:
        server.close()


def test_speculative_matches_plain_greedy(decoder):
    """Prompt-lookup speculative decoding must be a pure accelerator:
    greedy output identical to the non-speculative server, accepted or
    rejected drafts alike. Random tiny models cycle under greedy decode,
    so lookup drafts genuinely accept here (asserted via stats)."""
    rr = decoder
    rows = prompts(rr, 2)
    max_new = 48
    plain = GenerationServer(rr.module, rr.params, slots=2, window=256,
                             chunk=4, max_prompt_len=64,
                             cache_dtype=jnp.float32)
    try:
        base = [plain.generate(r, max_new, -1) for r in rows]
    finally:
        plain.close()
    spec = GenerationServer(rr.module, rr.params, slots=2, window=256,
                            chunk=4, max_prompt_len=64, speculative_k=4,
                            cache_dtype=jnp.float32)
    try:
        got = [spec.generate(r, max_new, -1) for r in rows]
        assert got == base, (got, base)
        assert spec.stats["spec_steps"] > 0
        # greedy cycles -> drafts accept; require at least some acceptance
        assert spec.stats["spec_accepted_tokens"] > 0, spec.stats
    finally:
        spec.close()


def test_speculative_with_sampling_neighbour(decoder):
    """A sampling slot (never speculated) next to a speculating greedy
    slot: the greedy slot must still match its solo run."""
    rr = decoder
    rows = prompts(rr, 2)
    solo = solo_generate(rr, rows[0], max_new=24)
    server = GenerationServer(rr.module, rr.params, slots=2, window=256,
                              chunk=4, max_prompt_len=64, speculative_k=4,
                              cache_dtype=jnp.float32, seed=9)
    try:
        with ThreadPoolExecutor(2) as ex:
            f_greedy = ex.submit(server.generate, rows[0], 24, -1)
            f_sample = ex.submit(server.generate, rows[1], 24, -1, 1.0, 0.95)
            greedy = f_greedy.result(180)
            f_sample.result(180)
        assert greedy == solo, (greedy, solo)
    finally:
        server.close()


def test_spec_commit_restores_rejected_slots(decoder):
    """After a ring wrap, a spec step overwrites k/v at all K+1 written
    ring slots; the commit must keep the new values ONLY for the accepted
    prefix and restore the pre-forward k/v AND mask everywhere else —
    otherwise wrapped rows permanently lose K valid keys per step."""
    import jax
    import jax.numpy as jnp

    rr = decoder
    server = GenerationServer(rr.module, rr.params, slots=2, window=16,
                              chunk=2, max_prompt_len=16, speculative_k=4,
                              cache_dtype=jnp.float32)
    try:
        w = server.window
        # simulate a fully wrapped ring: every mask bit True, k/v = 7.0
        cache = [(jnp.full_like(k, 7.0), jnp.full_like(v, 7.0),
                  jnp.ones_like(km)) for k, v, km in server._cache]
        off = jnp.asarray(np.array([5, 11], np.int32))
        tok = jnp.asarray(np.array([3, 7], np.int32))
        pos = jnp.asarray(np.array([40, 40], np.int32))
        active = jnp.asarray(np.array([True, True]))
        temp = jnp.zeros((2,), jnp.float32)          # both greedy
        topp = jnp.full((2,), 0.8, jnp.float32)
        drafts = jnp.asarray(np.array([[9, 10, 11, 12],
                                       [13, 14, 15, 16]], np.int32))
        (cache, tok, pos, off2, rng, emit, accepted) = server._spec_jit(
            server.params, cache, tok, pos, off, active, temp, topp,
            drafts, jax.random.PRNGKey(0))
        acc = np.asarray(accepted)
        km = np.asarray(cache[0][2])
        kk = np.asarray(cache[0][0])
        offs = np.asarray(off)
        js = np.arange(5)
        for row in range(2):
            slots = (offs[row] + js) % w
            # mask: True everywhere (keep -> True, rejected -> restored True)
            np.testing.assert_array_equal(km[row, slots], True)
            for j, slot in enumerate(slots):
                if j <= acc[row]:
                    assert not np.allclose(kk[row, slot], 7.0), (
                        f"row{row} j{j}: accepted slot kept old k/v")
                else:
                    np.testing.assert_allclose(
                        kk[row, slot], 7.0,
                        err_msg=f"row{row} j{j}: rejected slot not restored")
    finally:
        server.close()


def test_speculative_survives_window_wrap(decoder):
    """Long speculative generation past the ring window must stay sane
    (full token count, no crash). Exact equality with the plain server is
    only guaranteed pre-wrap: in-place draft verification temporarily
    shrinks a wrapped row's window by K - accepted."""
    rr = decoder
    row = prompts(rr, 1)[0]
    server = GenerationServer(rr.module, rr.params, slots=1, window=32,
                              chunk=4, max_prompt_len=32, speculative_k=4,
                              prefill_chunk=16, cache_dtype=jnp.float32)
    try:
        got = server.generate(row[:20], 96, -1)
        assert len(got) == 96
    finally:
        server.close()


def test_long_prompt_adaptive_prefill_matches_solo(decoder):
    """A long prompt replays mostly in big (4x) prefill chunks plus a
    small tail; the result must match the solo whole-prompt Generator."""
    rr = decoder
    long_row = rr._encode_raw(" ".join(
        f"metric {i} value {i * 3}" for i in range(110)))   # ~330 tokens
    from veritasfi_tpu.models.generate import Generator

    gen = Generator(rr.module, rr.params, max_prompt_len=448,
                    max_new_tokens=12, cache_dtype=jnp.float32)
    solo = gen.generate_tokens([long_row[-448:]], max_new_tokens=12,
                               eos_id=-1)[0]
    server = GenerationServer(rr.module, rr.params, slots=2, window=512,
                              chunk=4, max_prompt_len=448,
                              prefill_chunk=64, cache_dtype=jnp.float32)
    try:
        got = server.generate(long_row, 12, -1)
        assert got == solo, (got, solo)
    finally:
        server.close()
