"""GenerationServer: continuous batching must reproduce solo generations."""

import time
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


def test_prefix_cache_multiturn_matches_cold(decoder):
    """Chat-history resend: turn 2's prompt = turn 1's prompt + answer +
    new user tokens. The warm server must reuse the retained slot KV
    (prefix_hits > 0, fewer prefill chunks) and still produce EXACTLY the
    cold server's output (f32 cache: bit-identical numerics)."""
    rr = decoder
    turn1 = rr._encode_raw("user: summarize metric three performance")
    server = GenerationServer(rr.module, rr.params, slots=2, window=256,
                              chunk=4, max_prompt_len=192, prefill_chunk=16,
                              cache_dtype=jnp.float32)
    try:
        ans1 = server.generate(turn1, 24, -1)
        turn2 = turn1 + ans1 + rr._encode_raw("user: and the outlook?")
        base_chunks = server.stats["prefill_chunks"]
        ans2 = server.generate(turn2, 24, -1)
        warm_chunks = server.stats["prefill_chunks"] - base_chunks
        assert server.stats["prefix_hits"] == 1, server.stats
        assert server.stats["prefix_reused_tokens"] >= len(turn1), \
            server.stats
    finally:
        server.close()
    cold = GenerationServer(rr.module, rr.params, slots=2, window=256,
                            chunk=4, max_prompt_len=192, prefill_chunk=16,
                            prefix_cache=False, cache_dtype=jnp.float32)
    try:
        cold_ans2 = cold.generate(turn2, 24, -1)
        assert cold.stats["prefix_hits"] == 0
        cold_base = cold.stats["prefill_chunks"]
    finally:
        cold.close()
    assert ans2 == cold_ans2, (ans2, cold_ans2)
    # the whole point: the warm resend prefills fewer chunks
    assert warm_chunks < cold_base, (warm_chunks, cold_base)


def test_prefix_cache_partial_match_and_divergence(decoder):
    """A second prompt sharing only PART of the retained history (same
    prefix, divergent tail) must still match its solo run — the resume
    mask must hide retained tokens past the divergence point."""
    rr = decoder
    turn1 = rr._encode_raw(" ".join(f"word{i} metric{i}"
                                    for i in range(16)))   # ~32 tokens
    server = GenerationServer(rr.module, rr.params, slots=1, window=256,
                              chunk=4, max_prompt_len=192, prefill_chunk=8,
                              cache_dtype=jnp.float32)
    try:
        server.generate(turn1, 16, -1)
        # shares the first tokens of turn1 then diverges
        probe = turn1[: len(turn1) // 2] + rr._encode_raw(
            "totally different continuation of the question here")
        got = server.generate(probe, 16, -1)
        assert server.stats["prefix_hits"] == 1, server.stats
    finally:
        server.close()
    assert got == solo_generate(rr, probe, max_new=16), got


def test_prefix_cache_identical_prompt_resend(decoder):
    """Resending the EXACT prompt of a retained slot (user retry): the
    match is capped at len(prompt)-1 so the last prompt token is re-fed —
    an empty suffix would sample the first token from a pad position's
    junk logits."""
    rr = decoder
    prompt = rr._encode_raw(
        "user: what were the fourth quarter vehicle deliveries and how did "
        "they compare with the prior year guidance for total production")
    assert len(prompt) > 9, "prompt must exceed prefill_chunk+1 for reuse"
    server = GenerationServer(rr.module, rr.params, slots=1, window=256,
                              chunk=4, max_prompt_len=192, prefill_chunk=8,
                              cache_dtype=jnp.float32)
    try:
        first = server.generate(prompt, 16, -1)
        again = server.generate(prompt, 16, -1)
        assert server.stats["prefix_hits"] == 1, server.stats
        assert server.stats["prefix_reused_tokens"] == len(prompt) - 1
    finally:
        server.close()
    solo = solo_generate(rr, prompt, max_new=16)
    assert first == solo, (first, solo)
    assert again == solo, (again, solo)


def test_interleaved_request_prefers_empty_slot(decoder):
    """A no-match admission must take an EMPTY free slot over one holding
    retained history: with slots=2, session A's retention survives an
    unrelated request B, so A's turn-2 history resend still prefix-hits."""
    rr = decoder
    chat = rr._encode_raw("session A asks about quarterly deliveries and "
                          "the production guidance for the coming year")
    server = GenerationServer(rr.module, rr.params, slots=2, window=256,
                              chunk=4, max_prompt_len=192, prefill_chunk=8,
                              cache_dtype=jnp.float32)
    try:
        a1 = server.generate(chat, 16, -1)
        server.generate(rr._encode_raw("session B other question"), 16, -1)
        turn2 = chat + a1 + rr._encode_raw("any update?")
        got = server.generate(turn2, 16, -1)
        assert server.stats["prefix_hits"] == 1, server.stats
        assert server.stats["prefix_reused_tokens"] >= len(chat), \
            server.stats
    finally:
        server.close()
    assert got == solo_generate(rr, turn2, max_new=16), got


def test_prefix_cache_survives_slot_churn(decoder):
    """Interleaved sessions: slot retention must key on token content, so
    an unrelated request in between does not corrupt the resumed chat."""
    rr = decoder
    chat = rr._encode_raw("session A asks about quarterly deliveries")
    server = GenerationServer(rr.module, rr.params, slots=2, window=256,
                              chunk=4, max_prompt_len=192, prefill_chunk=16,
                              cache_dtype=jnp.float32)
    try:
        a1 = server.generate(chat, 16, -1)
        server.generate(rr._encode_raw("session B other question"), 16, -1)
        turn2 = chat + a1 + rr._encode_raw("any update?")
        got = server.generate(turn2, 16, -1)
    finally:
        server.close()
    assert got == solo_generate(rr, turn2, max_new=16), got


def test_crash_recovery_mid_decode(decoder):
    """A decode step that dies (the relay-side native crash, NOTES.md)
    must trigger a device-state rebuild and requeue the in-flight request
    as a continuation: the client's stream resumes with nothing re-emitted
    and nothing lost (greedy tokens == solo run)."""
    rr = decoder
    row = prompts(rr, 1)[0]
    solo = solo_generate(rr, row, max_new=14)
    server = GenerationServer(rr.module, rr.params, slots=2, window=128,
                              chunk=2, max_prompt_len=64,
                              cache_dtype=jnp.float32)
    real = server._decode_jit
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected: terminate called")
        return real(*a, **kw)

    server._decode_jit = flaky
    try:
        got = server.generate(row, 14, -1)
    finally:
        server.close()
    assert got == solo, (got, solo)
    assert server.stats["recoveries"] == 1, server.stats


def test_crash_recovery_mid_prefill(decoder):
    """A crash inside the prefill chain must not drop the request being
    admitted (it is registered on its slot before any device dispatch)."""
    rr = decoder
    row = prompts(rr, 1)[0]
    solo = solo_generate(rr, row, max_new=10)
    server = GenerationServer(rr.module, rr.params, slots=2, window=128,
                              chunk=2, max_prompt_len=64,
                              cache_dtype=jnp.float32)
    real = server._prefill_chunk_jit
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected: prefill died")
        return real(*a, **kw)

    server._prefill_chunk_jit = flaky
    try:
        got = server.generate(row, 10, -1)
    finally:
        server.close()
    assert got == solo, (got, solo)
    assert server.stats["recoveries"] == 1, server.stats


def test_crash_recovery_multi_request(decoder):
    """Both in-flight requests survive a mid-decode crash; each stream
    resumes (continuation prompts carry the already-emitted tokens)."""
    rr = decoder
    rows = prompts(rr, 2)
    solo = [solo_generate(rr, r, max_new=12) for r in rows]
    server = GenerationServer(rr.module, rr.params, slots=2, window=128,
                              chunk=2, max_prompt_len=64,
                              cache_dtype=jnp.float32)
    real = server._decode_jit
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected")
        return real(*a, **kw)

    server._decode_jit = flaky
    try:
        with ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(server.generate, r, 12, -1) for r in rows]
            got = [f.result(120) for f in futs]
    finally:
        server.close()
    assert got == solo, (got, solo)
    assert server.stats["recoveries"] == 1, server.stats


def test_recovery_exhaustion_fails_futures(decoder):
    """When the device is genuinely gone (every rebuild dies again), the
    in-flight futures fail with the underlying error instead of hanging."""
    rr = decoder
    row = prompts(rr, 1)[0]
    server = GenerationServer(rr.module, rr.params, slots=1, window=128,
                              chunk=2, max_prompt_len=64,
                              cache_dtype=jnp.float32, max_recoveries=2)

    def dead(*a, **kw):
        raise RuntimeError("device gone")

    server._decode_jit = dead
    req = server.submit(row, 10, -1)
    with pytest.raises(RuntimeError, match="device"):
        req.result.result(timeout=120)
    assert server.stats["recoveries"] == 3   # 2 allowed + the fatal one
    server.close()


def test_double_crash_recovery_no_duplication(decoder):
    """TWO crashes on one request: each recovery must rebuild the
    continuation from the ORIGINAL prompt + all emissions — extending the
    already-extended prompt would duplicate the first recovery's tokens
    in the model context and diverge the stream after the second
    recovery."""
    rr = decoder
    row = prompts(rr, 1)[0]
    solo = solo_generate(rr, row, max_new=14)
    server = GenerationServer(rr.module, rr.params, slots=2, window=128,
                              chunk=2, max_prompt_len=64,
                              cache_dtype=jnp.float32)
    real = server._decode_jit
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] in (2, 5):
            raise RuntimeError("injected")
        return real(*a, **kw)

    server._decode_jit = flaky
    try:
        got = server.generate(row, 14, -1)
    finally:
        server.close()
    assert got == solo, (got, solo)
    assert server.stats["recoveries"] == 2, server.stats


def test_recovery_exhaustion_drains_queue_and_streams_raise(decoder):
    """Exhaustion must also fail QUEUED-but-unadmitted requests (their
    futures would otherwise hang until the client timeout), and stream()
    consumers must get the device-lost error raised — not a clean end
    indistinguishable from success."""
    rr = decoder
    row = prompts(rr, 1)[0]
    server = GenerationServer(rr.module, rr.params, slots=1, window=128,
                              chunk=2, max_prompt_len=64,
                              cache_dtype=jnp.float32, max_recoveries=1)

    def dead(*a, **kw):
        raise RuntimeError("device gone")

    server._decode_jit = dead
    with ThreadPoolExecutor(1) as ex:
        stream_fut = ex.submit(
            lambda: list(server.stream(row, 10, -1, timeout=120)))
        req_q = server.submit(row, 10, -1)   # waits behind the 1 slot
        with pytest.raises(RuntimeError, match="device"):
            req_q.result.result(timeout=120)
        with pytest.raises(RuntimeError, match="device"):
            stream_fut.result(timeout=120)
    server.close()


def test_tp_mesh_matches_single_device(decoder):
    """Continuous batching UNDER tensor parallelism (VERDICT r4 #5): the
    server built over a ('model', 8) mesh — params laid out by the training
    TP rules, slot caches allocated on the mesh — must emit the same greedy
    tokens as the single-device server, including a queued request that
    joins mid-flight (slots < requests exercises admit/evict under GSPMD).
    """
    from veritasfi_tpu.parallel import make_mesh

    rr = decoder
    rows = prompts(rr, 3)
    solo = [solo_generate(rr, r) for r in rows]
    mesh = make_mesh([("model", 8)])
    server = GenerationServer(rr.module, rr.params, slots=2, window=128,
                              chunk=4, max_prompt_len=64,
                              cache_dtype=jnp.float32, mesh=mesh)
    try:
        with ThreadPoolExecutor(3) as ex:
            futs = [ex.submit(server.generate, r, 12, -1) for r in rows]
            got = [f.result(180) for f in futs]
        assert got == solo, (got, solo)
    finally:
        server.close()
