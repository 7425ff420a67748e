"""Continuous-batching generation server with a rolling KV window.

The reference leaves generation to an external vLLM process; this module is
the first-party TPU equivalent of vLLM's scheduler for the in-process
backend (SURVEY §7.4, VERDICT r1 item 7): concurrent requests decode in ONE
device program per step-chunk instead of serializing whole generations.

Design (TPU-first — static shapes throughout):
  * SLOTS, not a dynamic batch: a fixed [S, W] KV cache; each slot hosts
    one request. Joins = a prefill program that writes one slot's cache
    rows; leaves = the slot's key-mask rows cleared. No recompilation as
    occupancy changes.
  * ROLLING window: writes go to ``offset % window``, so a slot's memory is
    bounded at W tokens regardless of generation length (sliding-window
    attention; RoPE positions stay absolute). This is the TPU-native
    answer to paged KV: block tables would gather pages back into a dense
    [S, W] view every step on TPU (same bandwidth, extra copies), so the
    win paging buys on GPUs — memory bounding — is had here by the ring.
  * CHUNKED decode: each program advances every active slot ``chunk``
    tokens (lax.scan) and the host reads back [chunk, S] tokens in ONE
    transfer — the host<->device round-trip (~28 ms on this relay)
    amortizes over chunk x occupancy tokens. Streaming granularity is one
    chunk.
  * Caches are DONATED to the step program (in-place update; no [S, W]
    copy per chunk).

Per-request sampling params: each slot carries its request's temperature /
top_p / eos (vLLM SamplingParams equivalent) — sampling runs vectorized
per row in-program (models/generate._sample_rows); greedy rows
(temperature<=0) coexist with sampling rows in the same chunk.

Prefill is HOST-CHUNKED: one compiled [1, C]-token program replays the
prompt into the slot cache C tokens at a time, so any prompt length uses
the same compiled program (first-long-prompt compiles would otherwise add
20-40 s to TTFT on this chip) and attention memory is bounded at C x W.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.generate import _sample_rows, left_pad
from ..utils.profiler import profiler


@dataclass
class _Request:
    prompt: List[int]
    max_new: int
    eos_id: int
    tokens: "queue.Queue"
    result: Future
    temperature: Optional[float] = None   # None -> server default
    top_p: Optional[float] = None
    emitted: List[int] = field(default_factory=list)
    _row: Optional[List[int]] = None      # truncated prompt actually served
    _orig: Optional[List[int]] = None     # pre-recovery original prompt


_END = object()


class GenerationServer:
    """Slot-based continuous batching over a FlaxDecoderLM."""

    def __init__(self, module, params, *, slots: int = 4, window: int = 1024,
                 chunk: int = 8, max_prompt_len: int = 512,
                 temperature: float = 0.0, top_p: float = 0.8,
                 prefill_chunk: int = 64, prefix_cache: bool = True,
                 cache_dtype=jnp.bfloat16, seed: int = 0,
                 max_recoveries: int = 3, mesh=None,
                 model_axis: str = "model",
                 spec_lookup_k: int = 0) -> None:
        """``mesh``: optional jax.sharding.Mesh with a ``model_axis`` —
        tensor-parallel continuous batching. Params are laid out with the
        training rules (train.reranker_lora.shard_params, same as
        models.generate.Generator); the persistent slot caches are
        allocated ON the mesh (kv_heads over the model axis when they
        divide, replicated otherwise) so every scheduler program — prefill
        chunks, commit, chunked decode — compiles under GSPMD with XLA's
        all-reduces after o_proj/down_proj. Greedy output matches the
        single-device server token-for-token.

        ``spec_lookup_k``: in-program prompt-lookup speculation (0 = off).
        The r3 speculative path was REMOVED because its host-side draft +
        separate verify dispatch cost a full relay round-trip per step and
        lost EVEN at 100% acceptance (SPEC_DECODE_r03.json). This version
        moves BOTH drafting and verification inside the chunked decode
        scan: each scan step 2-gram-matches the slot's device-resident
        prompt tokens, feeds [cur, draft_0..k-1] through ONE [S, k+1]
        forward (the per-row multi-token cache path), accepts the longest
        prefix equal to the model's own greedy chain, and restores the
        rejected ring slots from a pre-step snapshot — so the
        one-readback-per-chunk economics are untouched and a chunk emits
        between ``chunk`` and ``chunk*(k+1)`` tokens per slot. Emitted
        tokens are exactly the plain greedy stream regardless of draft
        quality (acceptance compares against the model's own argmax
        chain); sampling slots (temperature>0) decode unspeculated in the
        same program. Pays only where generations quote the prompt — the
        RAG answer-with-citations acceptance profile (NOTES r5 #5)."""
        self.module = module
        self.mesh = mesh
        self.model_axis = model_axis
        if mesh is not None:
            from ..train.reranker_lora import shard_params

            params = shard_params(params, mesh, model_axis)
        self.params = params
        self.arch = module.arch
        self.slots = slots
        self.window = window
        self.chunk = chunk
        self.max_prompt_len = min(max_prompt_len, window)
        self.temperature = float(temperature)   # default when a request
        self.top_p = float(top_p)               # doesn't set its own
        self.prefill_chunk = prefill_chunk
        # NOTE: prompt-lookup speculative decoding was built, measured, and
        # REMOVED (SPEC_DECODE_r03.json): with the chunked scan amortizing
        # one readback over chunk x occupancy tokens, a verify step costs a
        # full dispatch+readback and lost tok/s in every configuration EVEN
        # AT 100% draft acceptance on a trained quoting workload (0.59-0.73x).
        self.cache_dtype = cache_dtype
        # a prompt padded to prefill_chunk must fit the ring window, else
        # prefill writes past the cache and the mask init silently clips;
        # prompts are truncated (keep-tail) to the largest padded length
        # that fits — same truncation semantics as max_prompt_len. The
        # public attribute reflects the REAL capacity.
        self.prefill_chunk = min(self.prefill_chunk, window)
        self._prompt_cap = min(
            max_prompt_len, (window // self.prefill_chunk)
            * self.prefill_chunk)
        self.max_prompt_len = self._prompt_cap

        # one jitted allocator builds ALL per-slot device state in a single
        # dispatch (host-side jnp.zeros costs ~4 ms each on the relay);
        # reused verbatim by crash recovery to rebuild a lost device state.
        # Under a mesh the persistent buffers must be CREATED on the mesh
        # (out_shardings) — a no-input jit would otherwise commit them to
        # the default device and every later program would mix placements.
        self.spec_k = int(spec_lookup_k)
        if mesh is None:
            self._alloc_state_jit = jax.jit(self._alloc_state_impl)
            self._local_init_jit = jax.jit(self._local_init_impl)
            if self.spec_k:
                self._alloc_spec_jit = jax.jit(self._alloc_spec_impl)
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            kv_spec = (PartitionSpec(None, None, model_axis, None)
                       if self.arch.kv_heads % mesh.shape[model_axis] == 0
                       else PartitionSpec())
            kv = NamedSharding(mesh, kv_spec)
            cache_sh = [(kv, kv, rep) for _ in range(self.arch.layers)]
            self._alloc_state_jit = jax.jit(
                self._alloc_state_impl,
                out_shardings=(cache_sh, rep, rep, rep, rep, rep))
            self._local_init_jit = jax.jit(self._local_init_impl,
                                           out_shardings=cache_sh)
            if self.spec_k:
                self._alloc_spec_jit = jax.jit(
                    self._alloc_spec_impl, out_shardings=(rep, rep, rep))
        self._seed = seed
        self._alloc_device_state(seed)

        # host-side slot bookkeeping
        self._slot_req: List[Optional[_Request]] = [None] * slots
        self._produced = [0] * slots
        self._active = np.zeros((slots,), bool)
        self._eos = np.zeros((slots,), np.int32)
        self._temp_host = np.zeros((slots,), np.float32)

        self._prefill_chunk_jit = jax.jit(self._prefill_chunk_impl,
                                          donate_argnums=(1,))
        self._local_from_slot_jit = jax.jit(self._local_from_slot_impl)
        if self.spec_k:
            self._ctx_set_jit = jax.jit(self._ctx_set_impl,
                                        donate_argnums=(0, 1, 2))
            self._decode_spec_jit = jax.jit(
                self._decode_spec_impl, donate_argnums=(1,),
                static_argnames=("chunk", "k"))
        # local (argnum 1) is NOT donated: the slot-copy reads it through a
        # dtype cast, so XLA can't alias it anyway (it would only warn)
        self._prefill_commit_jit = jax.jit(
            self._prefill_commit_impl,
            donate_argnums=(0, 7, 8, 9, 10, 11))
        self._decode_jit = jax.jit(
            self._decode_impl, donate_argnums=(1,),
            static_argnames=("chunk",))
        # prefix cache (chat-history resend): a finished slot RETAINS its
        # KV + token history; a new prompt beginning with those tokens
        # replays only the suffix. Entries: (tokens, kv_coverage, shift)
        # where slot(h) = shift + h maps history index -> ring slot.
        self.prefix_cache = bool(prefix_cache)
        self._retained: List[Optional[Tuple[List[int], int, int]]] = \
            [None] * slots
        self._shift_host = np.zeros((slots,), np.int64)   # per-slot shift
        self._hw_host = np.zeros((slots,), np.int64)      # ring high-water
        self.stats = {"decode_chunks": 0, "prefill_chunks": 0,
                      "prefix_hits": 0, "prefix_reused_tokens": 0,
                      "recoveries": 0, "spec_steps": 0, "spec_emitted": 0,
                      "spec_fallback_chunks": 0}
        self._prev_stale = False
        self.max_recoveries = max_recoveries
        self._consecutive_recoveries = 0
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="generation-server")
        self._thread.start()

    # ------------------------------------------------------------------
    # device programs
    # ------------------------------------------------------------------
    def _alloc_state_impl(self):
        a = self.arch
        cache = [
            (jnp.zeros((self.slots, self.window, a.kv_heads, a.head_dim),
                       self.cache_dtype),
             jnp.zeros((self.slots, self.window, a.kv_heads, a.head_dim),
                       self.cache_dtype),
             jnp.zeros((self.slots, self.window), bool))
            for _ in range(a.layers)]
        tok = jnp.zeros((self.slots,), jnp.int32)
        pos = jnp.zeros((self.slots,), jnp.int32)
        off = jnp.zeros((self.slots,), jnp.int32)
        temp = jnp.zeros((self.slots,), jnp.float32)
        topp = jnp.full((self.slots,), self.top_p, jnp.float32)
        return cache, tok, pos, off, temp, topp

    def _alloc_device_state(self, seed: int) -> None:
        cache, tok, pos, off, temp, topp = self._alloc_state_jit()
        self._cache = [tuple(layer) for layer in cache]
        self._tok, self._pos, self._off = tok, pos, off
        # per-slot sampling params, device-resident ([S] rows updated at
        # admit; the decode program samples every slot with its own params)
        self._temp, self._topp = temp, topp
        self._rng = jax.random.PRNGKey(seed)
        if self.spec_k:
            self._ctx, self._ctx_len, self._prev = self._alloc_spec_jit()

    def _alloc_spec_impl(self):
        """Per-slot speculation state: the served prompt rows (the draft
        source the in-program 2-gram lookup matches against), their
        lengths, and the token preceding each slot's pending token."""
        ctx = jnp.full((self.slots, self._prompt_cap), self.arch.pad_id,
                       jnp.int32)
        return ctx, jnp.zeros((self.slots,), jnp.int32), \
            jnp.zeros((self.slots,), jnp.int32)

    def _ctx_set_impl(self, ctx, ctx_len, prev, slot, row, n, ptok):
        ctx = jax.lax.dynamic_update_slice(ctx, row[None, :], (slot, 0))
        return ctx, ctx_len.at[slot].set(n), prev.at[slot].set(ptok)

    def _push_prev(self) -> None:
        """Refresh the device 'token before the pending token' rows from
        host emission state. Plain-decode chunks (spec wrap-gate fallback)
        advance slots without maintaining ``prev``; the spec program's
        2-gram lookup keys on (prev, tok), so it must be rebuilt before
        the gate reopens. For an active slot the host mirror is exact:
        every device-advanced token of a live slot was emitted."""
        vals = np.full((self.slots,), self.arch.pad_id, np.int32)
        for s in range(self.slots):
            req = self._slot_req[s]
            if not self._active[s] or req is None:
                continue
            if len(req.emitted) >= 2:
                vals[s] = req.emitted[-2]
            elif req._row:
                vals[s] = req._row[-1]
        self._prev = jnp.asarray(vals)
        self._prev_stale = False

    def _prefill_chunk_impl(self, params, local, ids, mask, offset,
                            positions, last_idx):
        """Advance a batch-1 LOCAL prefill cache by one [1, C] prompt chunk
        at physical ``offset``. One compiled program serves every chunk of
        every prompt length (offset/positions are traced scalars/arrays),
        so long prompts never trigger fresh compiles, and attention memory
        is bounded at C x W. ``last_idx``: in-chunk index whose logits to
        return — width-1 for left-padded fresh prefill, the last REAL
        token's index for the right-padded suffix chunks of a prefix-cache
        resume."""
        logits, local = self.module.apply(
            params, ids, mask, cache=local, cache_offset=offset,
            positions=positions)
        return local, jax.lax.dynamic_index_in_dim(
            logits, last_idx, axis=1, keepdims=False)

    def _local_init_impl(self, mask):
        """Build a fresh batch-1 local prefill cache ON DEVICE (host-side
        jnp.zeros transfers cost ~4 ms each on the relay — ~100 ms per
        admit for 8 layers x 3 arrays; one jitted allocator is one
        dispatch). Each layer gets distinct output buffers so donation in
        the prefill chain never aliases two leaves to one buffer."""
        a = self.arch
        w = self.window
        m = mask.shape[1]
        kms = jnp.zeros((a.layers, 1, w), bool).at[:, :, :m].set(
            mask[None])
        zk = jnp.zeros((a.layers, 1, w, a.kv_heads, a.head_dim),
                       self.cache_dtype)
        zv = jnp.zeros((a.layers, 1, w, a.kv_heads, a.head_dim),
                       self.cache_dtype)
        return [(zk[i], zv[i], kms[i]) for i in range(a.layers)]

    def _local_from_slot_impl(self, cache, slot, mask):
        """Seed a batch-1 local prefill cache from a RETAINED slot's rows
        (prefix-cache resume: the new prompt begins with a finished
        request's prompt+answer tokens, so their k/v are already correct —
        chat-history resend). ``mask`` is the full [1, W] visibility init:
        retained prefix + the real suffix positions (slot-position
        causality in the scalar-offset attention path keeps not-yet-written
        suffix slots invisible until their chunk lands, exactly as in fresh
        prefill)."""
        a = self.arch
        kms = jnp.zeros((a.layers, 1, self.window), bool) | mask[None]
        out = []
        for i, (gk, gv, _) in enumerate(cache):
            lk = jax.lax.dynamic_slice(
                gk, (slot, 0, 0, 0), (1,) + gk.shape[1:])
            lv = jax.lax.dynamic_slice(
                gv, (slot, 0, 0, 0), (1,) + gv.shape[1:])
            out.append((lk, lv, kms[i]))
        return out

    def _prefill_commit_impl(self, cache, local, last_logits, slot, rng,
                             temp, topp, tok, pos, off, temps, topps,
                             prompt_len, padded):
        """Copy the finished local prefill cache into ``slot`` of the
        global cache, sample the first token with the request's params,
        and update all per-slot device state in the same program (each
        host-side .at[].set would be its own relay dispatch)."""
        t0 = _sample_rows(last_logits, rng, temp[None], topp[None])[0]
        new_cache = []
        for (gk, gv, gm), (lk, lv, lm) in zip(cache, local):
            gk = jax.lax.dynamic_update_slice(gk, lk.astype(gk.dtype),
                                              (slot, 0, 0, 0))
            gv = jax.lax.dynamic_update_slice(gv, lv.astype(gv.dtype),
                                              (slot, 0, 0, 0))
            gm = jax.lax.dynamic_update_slice(gm, lm, (slot, 0))
            new_cache.append((gk, gv, gm))
        tok = tok.at[slot].set(t0)
        pos = pos.at[slot].set(prompt_len)
        off = off.at[slot].set(padded)
        temps = temps.at[slot].set(temp)
        topps = topps.at[slot].set(topp)
        return new_cache, tok, pos, off, temps, topps, t0

    def _decode_impl(self, params, cache, tok, pos, off, active, eos,
                     temp, topp, rng, *, chunk: int):
        """Advance every active slot ``chunk`` tokens in one program."""
        s = tok.shape[0]
        rows = jnp.arange(s)

        def step(carry, _):
            cache, tok, pos, off, rng, live = carry
            slot_pos = off % self.window
            cache = [(k, v, km.at[rows, slot_pos].set(
                km[rows, slot_pos] | live)) for k, v, km in cache]
            logits, cache = self.module.apply(
                params, tok[:, None], jnp.ones((s, 1), jnp.int32),
                cache=cache, cache_offset=slot_pos,
                positions=pos[:, None])
            rng, key = jax.random.split(rng)
            nxt = _sample_rows(logits[:, -1, :], key, temp, topp)
            nxt = jnp.where(live, nxt, self.arch.pad_id)
            live = live & (nxt != eos)
            # dead rows freeze: advancing off for inactive slots would
            # smear junk k/v writes around their ring, eventually
            # clobbering the retained prefix a later request could reuse
            # (the write at the FIXED off slot is junk beyond the retained
            # history, mask never set — harmless)
            pos = jnp.where(live, pos + 1, pos)
            off = jnp.where(live, off + 1, off)
            return (cache, nxt, pos, off, rng, live), nxt

        init = (cache, tok, pos, off, rng, active)
        (cache, tok, pos, off, rng, live), toks = jax.lax.scan(
            step, init, None, length=chunk)
        return cache, tok, pos, off, rng, live, toks.T   # [S, chunk]

    def _decode_spec_impl(self, params, cache, tok, prev, pos, off, active,
                          eos, temp, topp, rng, ctx, ctx_len, *,
                          chunk: int, k: int):
        """``chunk`` verify steps, each advancing every active greedy slot
        by 1..k+1 tokens (see the class docstring). Emits exactly the plain
        greedy stream: acceptance compares the draft to the model's OWN
        argmax chain, so draft quality affects speed only. Rejected ring
        writes are restored from a pre-step snapshot, and per-step
        visibility of the k+1 in-flight tokens rides the per-row write
        causality in the attention cache path — mask bits are persisted
        only for accepted tokens.

        WRAP CONTRACT: the host only dispatches this program when every
        active slot stays strictly inside virgin ring territory for the
        whole chunk (hw + chunk*(k+1) <= window). Once a ring has wrapped,
        the [S, k+1] block forward would OVERWRITE still-visible old keys
        with in-flight draft writes and the write-causality mask hides
        those slots wholesale (old key included), so query j would lose
        attention to keys plain sequential decode still sees — the host
        falls back to the plain program for such chunks (_tick)."""
        s = tok.shape[0]
        w = self.window
        rows = jnp.arange(s)[:, None]
        js = jnp.arange(k + 1)[None, :]                      # [1, k+1]
        c_len = ctx.shape[1]
        pad = jnp.int32(self.arch.pad_id)
        greedy_row = temp <= 0.0

        def step(carry, _):
            cache, tok, prev, pos, off, rng, live = carry
            # ---- draft: continuation after the most recent 2-gram match
            ii = jnp.arange(c_len - 1)
            m = ((ctx[:, :-1] == prev[:, None])
                 & (ctx[:, 1:] == tok[:, None])
                 & ((ii[None, :] + 1) < ctx_len[:, None]))
            idx = jnp.max(jnp.where(m, ii[None, :], -1), axis=1)   # [S]
            gpos = idx[:, None] + 2 + jnp.arange(k)[None, :]       # [S, k]
            valid_d = (idx[:, None] >= 0) & (gpos < ctx_len[:, None])
            draft = jnp.where(
                valid_d,
                jnp.take_along_axis(ctx, jnp.clip(gpos, 0, c_len - 1),
                                    axis=1), pad)

            # ---- snapshot the ring rows this step overwrites
            slots_w = (off[:, None] + js) % w                 # [S, k+1]
            saved = [(ck[rows, slots_w], cv[rows, slots_w])
                     for ck, cv, _ in cache]

            # ---- one [S, k+1] forward over [cur, draft]
            ids = jnp.concatenate([tok[:, None], draft], axis=1)
            positions = pos[:, None] + js
            logits, cache = self.module.apply(
                params, ids, jnp.ones((s, k + 1), jnp.int32),
                cache=cache, cache_offset=off, positions=positions)

            rng2, key = jax.random.split(rng)
            out0 = _sample_rows(logits[:, 0, :], key, temp, topp)
            chain = jnp.argmax(logits[:, 1:, :], axis=-1).astype(jnp.int32)
            outs = jnp.concatenate([out0[:, None], chain], axis=1)

            # ---- acceptance (greedy slots only), first-eos truncation
            match = (draft == outs[:, :k]) & greedy_row[:, None] & valid_d
            acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                          axis=1)                              # [S] in 0..k
            is_eos = outs == eos[:, None]
            e = jnp.min(jnp.where(is_eos, jnp.broadcast_to(js, is_eos.shape),
                                  k + 2), axis=1)              # [S]
            cnt = jnp.where(live, jnp.minimum(acc + 1, e + 1), 0)
            adv = jnp.where(live, jnp.minimum(acc + 1, e), 0)
            keep = (js <= jnp.minimum(acc, e)[:, None]) & live[:, None]

            # ---- restore rejected writes, persist accepted mask bits
            new_cache = []
            for (ck, cv, km), (sk, sv) in zip(cache, saved):
                gk, gv = ck[rows, slots_w], cv[rows, slots_w]
                k4 = keep[..., None, None]
                ck = ck.at[rows, slots_w].set(jnp.where(k4, gk, sk))
                cv = cv.at[rows, slots_w].set(jnp.where(k4, gv, sv))
                km = km.at[rows, slots_w].set(km[rows, slots_w] | keep)
                new_cache.append((ck, cv, km))

            last = jnp.maximum(cnt - 1, 0)[:, None]
            new_tok = jnp.take_along_axis(outs, last, axis=1)[:, 0]
            tok_before = jnp.take_along_axis(
                outs, jnp.maximum(last - 1, 0), axis=1)[:, 0]
            new_prev = jnp.where(last[:, 0] >= 1, tok_before, tok)
            live2 = live & (e > acc)
            new_tok = jnp.where(live2, new_tok, pad)
            new_prev = jnp.where(live2, new_prev, prev)
            pos2 = pos + adv
            off2 = off + adv
            toks_step = jnp.where(js < cnt[:, None], outs, pad)
            return ((new_cache, new_tok, new_prev, pos2, off2, rng2, live2),
                    (toks_step, cnt, adv))

        init = (cache, tok, prev, pos, off, rng, active)
        (cache, tok, prev, pos, off, rng, live), (toks, cnts, advs) = \
            jax.lax.scan(step, init, None, length=chunk)
        # [chunk, S, k+1] -> [S, chunk, k+1]; [chunk, S] -> [S, chunk]
        return (cache, tok, prev, pos, off, rng, live,
                jnp.transpose(toks, (1, 0, 2)), cnts.T, advs.T)

    # ------------------------------------------------------------------
    # host scheduler
    # ------------------------------------------------------------------
    def _admit(self) -> bool:
        """Admit every queued request there is a free slot for. All device
        work (local cache init, chunked prefill, commit) is enqueued
        asynchronously per request; the first tokens of the whole admission
        wave come back in ONE readback at the end (the per-admit readback
        was the TTFT bottleneck: ~28 ms RTT x slots)."""
        pending = []   # (slot, tok0 device scalar)
        while True:
            free = [i for i in range(self.slots) if not self._active[i]]
            if not free:
                break
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is _END:
                self._closed = True
                break
            row = req.prompt[-self._prompt_cap:]
            c = self.prefill_chunk
            # prefix-cache probe: the free slot whose retained history
            # shares the longest usable token prefix with this prompt.
            # A no-match admission prefers slots with NOTHING retained, so
            # an unrelated interleaved request does not evict a session's
            # retained history while an empty slot sits unused
            slot = min(free, key=lambda s: self._retained[s] is not None)
            reuse_m = 0
            if self.prefix_cache:
                for s in free:
                    r = self._retained[s]
                    if r is None:
                        continue
                    toks, cov, shift = r
                    m = 0
                    for a_t, b_t in zip(toks, row):
                        if a_t != b_t:
                            break
                        m += 1
                    # cap at len(row)-1: at least the last prompt token is
                    # always re-fed, so the commit's first-token logits come
                    # from a REAL forward (an identical resent prompt would
                    # otherwise leave an all-pad suffix chunk and sample the
                    # first token from a pad position's junk logits)
                    m = min(m, cov, len(row) - 1)
                    sfx_pad = max(-(-(len(row) - m) // c) * c, c)
                    # no-wrap restriction: resume prefill writes straight
                    # slots (scalar-offset path), so everything must fit
                    if m >= c and m > reuse_m and \
                            shift + m + sfx_pad <= self.window:
                        slot, reuse_m = s, m
            if reuse_m:
                toks, cov, shift = self._retained[slot]
                sfx = row[reuse_m:]
                padded_sfx = max(-(-len(sfx) // c) * c, c)
                ids = np.full((1, padded_sfx), self.arch.pad_id, np.int32)
                ids[0, : len(sfx)] = sfx
                mask = np.zeros((1, padded_sfx), np.int32)
                mask[0, : len(sfx)] = 1
                # rope positions = history index; pad tail positions are
                # junk (their slots stay mask-False forever)
                positions = (reuse_m
                             + np.arange(padded_sfx)[None]).astype(np.int32)
                vis = np.zeros((1, self.window), bool)
                vis[0, shift: shift + reuse_m] = True
                vis[0, shift + reuse_m: shift + reuse_m + len(sfx)] = True
                local = self._local_from_slot_jit(
                    self._cache, jnp.int32(slot), jnp.asarray(vis))
                start = shift + reuse_m
                last_real = len(sfx) - 1
                self.stats["prefix_hits"] += 1
                self.stats["prefix_reused_tokens"] += reuse_m
            else:
                padded = max(-(-len(row) // c) * c, c)
                ids, mask = left_pad([row], self.arch.pad_id)
                pad = padded - ids.shape[1]
                if pad:
                    ids = np.pad(ids, ((0, 0), (pad, 0)),
                                 constant_values=self.arch.pad_id)
                    mask = np.pad(mask, ((0, 0), (pad, 0)))
                positions = np.maximum(mask.cumsum(axis=-1) - 1, 0).astype(
                    np.int32)
                local = self._local_init_jit(jnp.asarray(mask.astype(bool)))
                start = 0
                last_real = padded - 1
                shift = padded - len(row)
            self._retained[slot] = None
            # register the tenancy BEFORE any device dispatch: if the relay
            # crashes mid-prefill, _recover finds the request on its slot
            # and requeues it (a request registered only after the commit
            # would be silently dropped by a crash in the prefill chain)
            req._row = row
            self._slot_req[slot] = req
            # resume-aware: a recovery requeue carries its prior emissions
            # (they are part of the new prompt); counting them keeps
            # max_new_tokens a TOTAL budget across re-dispatches
            self._produced[slot] = len(req.emitted)
            self._active[slot] = True
            self._eos[slot] = req.eos_id
            # host-chunked prefill, ADAPTIVE chunk width: the bulk of a
            # long prompt replays in big (4c-wide) chunks — a [1, 64]
            # forward underutilizes the MXU, and RAG prompts carry 1000+
            # context tokens — with the c-wide program finishing the tail.
            # Each width is one compiled program reused for every prompt
            # length (first use of a width pays its remote compile once).
            big = 4 * c
            last = None
            i = 0
            n_ids = ids.shape[1]
            while i < n_ids:
                step = big if n_ids - i >= big else c
                sl = slice(i, i + step)
                # last_real is always inside the final chunk (no pure-pad
                # chunks: padding is < one c-chunk on either layout)
                idx = min(max(last_real - i, 0), step - 1)
                local, last = self._prefill_chunk_jit(
                    self.params, local, jnp.asarray(ids[:, sl]),
                    jnp.asarray(mask[:, sl]), jnp.int32(start + i),
                    jnp.asarray(positions[:, sl]), jnp.int32(idx))
                self.stats["prefill_chunks"] += 1
                i += step
            temp = (req.temperature if req.temperature is not None
                    else self.temperature)
            topp = req.top_p if req.top_p is not None else self.top_p
            self._rng, key = jax.random.split(self._rng)
            (self._cache, self._tok, self._pos, self._off, self._temp,
             self._topp, tok0_d) = self._prefill_commit_jit(
                self._cache, local, last, jnp.int32(slot), key,
                jnp.float32(temp), jnp.float32(topp), self._tok,
                self._pos, self._off, self._temp, self._topp,
                jnp.int32(len(row)), jnp.int32(shift + len(row)))
            self._temp_host[slot] = temp
            self._shift_host[slot] = shift
            self._hw_host[slot] = shift + len(row)
            if self.spec_k:
                # device-resident draft source: the served prompt row
                rp = np.full((self._prompt_cap,), self.arch.pad_id,
                             np.int32)
                rp[: len(row)] = row
                self._ctx, self._ctx_len, self._prev = self._ctx_set_jit(
                    self._ctx, self._ctx_len, self._prev, jnp.int32(slot),
                    jnp.asarray(rp), jnp.int32(len(row)),
                    jnp.int32(row[-1] if row else self.arch.pad_id))
            pending.append((slot, tok0_d))
        if pending:
            tok0s = jax.device_get([t for _, t in pending])
            for (slot, _), tok0 in zip(pending, tok0s):
                self._emit(slot, int(tok0))
        return bool(pending)

    def _emit(self, slot: int, tok: int) -> None:
        req = self._slot_req[slot]
        if req is None:
            return
        if tok == req.eos_id or self._produced[slot] >= req.max_new:
            self._finish(slot)
            return
        req.emitted.append(tok)
        req.tokens.put(tok)
        self._produced[slot] += 1
        if self._produced[slot] >= req.max_new:
            self._finish(slot)

    def _finish(self, slot: int) -> None:
        req = self._slot_req[slot]
        if req is None:
            return
        req.tokens.put(_END)
        if not req.result.done():
            req.result.set_result(list(req.emitted))
        self._slot_req[slot] = None
        self._active[slot] = False
        # retain for prefix reuse (chat-history resend sends prompt +
        # answer + new turn): kv coverage excludes the last emitted token
        # (still pending in _tok, never fed through the model) — and is
        # void if the ring ever wrapped (high-water past the window means
        # early slots were overwritten)
        if self.prefix_cache and self._hw_host[slot] < self.window:
            row = req._row or []
            cov = len(row) + max(0, len(req.emitted) - 1)
            self._retained[slot] = (row + req.emitted, cov,
                                    int(self._shift_host[slot]))
        # No mask clear needed: the next tenant's prefill commit overwrites
        # the slot's key mask over the FULL window (dynamic_update_slice of
        # the [1, W] local mask), decode steps never set mask bits for
        # inactive rows, and inactive rows' attention output is discarded.
        # (The old per-layer .at[slot].set(False) here built fresh scatter
        # executables whose first-use remote compile stalled the next
        # admission wave ~1.4 s on the relay.)

    def _loop(self) -> None:
        while True:
            try:
                if not self._tick():
                    return
                self._consecutive_recoveries = 0
            except Exception as e:   # noqa: BLE001 — relay-side native
                # crashes surface as arbitrary runtime errors at readback
                if not self._recover(e):
                    return

    def _tick(self) -> bool:
        """One scheduler iteration; returns False when the loop should
        exit (server closed and drained)."""
        self._admit()
        if self._closed and not self._active.any():
            return False
        if not self._active.any():
            try:
                req = self._queue.get(timeout=0.05)
            except queue.Empty:
                return True
            if req is _END:
                self._closed = True
                return True
            self._queue.queue.appendleft(req)   # re-admit via _admit
            return True
        with profiler.span("generation_chunk"):
            self.stats["decode_chunks"] += 1
            # ring high-water: plain chunks pre-charge `chunk` writes
            # (conservative — host-side finish mid-chunk still lets the
            # device run the chunk out); spec chunks post-charge the
            # device-reported exact advance
            active = jnp.asarray(self._active)
            eos = jnp.asarray(self._eos)
            # speculate only while EVERY active slot stays in virgin ring
            # territory for the whole chunk: once wrapped, the [S, k+1]
            # block forward overwrites still-visible old keys and the
            # write-causality mask hides those slots wholesale, so the
            # output would diverge from plain greedy (see
            # _decode_spec_impl's WRAP CONTRACT) — such chunks run the
            # plain program instead (falls through below)
            if self.spec_k and bool(np.all(
                    self._hw_host[self._active]
                    + self.chunk * (self.spec_k + 1) <= self.window)):
                if self._prev_stale:
                    self._push_prev()
                (self._cache, self._tok, self._prev, self._pos, self._off,
                 self._rng, live, toks, cnts, advs) = self._decode_spec_jit(
                    self.params, self._cache, self._tok, self._prev,
                    self._pos, self._off, active, eos, self._temp,
                    self._topp, self._rng, self._ctx, self._ctx_len,
                    chunk=self.chunk, k=self.spec_k)
                toks, cnts = np.asarray(toks), np.asarray(cnts)
                # exact ring charge from the device's own per-step advance
                # (the conservative chunk*(k+1) figure voided prefix-cache
                # retention ~(k+1)x too early); must land BEFORE the
                # emission loop — _finish reads hw for retention validity
                self._hw_host += np.asarray(advs).sum(axis=1)
                self.stats["spec_steps"] += int(self._active.sum()) \
                    * self.chunk
                self.stats["spec_emitted"] += int(cnts.sum())
                for slot in range(self.slots):
                    if not self._active[slot]:
                        continue
                    for t in range(self.chunk):
                        for j in range(int(cnts[slot, t])):
                            self._emit(slot, int(toks[slot, t, j]))
                            if not self._active[slot]:
                                break
                        if not self._active[slot]:
                            break
                return True
            if self.spec_k:
                # a wrapped (or near-wrap) slot forces this chunk through
                # the plain program; the device-side prev rows go stale
                # and are refreshed from host emission state if the gate
                # reopens (slots churn, hw resets per tenancy)
                self._prev_stale = True
                self.stats["spec_fallback_chunks"] += 1
            self._hw_host[self._active] += self.chunk
            (self._cache, self._tok, self._pos, self._off, self._rng,
             live, toks) = self._decode_jit(
                self.params, self._cache, self._tok, self._pos,
                self._off, active, eos, self._temp, self._topp,
                self._rng, chunk=self.chunk)
            toks = np.asarray(toks)            # ONE readback per chunk
        for slot in range(self.slots):
            if not self._active[slot]:
                continue
            for t in toks[slot]:
                self._emit(slot, int(t))
                if not self._active[slot]:
                    break
        return True

    def _recover(self, exc: Exception) -> bool:
        """Rebuild device state after a step died and requeue every
        in-flight request as a CONTINUATION (prompt = served row + tokens
        already emitted), so clients' streams resume where they stopped
        with nothing re-emitted.

        The decode step DONATES the KV cache and a relay-side native crash
        (seen intermittently on long workloads, NOTES.md) invalidates
        device buffers wholesale, so per-step retry is unsound — the only
        safe recovery is a fresh allocation + prefill replay. The retained
        prefix cache is dropped (its KV is gone); the replay re-pays each
        in-flight request's prefill once. ``max_recoveries`` consecutive
        failures fail the in-flight futures with the underlying error and
        stop the server (the device is genuinely gone)."""
        self.stats["recoveries"] += 1
        self._consecutive_recoveries += 1
        inflight = [self._slot_req[s] for s in range(self.slots)
                    if self._active[s] and self._slot_req[s] is not None]
        if self._consecutive_recoveries > self.max_recoveries:
            err = RuntimeError(
                f"generation device lost ({self._consecutive_recoveries} "
                f"consecutive failed recoveries): {exc!r}")
            # close FIRST so new submits raise instead of enqueueing into
            # a dead queue, then fail queued-but-unadmitted requests too —
            # their futures would otherwise hang until the client timeout,
            # and stream() consumers would see nothing at all
            self._closed = True
            queued = []
            try:
                while True:
                    item = self._queue.get_nowait()
                    if item is not _END:
                        queued.append(item)
            except queue.Empty:
                pass
            for req in inflight + queued:
                # stream() raises an Exception instance off the token
                # queue (a bare _END would be indistinguishable from a
                # clean finish); generate() gets the future's exception
                req.tokens.put(err)
                if not req.result.done():
                    req.result.set_exception(err)
            return False
        self._slot_req = [None] * self.slots
        self._active[:] = False
        self._retained = [None] * self.slots
        self._shift_host[:] = 0
        self._hw_host[:] = 0
        self._prev_stale = bool(self.spec_k)
        try:
            self._alloc_device_state(self._seed
                                     + self.stats["recoveries"])
        except Exception:   # noqa: BLE001 — allocator died too; next
            # recovery attempt (or exhaustion) handles it
            pass
        # continuation prompts; FRONT of the queue, original order.
        # Rebuild from the ORIGINAL prompt + all emissions every time: a
        # second recovery that extended the already-extended prompt would
        # duplicate the first recovery's emissions in the model context
        for req in reversed(inflight):
            if req._orig is None:
                req._orig = list(req.prompt)
            req.prompt = list(req._orig) + list(req.emitted)
            self._queue.queue.appendleft(req)
        return True

    # ------------------------------------------------------------------
    # client surface
    # ------------------------------------------------------------------
    def submit(self, prompt: List[int], max_new_tokens: int = 256,
               eos_id: Optional[int] = None,
               temperature: Optional[float] = None,
               top_p: Optional[float] = None) -> _Request:
        """Enqueue one generation; ``temperature``/``top_p`` default to the
        server-level values (the reference serves a fixed temperature=0 /
        top_p=0.8 config; per-request params are the vLLM SamplingParams
        surface)."""
        if self._closed:
            raise RuntimeError("generation server closed")
        eos = eos_id if eos_id is not None else self.arch.eos_id
        req = _Request(prompt=list(prompt), max_new=max_new_tokens,
                       eos_id=int(eos), tokens=queue.Queue(),
                       result=Future(), temperature=temperature,
                       top_p=top_p)
        self._queue.put(req)
        return req

    def stream(self, prompt: List[int], max_new_tokens: int = 256,
               eos_id: Optional[int] = None,
               temperature: Optional[float] = None,
               top_p: Optional[float] = None,
               timeout: float = 300.0) -> Iterator[int]:
        """Yield token ids as decode chunks complete. Raises the server's
        device-lost error if recovery is exhausted mid-stream (a clean
        _END is reserved for successful completion)."""
        req = self.submit(prompt, max_new_tokens, eos_id,
                          temperature=temperature, top_p=top_p)
        while True:
            tok = req.tokens.get(timeout=timeout)
            if tok is _END:
                return
            if isinstance(tok, Exception):
                raise tok
            yield tok

    def generate(self, prompt: List[int], max_new_tokens: int = 256,
                 eos_id: Optional[int] = None,
                 temperature: Optional[float] = None,
                 top_p: Optional[float] = None,
                 timeout: float = 300.0) -> List[int]:
        return self.submit(prompt, max_new_tokens, eos_id,
                           temperature=temperature,
                           top_p=top_p).result.result(timeout)

    def close(self) -> None:
        self._queue.put(_END)
        self._thread.join(timeout=10)
