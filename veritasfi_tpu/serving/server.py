"""HTTP serving front (aiohttp): chat endpoints + SSE streaming.

The reference repo ships no server main — its ChatService returns an SSE
generator framed "data: {json}\\n\\n" implying a Flask/FastAPI front
(reference: vllmChatService.py:560, SURVEY.md §1 L5 note). This module is
that missing front: bearer-token auth (config bearer_token,
config/example.yaml:15), three answer endpoints mapping to the three
ChatService paths, session GC on an interval, and health/profiling routes.

Routes:
  POST /v1/chat         {question, session_id}            -> sync path
  POST /v1/chat/async   {question, session_id}            -> async-gather path
  POST /v1/chat/stream  {question, session_id}            -> text/event-stream
  GET  /v1/health
  GET  /v1/profiler
"""

from __future__ import annotations

import asyncio
import logging
from typing import Optional

from ..utils.profiler import profiler

logger = logging.getLogger(__name__)


def _rss_mb() -> float:
    """Resident set size in MB (proc statm; 0.0 where unavailable)."""
    try:
        with open("/proc/self/statm") as f:
            return round(int(f.read().split()[1]) * 4096 / 1e6, 1)
    except OSError:
        return 0.0


def create_app(stack, bearer_token: str = ""):
    from aiohttp import web

    service = stack.chat_service

    @web.middleware
    async def auth_middleware(request, handler):
        if bearer_token:
            import hmac

            header = request.headers.get("Authorization", "")
            # constant-time compare: a plain != leaks the token prefix
            # length through response timing. Compare BYTES: compare_digest
            # on str raises TypeError for non-ASCII input, so a crafted
            # header would turn the 401 into an unhandled 500
            if not hmac.compare_digest(
                    header.encode("utf-8", "surrogateescape"),
                    f"Bearer {bearer_token}".encode()):
                return web.json_response({"error": "unauthorized"},
                                         status=401)
        return await handler(request)

    async def _parse_body(request):
        """(question, session_id, body) or a 400 json_response — malformed
        input must not surface as a 500 HTML page."""
        try:
            body = await request.json()
        except Exception:
            return None, None, web.json_response(
                {"error": "request body must be JSON"}, status=400)
        if not isinstance(body, dict) or not isinstance(
                body.get("question"), str) or not body["question"]:
            return None, None, web.json_response(
                {"error": "missing or invalid 'question'"}, status=400)
        return body["question"], str(body.get("session_id", "default")), body

    async def handle_chat(request):
        question, session_id, body = await _parse_body(request)
        if question is None:
            return body
        answer, _, rag_info, rewrittens, hypo, _, _ = await asyncio.to_thread(
            service.generate_response_with_rag, question, session_id,
            body.get("internal_input"), body.get("interrupt_index"))
        return web.json_response({
            "answer": answer, "rewrittens": rewrittens,
            "rag_info": rag_info,
        })

    async def handle_chat_async(request):
        question, session_id, body = await _parse_body(request)
        if question is None:
            return body
        answer, _, rag_info, rewrittens, hypo, _, _ = await asyncio.to_thread(
            service.generate_response_async, question, session_id,
            body.get("internal_input"), body.get("interrupt_index"))
        return web.json_response({
            "answer": answer, "rewrittens": rewrittens,
            "rag_info": rag_info,
        })

    async def handle_chat_stream(request):
        question, session_id, body = await _parse_body(request)
        if question is None:
            return body
        response = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
        })
        await response.prepare(request)
        generator = service.generate_response_async_stream(question,
                                                           session_id)
        loop = asyncio.get_running_loop()
        sentinel = object()
        try:
            while True:
                frame = await loop.run_in_executor(
                    None, lambda: next(generator, sentinel))
                if frame is sentinel:
                    break
                await response.write(frame.encode("utf-8"))
            await response.write_eof()
        finally:
            # client disconnects mid-stream: run the generator's cleanup
            # (history commit, loop teardown, session lock release) NOW
            # instead of at GC time
            await loop.run_in_executor(None, generator.close)
        return response

    async def handle_health(request):
        rss = _rss_mb()
        limit = getattr(getattr(getattr(stack, "config", None), "serving",
                                None), "rss_limit_mb", 0)
        return web.json_response({
            "status": ("rss_over_limit" if limit and rss > limit else "ok"),
            "sessions": len(service.api_chat_manager),
            "retrievers": len(service.retrievers),
            # SOAK_r05 leak_localization: the serve path accrues ~17 KB of
            # LIVE native memory per request inside the device-client path
            # (not python retention, not glibc arena retention — arena cap
            # + periodic trims measurably did nothing). Until the platform
            # client is fixed, long-lived deployments must watch RSS and
            # recycle workers; this surfaces the number health checks need.
            "rss_mb": rss,
        })

    async def handle_profiler(request):
        return web.json_response(profiler.results())

    async def session_gc(app):
        rss_limit = getattr(getattr(getattr(stack, "config", None),
                                    "serving", None), "rss_limit_mb", 0)

        async def loop_gc():
            while True:
                await asyncio.sleep(60)
                try:
                    service.cleanup_old_sessions()
                    if rss_limit and _rss_mb() > rss_limit:
                        logger.warning(
                            "RSS %.0f MB exceeds serving.rss_limit_mb=%d "
                            "— recycle this worker (see SOAK_r05 "
                            "leak_localization)", _rss_mb(), rss_limit)
                except Exception:   # a single failure must not end GC forever
                    logger.exception("session GC sweep failed")

        task = asyncio.create_task(loop_gc())
        yield
        task.cancel()

    async def allocator_hygiene(app):
        # glibc arena retention mitigation (utils/allocator.py docstring;
        # SOAK_r04 diagnosis -> SOAK_r05 fix): cap arenas once, trim freed
        # pages back to the kernel on a period
        from ..utils.allocator import MallocTrimmer, set_arena_max

        sc = getattr(getattr(stack, "config", None), "serving", None)
        arena_max = getattr(sc, "malloc_arena_max", 2)
        trim_s = getattr(sc, "malloc_trim_s", 60.0)
        if arena_max:
            set_arena_max(arena_max)
        trimmer = MallocTrimmer(trim_s).start() if trim_s else None
        app["malloc_trimmer"] = trimmer
        yield
        if trimmer is not None:
            trimmer.stop()

    app = web.Application(middlewares=[auth_middleware])
    app.router.add_post("/v1/chat", handle_chat)
    app.router.add_post("/v1/chat/async", handle_chat_async)
    app.router.add_post("/v1/chat/stream", handle_chat_stream)
    app.router.add_get("/v1/health", handle_health)
    app.router.add_get("/v1/profiler", handle_profiler)
    app.cleanup_ctx.append(session_gc)
    app.cleanup_ctx.append(allocator_hygiene)
    return app


def serve(stack, host: str = "0.0.0.0", port: int = 8080,
          bearer_token: Optional[str] = None) -> None:
    from aiohttp import web

    token = (bearer_token if bearer_token is not None
             else stack.config.serving.bearer_token)
    app = create_app(stack, bearer_token=token)
    logger.info("serving on %s:%d", host, port)
    web.run_app(app, host=host, port=port)
