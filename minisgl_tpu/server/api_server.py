"""OpenAI-compatible HTTP frontend (aiohttp + SSE).

Role parity with /root/reference/python/minisgl/server/api_server.py:100-290
(there FastAPI/uvicorn): FrontendManager maps uid -> per-request asyncio
queue, a background listener drains the detokenizer's ZMQ stream, endpoints
/generate, /v1/completions, /v1/chat/completions (streaming + non-streaming),
/v1/models, /health, and client-disconnect abort (api_server.py:191-210).
Built on aiohttp's event loop — the only async HTTP stack in the image — with
hand-rolled SSE framing.
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Any, AsyncIterator, Dict, List, Optional, Union

from aiohttp import web

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.message import (
    AbortMsg,
    BaseTokenizerMsg,
    BatchFrontendMsg,
    MetricsMsg,
    MetricsSnapshot,
    ProfileMsg,
    TokenizeMsg,
    UserReply,
)
from minisgl_tpu.utils import ZmqAsyncPullQueue, ZmqAsyncPushQueue, init_logger

logger = init_logger(__name__, "APIServer")


class FrontendManager:
    """uid allocation + per-request reply queues over the ZMQ sockets."""

    def __init__(self, args):
        self.args = args
        self.send_queue: ZmqAsyncPushQueue[BaseTokenizerMsg] = ZmqAsyncPushQueue(
            args.zmq_tokenizer_addr, bind=True
        )
        self.recv_queue: ZmqAsyncPullQueue[BatchFrontendMsg] = ZmqAsyncPullQueue(
            args.zmq_frontend_addr, bind=True
        )
        self.queues: Dict[int, asyncio.Queue] = {}
        self.uid_counter = 0
        self._listener: Optional[asyncio.Task] = None
        self._metrics_futures: Dict[int, asyncio.Future] = {}
        self._metrics_nonce = 0

    def start(self) -> None:
        if self._listener is None:
            self._listener = asyncio.get_running_loop().create_task(
                self._listen()
            )

    async def _listen(self) -> None:
        while True:
            batch = await self.recv_queue.get()
            for reply in batch.data:
                if isinstance(reply, MetricsSnapshot):
                    fut = self._metrics_futures.pop(reply.nonce, None)
                    if fut is not None and not fut.done():
                        fut.set_result(reply.stats)
                    continue
                q = self.queues.get(reply.uid)
                if q is not None:
                    q.put_nowait(reply)

    async def request_metrics(self, timeout: float = 5.0) -> Dict[str, Any]:
        """Round-trip a MetricsMsg through tokenizer -> scheduler ->
        detokenizer and await the snapshot."""
        self._metrics_nonce += 1
        nonce = self._metrics_nonce
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        self._metrics_futures[nonce] = fut
        await self.send_queue.put(MetricsMsg(nonce=nonce))
        try:
            return await asyncio.wait_for(fut, timeout)
        finally:
            self._metrics_futures.pop(nonce, None)

    def new_user(self) -> int:
        uid = self.uid_counter
        self.uid_counter += 1
        self.queues[uid] = asyncio.Queue()
        return uid

    def finish_user(self, uid: int) -> None:
        self.queues.pop(uid, None)

    async def submit(
        self,
        uid: int,
        prompt: Union[str, List[dict], None],
        params: SamplingParams,
        input_ids: Optional[List[int]] = None,
    ) -> None:
        await self.send_queue.put(
            TokenizeMsg(
                uid=uid, text=prompt, sampling_params=params, input_ids=input_ids
            )
        )

    async def abort(self, uid: int) -> None:
        await self.send_queue.put(AbortMsg(uid=uid))
        self.finish_user(uid)

    async def stream_replies(
        self, uid: int, stop: Optional[List[str]] = None
    ) -> AsyncIterator:
        if not stop:
            q = self.queues[uid]
            while True:
                reply = await q.get()
                yield reply
                if reply.finished:
                    break
            self.finish_user(uid)
            return
        async for reply in self._stream_with_stop(uid, stop):
            yield reply

    async def _stream_with_stop(
        self, uid: int, stop: List[str]
    ) -> AsyncIterator:
        """OpenAI `stop` strings, matched on the DETOKENIZED text (stop
        sequences cross token boundaries). The last max(len)-1 characters
        are held back from emission so a match straddling chunk boundaries
        is caught before any of it streams out; on match the request is
        aborted backend-side and the final reply is truncated at the match.
        The reference has no stop-string support; usage on a stop-truncated
        reply counts completion tokens observed at the frontend (one
        DetokenizeMsg per token), prompt_tokens only arrives with a natural
        finish."""
        q = self.queues[uid]
        hold = max(len(s) for s in stop) - 1
        buf = ""
        n_tokens = 0
        while True:
            reply = await q.get()
            n_tokens += 1
            buf += reply.incremental_output
            hit = -1
            for s in stop:
                i = buf.find(s)
                if i != -1 and (hit == -1 or i < hit):
                    hit = i
            if hit != -1:
                yield UserReply(
                    uid=uid,
                    incremental_output=buf[:hit],
                    finished=True,
                    prompt_tokens=reply.prompt_tokens,
                    completion_tokens=reply.completion_tokens or n_tokens,
                    logprobs=reply.logprobs,
                )
                if not reply.finished:
                    # backend still generating: free its resources
                    await self.send_queue.put(AbortMsg(uid=uid))
                break
            if reply.finished:
                yield UserReply(
                    uid=uid,
                    incremental_output=buf,
                    finished=True,
                    prompt_tokens=reply.prompt_tokens,
                    completion_tokens=reply.completion_tokens,
                    logprobs=reply.logprobs,
                )
                break
            safe = len(buf) - hold
            if safe > 0:
                out, buf = buf[:safe], buf[safe:]
                yield UserReply(
                    uid=uid, incremental_output=out, finished=False,
                    logprobs=reply.logprobs,
                )
        self.finish_user(uid)


def _parse_sampling(body: Dict[str, Any]) -> SamplingParams:
    # explicit key check (not `or`-coercion): "max_tokens": 0 must be
    # rejected as invalid, not silently replaced by the default
    if "max_tokens" in body:
        max_tokens = body["max_tokens"]
    elif "max_completion_tokens" in body:
        max_tokens = body["max_completion_tokens"]
    else:
        max_tokens = 1024
    if not isinstance(max_tokens, int) or max_tokens <= 0:
        raise web.HTTPBadRequest(
            text=json.dumps(
                {
                    "error": {
                        "message": "max_tokens must be a positive integer",
                        "type": "invalid_request_error",
                    }
                }
            ),
            content_type="application/json",
        )
    # logprobs: chat style (logprobs: true + top_logprobs: N) or legacy
    # completions style (logprobs: N). Internal value = number of top
    # alternatives returned alongside the sampled token's logprob.
    lp = body.get("logprobs")
    if isinstance(lp, bool):
        n_lp = max(1, int(body.get("top_logprobs") or 0)) if lp else 0
    else:
        n_lp = int(lp or 0)
    temperature = body.get("temperature")
    return SamplingParams(
        logprobs=n_lp,
        seed=int(body.get("seed", 0) or 0),
        temperature=float(0.0 if temperature is None else temperature),
        top_k=int(body.get("top_k", -1) or -1),
        top_p=float(body.get("top_p", 1.0) or 1.0),
        min_p=float(body.get("min_p", 0.0) or 0.0),
        max_tokens=max_tokens,
        ignore_eos=bool(body.get("ignore_eos", False)),
        stop_token_ids=(
            [int(t) for t in body["stop_token_ids"]]
            if body.get("stop_token_ids")
            else None
        ),
    )


def _parse_stop(body: Dict[str, Any]) -> Optional[List[str]]:
    """OpenAI `stop`: a string or up to 4 non-empty strings."""
    stop = body.get("stop")
    if stop is None:
        return None
    if isinstance(stop, str):
        stop = [stop]
    if (
        not isinstance(stop, list)
        or len(stop) > 4
        or not all(isinstance(s, str) and s for s in stop)
    ):
        raise web.HTTPBadRequest(
            text=json.dumps(
                {
                    "error": {
                        "message": "stop must be a non-empty string or "
                        "a list of up to 4 non-empty strings",
                        "type": "invalid_request_error",
                    }
                }
            ),
            content_type="application/json",
        )
    return stop


def _parse_n(body: Dict[str, Any]) -> int:
    """OpenAI `n`: number of choices (each is its own backend request; the
    radix cache dedups their shared prompt KV)."""
    n = body.get("n", 1)
    if not isinstance(n, int) or not (1 <= n <= 8):
        raise web.HTTPBadRequest(
            text=json.dumps(
                {
                    "error": {
                        "message": "n must be an integer in [1, 8]",
                        "type": "invalid_request_error",
                    }
                }
            ),
            content_type="application/json",
        )
    return n


async def _sse_response(
    request: web.Request,
    gen: AsyncIterator[str],
    manager: "FrontendManager" = None,
    uid=None,
):
    resp = web.StreamResponse(
        headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
        }
    )
    await resp.prepare(request)
    try:
        async for chunk in gen:
            await resp.write(chunk.encode())
    except (asyncio.CancelledError, ConnectionResetError):
        # client went away mid-stream: stop generating server-side
        # (reference api_server.py:191-210)
        if manager is not None and uid is not None:
            for u in uid if isinstance(uid, list) else [uid]:
                await manager.abort(u)
        raise
    await resp.write_eof()
    return resp


@web.middleware
async def _error_middleware(request: web.Request, handler):
    try:
        return await handler(request)
    except json.JSONDecodeError:
        return web.json_response(
            {"error": {"message": "invalid JSON body", "type": "invalid_request_error"}},
            status=400,
        )
    except web.HTTPException:
        raise
    except Exception as e:  # surface scheduler/transport errors as 500 JSON
        logger.error(f"request failed: {e!r}")
        return web.json_response(
            {"error": {"message": str(e), "type": "internal_error"}}, status=500
        )


def build_app(manager: FrontendManager, args) -> web.Application:
    app = web.Application(middlewares=[_error_middleware])

    async def _startup(app):
        manager.start()

    app.on_startup.append(_startup)

    async def _collect(uid: int, request: web.Request, stop=None):
        """Gather the full completion + usage (+ per-token logprob
        entries); abort on client disconnect (reference
        api_server.py:191-210)."""
        chunks: List[str] = []
        lps: List[dict] = []
        usage = {"prompt_tokens": 0, "completion_tokens": 0, "total_tokens": 0}
        try:
            async for reply in manager.stream_replies(uid, stop):
                chunks.append(reply.incremental_output)
                if reply.logprobs is not None:
                    lps.append(reply.logprobs)
                if reply.finished:
                    usage = {
                        "prompt_tokens": reply.prompt_tokens,
                        "completion_tokens": reply.completion_tokens,
                        "total_tokens": reply.prompt_tokens
                        + reply.completion_tokens,
                    }
        except asyncio.CancelledError:
            await manager.abort(uid)
            raise
        return "".join(chunks), usage, lps

    async def health(request):
        return web.json_response({"status": "ok"})

    async def models(request):
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": args.model_name,
                        "object": "model",
                        "created": int(time.time()),
                        "owned_by": "minisgl-tpu",
                    }
                ],
            }
        )

    async def generate(request: web.Request):
        body = await request.json()
        params = _parse_sampling(body.get("sampling_params") or body)
        stop = _parse_stop(body)
        uid = manager.new_user()
        await manager.submit(
            uid, body.get("text"), params, input_ids=body.get("input_ids")
        )
        if body.get("stream"):
            async def gen():
                async for reply in manager.stream_replies(uid, stop):
                    yield (
                        "data: "
                        + json.dumps(
                            {
                                "text": reply.incremental_output,
                                "finished": reply.finished,
                            }
                        )
                        + "\n\n"
                    )
                yield "data: [DONE]\n\n"

            return await _sse_response(request, gen(), manager, uid)
        text, usage, lps = await _collect(uid, request, stop)
        out = {"text": text, "usage": usage}
        if lps:
            out["logprobs"] = lps
        return web.json_response(out)

    async def _collect_n(uids, request, stop):
        """n choices gathered concurrently; usage counts the prompt once
        and sums completions (OpenAI semantics)."""
        results = await asyncio.gather(
            *(_collect(u, request, stop) for u in uids)
        )
        usage = {
            "prompt_tokens": results[0][1]["prompt_tokens"],
            "completion_tokens": sum(r[1]["completion_tokens"] for r in results),
        }
        usage["total_tokens"] = (
            usage["prompt_tokens"] + usage["completion_tokens"]
        )
        return results, usage

    async def completions(request: web.Request):
        body = await request.json()
        params = _parse_sampling(body)
        stop = _parse_stop(body)
        n = _parse_n(body)
        uids = [manager.new_user() for _ in range(n)]
        for uid in uids:
            await manager.submit(uid, body.get("prompt", ""), params)
        rid = f"cmpl-{uuid.uuid4().hex[:24]}"
        if body.get("stream"):
            return await _sse_response(
                request,
                _openai_stream(
                    manager, uids, rid, args.model_name, "text", stop
                ),
                manager,
                uids,
            )
        results, usage = await _collect_n(uids, request, stop)
        choices = []
        for i, (text, _, lps) in enumerate(results):
            choice = {"index": i, "text": text, "finish_reason": "stop"}
            if lps:
                # legacy completions logprobs shape
                choice["logprobs"] = {
                    "tokens": [e["token"] for e in lps],
                    "token_logprobs": [e["logprob"] for e in lps],
                    "top_logprobs": [
                        {t["token"]: t["logprob"] for t in e["top_logprobs"]}
                        for e in lps
                    ],
                }
            choices.append(choice)
        return web.json_response(
            {
                "id": rid,
                "object": "text_completion",
                "created": int(time.time()),
                "model": args.model_name,
                "choices": choices,
                "usage": usage,
            }
        )

    async def chat_completions(request: web.Request):
        body = await request.json()
        params = _parse_sampling(body)
        stop = _parse_stop(body)
        n = _parse_n(body)
        uids = [manager.new_user() for _ in range(n)]
        for uid in uids:
            await manager.submit(uid, body.get("messages", []), params)
        rid = f"chatcmpl-{uuid.uuid4().hex[:24]}"
        if body.get("stream"):
            return await _sse_response(
                request,
                _openai_stream(
                    manager, uids, rid, args.model_name, "chat", stop
                ),
                manager,
                uids,
            )
        results, usage = await _collect_n(uids, request, stop)
        choices = []
        for i, (text, _, lps) in enumerate(results):
            choice = {
                "index": i,
                "message": {"role": "assistant", "content": text},
                "finish_reason": "stop",
            }
            if lps:
                choice["logprobs"] = {"content": lps}
            choices.append(choice)
        return web.json_response(
            {
                "id": rid,
                "object": "chat.completion",
                "created": int(time.time()),
                "model": args.model_name,
                "choices": choices,
                "usage": usage,
            }
        )

    async def profile(request: web.Request):
        """POST {"action": "start"|"stop", "log_dir": ...} — on-demand
        jax.profiler device trace in the scheduler process."""
        body = await request.json()
        await manager.send_queue.put(
            ProfileMsg(
                action=body.get("action", "start"),
                log_dir=body.get("log_dir", "/tmp/minisgl_tpu_trace"),
            )
        )
        return web.json_response({"ok": True})

    async def metrics(request: web.Request):
        """Scheduler counters incl. the north-star radix hit rate
        (scheduler/metrics.py)."""
        try:
            stats = await manager.request_metrics()
        except asyncio.TimeoutError:
            return web.json_response(
                {"error": {"message": "metrics timeout"}}, status=504
            )
        return web.json_response(stats)

    app.router.add_get("/metrics", metrics)
    app.router.add_post("/debug/profile", profile)
    app.router.add_get("/health", health)
    app.router.add_get("/v1/models", models)
    app.router.add_post("/generate", generate)
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/chat/completions", chat_completions)
    return app


async def _openai_stream(manager, uid, rid, model, kind, stop=None):
    """SSE chunk stream over one or more choice uids (OpenAI `n`): each
    chunk carries its choice index; [DONE] after every choice finishes."""
    uids = uid if isinstance(uid, list) else [uid]
    created = int(time.time())
    q: asyncio.Queue = asyncio.Queue()

    async def pump(i: int, u: int) -> None:
        async for reply in manager.stream_replies(u, stop):
            await q.put((i, reply))
        await q.put((i, None))

    tasks = [
        asyncio.get_running_loop().create_task(pump(i, u))
        for i, u in enumerate(uids)
    ]
    done = 0
    try:
        while done < len(uids):
            i, reply = await q.get()
            if reply is None:
                done += 1
                continue
            if kind == "chat":
                choice = {
                    "index": i,
                    "delta": {"content": reply.incremental_output},
                    "finish_reason": "stop" if reply.finished else None,
                }
                if reply.logprobs is not None:
                    choice["logprobs"] = {"content": [reply.logprobs]}
                chunk = {
                    "id": rid,
                    "object": "chat.completion.chunk",
                    "created": created,
                    "model": model,
                    "choices": [choice],
                }
            else:
                chunk = {
                    "id": rid,
                    "object": "text_completion",
                    "created": created,
                    "model": model,
                    "choices": [
                        {
                            "index": i,
                            "text": reply.incremental_output,
                            "finish_reason": (
                                "stop" if reply.finished else None
                            ),
                        }
                    ],
                }
            yield "data: " + json.dumps(chunk) + "\n\n"
        yield "data: [DONE]\n\n"
    finally:
        for t in tasks:
            t.cancel()


def run_api_server(manager: FrontendManager, args) -> None:
    app = build_app(manager, args)
    logger.info(f"serving on http://{args.host}:{args.port}")
    web.run_app(
        app, host=args.host, port=args.port, print=None, access_log=None
    )


async def run_shell(manager: FrontendManager, args) -> None:
    """Interactive chat shell (reference api_server.py:340-400)."""
    manager.start()
    history: List[dict] = []
    print("minisgl-tpu shell — /reset clears history, /exit quits")
    loop = asyncio.get_running_loop()
    while True:
        try:
            line = await loop.run_in_executor(None, input, ">>> ")
        except (EOFError, KeyboardInterrupt):
            break
        line = line.strip()
        if not line:
            continue
        if line == "/exit":
            break
        if line == "/reset":
            history = []
            continue
        history.append({"role": "user", "content": line})
        uid = manager.new_user()
        await manager.submit(uid, history, _parse_sampling({}))
        chunks: List[str] = []
        async for reply in manager.stream_replies(uid):
            print(reply.incremental_output, end="", flush=True)
            chunks.append(reply.incremental_output)
        print()
        history.append({"role": "assistant", "content": "".join(chunks)})
