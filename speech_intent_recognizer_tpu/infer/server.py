"""Multi-session streaming intent server.

The reference's live path is a single-session mic loop
(``scripts/testing.py:63-170``).  This is its production counterpart: an
asyncio server multiplexing many concurrent audio sessions over one
accelerator, built on the same streaming machinery `bench_serve.py`
measures — per-session :class:`StreamingRecognizer` with shared compiled
functions (one compilation serves every session) and asynchronous
end-of-utterance results (``async_results=True``: the device call is
dispatched without blocking the event loop; results drain in batched
fetches between reads).

Wire protocol: newline-delimited JSON over a Unix or TCP socket.

  client -> {"op": "chunk",  "session": "s1", "pcm": "<base64 float32>"}
  client -> {"op": "partial","session": "s1"}   (mid-utterance hypothesis)
  client -> {"op": "flush",  "session": "s1"}   (force end-of-utterance)
  client -> {"op": "close",  "session": "s1"}
  server -> {"event": "result",  "session": "s1", "predicted_label": ...,
             "confidence": ..., "top_predictions": [...]}
  server -> {"event": "partial", ...} / {"event": "error", "message": ...}

Capacity numbers and the host/chip ceiling decomposition live in
``bench_serve.py`` / BENCH_NOTES.md; this module is the deployable
surface.
"""

from __future__ import annotations

import asyncio
import base64
import json
import logging
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


class IntentServer:
    """Session-multiplexing streaming server around one Predictor."""

    def __init__(self, predictor, chunk_size: int = 1024,
                 threshold: float = 0.01, silence_limit: float = 1.0,
                 drain_interval: float = 0.05, batch_finalize: bool = True):
        from speech_intent_recognizer_tpu.infer.streaming import (
            BatchFinalizer)

        self.predictor = predictor
        self.chunk_size = chunk_size
        self.threshold = threshold
        self.silence_limit = silence_limit
        self.drain_interval = drain_interval
        # One shared batcher: end-of-utterance calls from ALL sessions in a
        # drain tick dispatch as one device program (per-dispatch link cost
        # is the capacity ceiling — BENCH_NOTES.md).
        self.batcher = BatchFinalizer(predictor) if batch_finalize else None
        self._server: Optional[asyncio.AbstractServer] = None

    # ------------------------------------------------------------ sessions

    def _new_recognizer(self):
        from speech_intent_recognizer_tpu.infer.streaming import (
            StreamingRecognizer)

        return StreamingRecognizer(
            self.predictor, chunk_size=self.chunk_size,
            threshold=self.threshold, silence_limit=self.silence_limit,
            async_results=True, batch_finalizer=self.batcher)

    # ------------------------------------------------------- one connection

    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter) -> None:
        sessions: Dict[str, object] = {}
        pending: list = []  # (session_id, PendingResult)
        send_lock = asyncio.Lock()
        closed = asyncio.Event()

        async def send(obj: dict) -> None:
            async with send_lock:
                writer.write((json.dumps(obj) + "\n").encode())
                await writer.drain()

        async def drain_loop() -> None:
            """Push finished async results without blocking reads."""
            from speech_intent_recognizer_tpu.infer.streaming import (
                PendingResult)

            while not closed.is_set():
                if self.batcher is not None:
                    self.batcher.flush()
                ready = [(sid, r) for sid, r in pending if r.ready()]
                if ready:
                    for item in ready:
                        pending.remove(item)
                    PendingResult.get_all([r for _, r in ready])
                    for sid, r in ready:
                        await send({"event": "result", "session": sid,
                                    **r.resolve()})
                try:
                    await asyncio.wait_for(closed.wait(),
                                           timeout=self.drain_interval)
                except asyncio.TimeoutError:
                    pass

        drainer = asyncio.ensure_future(drain_loop())
        try:
            while True:
                line = await reader.readline()
                if not line:
                    break
                try:
                    msg = json.loads(line)
                    op = msg["op"]
                    sid = str(msg.get("session", "default"))
                except (ValueError, KeyError) as e:
                    await send({"event": "error",
                                "message": f"bad message: {e}"})
                    continue
                if op == "chunk":
                    rec = sessions.get(sid)
                    if rec is None:
                        rec = sessions[sid] = self._new_recognizer()
                    try:
                        pcm = np.frombuffer(
                            base64.b64decode(msg["pcm"]), np.float32)
                    except (KeyError, ValueError) as e:
                        await send({"event": "error", "session": sid,
                                    "message": f"bad pcm: {e}"})
                        continue
                    result = rec.feed(pcm)
                    if result is not None:
                        pending.append((sid, result))
                elif op == "partial":
                    rec = sessions.get(sid)
                    out = rec.partial_result() if rec is not None else None
                    await send({"event": "partial", "session": sid,
                                **(dict(out) if out else {"recording":
                                                          False})})
                elif op == "flush":
                    rec = sessions.get(sid)
                    result = rec.flush() if rec is not None else None
                    if result is not None:
                        pending.append((sid, result))
                elif op == "close":
                    sessions.pop(sid, None)
                else:
                    await send({"event": "error", "session": sid,
                                "message": f"unknown op {op!r}"})
        finally:
            closed.set()
            await drainer
            writer.close()
            try:
                await writer.wait_closed()
            except (ConnectionError, OSError):
                pass

    # -------------------------------------------------------------- runner

    async def start(self, socket_path: Optional[str] = None,
                    host: Optional[str] = None,
                    port: Optional[int] = None) -> asyncio.AbstractServer:
        if socket_path:
            self._server = await asyncio.start_unix_server(
                self._handle, path=socket_path)
            logger.info("intent server on unix socket %s", socket_path)
        else:
            self._server = await asyncio.start_server(
                self._handle, host or "127.0.0.1", port or 7071)
            logger.info("intent server on %s:%d", host or "127.0.0.1",
                        port or 7071)
        return self._server

    async def serve_forever(self, **kwargs) -> None:
        server = await self.start(**kwargs)
        async with server:
            await server.serve_forever()


def encode_chunk(pcm: np.ndarray) -> str:
    """Client-side helper: float32 PCM -> base64 payload."""
    return base64.b64encode(
        np.ascontiguousarray(pcm, np.float32).tobytes()).decode()
