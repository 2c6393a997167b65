"""Streaming intent server tests: protocol round trip over a Unix socket,
multi-session isolation, and agreement with the direct recognizer path."""

import asyncio
import json

import numpy as np
import pytest
import jax

from speech_intent_recognizer_tpu.infer.server import (
    IntentServer, encode_chunk)


def _speech_like(rng, n, amp=0.2):
    return (amp * np.sin(2 * np.pi * 300 * np.arange(n) / 16000)
            + 0.02 * rng.standard_normal(n)).astype(np.float32)


@pytest.fixture(scope="module")
def predictor():
    from speech_intent_recognizer_tpu.infer.predict import Predictor
    from speech_intent_recognizer_tpu.models.cnn_gru import (
        CNNAudioGRU, init_model)

    model = CNNAudioGRU(num_classes=4)
    variables = init_model(model, jax.random.key(0))
    label_map = {f"intent_{i}": i for i in range(4)}
    return Predictor(model, variables, label_map)


async def _jsonl_client(path):
    reader, writer = await asyncio.open_unix_connection(path)

    async def send(obj):
        writer.write((json.dumps(obj) + "\n").encode())
        await writer.drain()

    async def recv(timeout=30.0):
        line = await asyncio.wait_for(reader.readline(), timeout)
        assert line, "server closed the connection"
        return json.loads(line)

    return send, recv, writer


def _stream_utterance(rng, chunk=1024):
    """1 s of speech + enough silence to trip the 0.4 s silence limit."""
    speech = _speech_like(rng, 16000)
    silence = np.zeros(16000, np.float32)
    x = np.concatenate([speech, silence])
    return [x[i : i + chunk] for i in range(0, len(x) - chunk, chunk)]


class TestIntentServer:
    def _run(self, coro):
        return asyncio.run(coro)

    def test_end_to_end_result(self, predictor, tmp_path, rng):
        sock = str(tmp_path / "sir.sock")
        server = IntentServer(predictor, silence_limit=0.4)

        async def scenario():
            srv = await server.start(socket_path=sock)
            send, recv, writer = await _jsonl_client(sock)
            for c in _stream_utterance(rng):
                await send({"op": "chunk", "session": "a",
                            "pcm": encode_chunk(c)})
            msg = await recv()
            writer.close()
            srv.close()
            await srv.wait_closed()
            return msg

        msg = self._run(scenario())
        assert msg["event"] == "result" and msg["session"] == "a"
        assert msg["predicted_label"] in predictor.label_map
        assert 0.0 < msg["confidence"] <= 1.0
        probs = [p["probability"] for p in msg["top_predictions"]]
        assert probs == sorted(probs, reverse=True)

    def test_matches_direct_recognizer(self, predictor, tmp_path, rng):
        from speech_intent_recognizer_tpu.infer.streaming import (
            StreamingRecognizer)

        chunks = _stream_utterance(rng)
        direct = StreamingRecognizer(predictor, silence_limit=0.4)
        direct_result = None
        for c in chunks:
            r = direct.feed(c)
            if r is not None:
                direct_result = r
        assert direct_result is not None

        sock = str(tmp_path / "sir2.sock")
        server = IntentServer(predictor, silence_limit=0.4)

        async def scenario():
            srv = await server.start(socket_path=sock)
            send, recv, writer = await _jsonl_client(sock)
            for c in chunks:
                await send({"op": "chunk", "session": "x",
                            "pcm": encode_chunk(c)})
            msg = await recv()
            writer.close()
            srv.close()
            await srv.wait_closed()
            return msg

        msg = self._run(scenario())
        assert msg["predicted_label"] == direct_result["predicted_label"]
        assert abs(msg["confidence"]
                   - direct_result["confidence"]) < 1e-5

    def test_two_sessions_isolated(self, predictor, tmp_path, rng):
        """Interleaved chunks from two sessions must produce two results,
        one per session."""
        sock = str(tmp_path / "sir3.sock")
        server = IntentServer(predictor, silence_limit=0.4)
        ca = _stream_utterance(rng)
        cb = _stream_utterance(np.random.default_rng(99))

        async def scenario():
            srv = await server.start(socket_path=sock)
            send, recv, writer = await _jsonl_client(sock)
            for a, b in zip(ca, cb):
                await send({"op": "chunk", "session": "a",
                            "pcm": encode_chunk(a)})
                await send({"op": "chunk", "session": "b",
                            "pcm": encode_chunk(b)})
            got = [await recv(), await recv()]
            writer.close()
            srv.close()
            await srv.wait_closed()
            return got

        got = self._run(scenario())
        assert {m["session"] for m in got} == {"a", "b"}
        for m in got:
            assert m["event"] == "result"

    def test_flush_and_partial_and_errors(self, predictor, tmp_path, rng):
        sock = str(tmp_path / "sir4.sock")
        server = IntentServer(predictor, silence_limit=10.0)  # never auto
        speech = _speech_like(rng, 8192)

        async def scenario():
            srv = await server.start(socket_path=sock)
            send, recv, writer = await _jsonl_client(sock)
            await send({"op": "nope", "session": "z"})
            err = await recv()
            for i in range(0, 8192, 1024):
                await send({"op": "chunk", "session": "z",
                            "pcm": encode_chunk(speech[i : i + 1024])})
            await send({"op": "partial", "session": "z"})
            partial = await recv()
            await send({"op": "flush", "session": "z"})
            result = await recv()
            writer.close()
            srv.close()
            await srv.wait_closed()
            return err, partial, result

        err, partial, result = self._run(scenario())
        assert err["event"] == "error"
        assert partial["event"] == "partial"
        assert result["event"] == "result"
        assert result["predicted_label"] in predictor.label_map
