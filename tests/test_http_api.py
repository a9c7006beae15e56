"""HTTP serving front-end tests (stdlib client against a live server).

The server wraps a ServingEngine behind /v1/completions (blocking +
streaming NDJSON), /v1/cancel, and /health; tokens must match driving
the engine directly.
"""

import json
import urllib.request

import numpy as np
import pytest

import jax

from aule_tpu.models import llama
from aule_tpu.serving.engine import ServingEngine
from aule_tpu.serving.http_api import ServingHTTPServer

CFG = llama.LlamaConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return llama.init_params(CFG, jax.random.key(0))


def make_engine(params, **kw):
    return ServingEngine(params, CFG, max_batch=2, page_size=16,
                         num_pages=64, max_pages_per_seq=8,
                         max_seq_len=256, **kw)


def post(port, path, obj, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def test_completions_and_health(params):
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, size=7).astype(np.int32)

    direct = make_engine(params)
    direct.submit(prompt, max_new_tokens=6, logprobs=True)
    want = direct.run()[0]

    with ServingHTTPServer(make_engine(params)) as srv:
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/health", timeout=60).read())
        assert health["status"] == "ok"
        out = post(srv.port, "/v1/completions",
                   {"prompt": prompt.tolist(), "max_tokens": 6,
                    "logprobs": True})
        assert out["tokens"] == want.output
        np.testing.assert_allclose(out["logprobs"], want.logprobs,
                                   atol=1e-5)
        assert not out["cancelled"]


def test_streaming_ndjson(params):
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 256, size=6).astype(np.int32)
    direct = make_engine(params)
    direct.submit(prompt, max_new_tokens=5)
    want = direct.run()[0].output

    with ServingHTTPServer(make_engine(params)) as srv:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps({"prompt": prompt.tolist(), "max_tokens": 5,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        lines = []
        with urllib.request.urlopen(req, timeout=300) as resp:
            for raw in resp:
                if raw.strip():
                    lines.append(json.loads(raw))
        toks = [ln["token"] for ln in lines if "token" in ln]
        assert toks == want
        assert lines[-1]["done"] and not lines[-1]["cancelled"]


def test_concurrent_requests_batch(params):
    """Two blocking requests in flight share the engine batch; each gets
    its own solo-run tokens back."""
    import threading

    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 256, size=n).astype(np.int32)
               for n in (5, 9)]
    wants = []
    for p in prompts:
        eng = make_engine(params)
        eng.submit(p, max_new_tokens=4)
        wants.append(eng.run()[0].output)

    with ServingHTTPServer(make_engine(params)) as srv:
        outs = [None, None]

        def go(i):
            outs[i] = post(srv.port, "/v1/completions",
                           {"prompt": prompts[i].tolist(),
                            "max_tokens": 4})

        ts = [threading.Thread(target=go, args=(i,)) for i in (0, 1)]
        [t.start() for t in ts]
        [t.join(timeout=600) for t in ts]
        assert [o["tokens"] for o in outs] == wants


def test_cancel_endpoint(params):
    rng = np.random.default_rng(3)
    with ServingHTTPServer(make_engine(params)) as srv:
        out = post(srv.port, "/v1/cancel", {"id": 12345})
        assert out["cancelled"] is False
        # bad request surfaces as 400, not a hung connection
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps({"max_tokens": 4}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400


def test_driver_death_fails_loudly(params):
    """An exception inside engine.step() must not leave clients hanging:
    in-flight requests get a 500, new ones a 503, /health flips to
    error (code-review r3 finding: silently dead server)."""
    import threading

    eng = make_engine(params)
    boom = RuntimeError("injected device failure")

    def bad_step():
        raise boom

    with ServingHTTPServer(eng) as srv:
        eng.step = bad_step
        rng = np.random.default_rng(4)
        prompt = rng.integers(0, 256, size=5).astype(np.int32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps({"prompt": prompt.tolist(),
                             "max_tokens": 4}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=120)
        assert ei.value.code == 500
        # subsequent requests are rejected immediately
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 503
        # health reports the failure
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/health", timeout=60)
        assert ei.value.code == 500
        assert "injected" in json.loads(ei.value.read())["error"]


def test_cancel_endpoint_bad_input(params):
    with ServingHTTPServer(make_engine(params)) as srv:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/cancel",
            data=json.dumps({}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400


def test_streaming_disconnect_cancels(params):
    """Closing the connection mid-stream frees the request's slot and
    pages instead of generating to max_tokens."""
    import http.client
    import time

    with ServingHTTPServer(make_engine(params)) as srv:
        rng = np.random.default_rng(5)
        prompt = rng.integers(0, 256, size=6).astype(np.int32)
        conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                          timeout=120)
        conn.request("POST", "/v1/completions",
                     json.dumps({"prompt": prompt.tolist(),
                                 "max_tokens": 200, "stream": True}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        resp.readline()  # one token arrived; the request is running
        conn.close()     # client disconnect
        deadline = time.time() + 240
        while time.time() < deadline:
            health = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/health",
                timeout=60).read())
            if health["running"] == 0 and health["waiting"] == 0:
                break
            time.sleep(0.5)
        else:
            pytest.fail("orphaned stream still running after 240s")
        assert health["tokens_generated"] < 200
