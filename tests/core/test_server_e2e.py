"""Full serving-plane integration on CPU: launches the real process tree
(api server + tokenizers + detokenizer + scheduler) against the generated
fixture model and drives it over HTTP — the expanded version of the
reference's wire-protocol impersonation test
(/root/reference/tests/core/test_scheduler.py:26-73)."""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

from tests.make_fixture import make_fixture


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    model_dir = make_fixture(str(tmp_path_factory.mktemp("fixture")))
    port = _free_port()
    env = dict(os.environ)
    env["MINISGL_FORCE_CPU"] = "1"
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "minisgl_tpu",
            "--model", model_dir, "--dummy-weight",
            "--port", str(port), "--max-seq-len", "256",
            "--num-pages", "256", "--max-running-req", "8",
            "--attention-backend", "xla", "--num-tokenizers", "1",
            # radix matching is page-granular; the metrics test's short
            # repeated prompts need a fine page to produce a cache hit
            "--page-size", "16",
        ],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        start_new_session=True,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(f"{base}/health", timeout=2) as r:
                if r.status == 200:
                    break
        except Exception:
            if proc.poll() is not None:
                out = proc.stdout.read().decode()
                raise RuntimeError(f"server died:\n{out[-3000:]}")
            time.sleep(1)
    else:
        proc.kill()
        raise RuntimeError("server did not become healthy")
    yield base
    proc.terminate()
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


def _post(url, body, timeout=120):
    req = urllib.request.Request(
        url,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_generate_text(server):
    status, out = _post(
        f"{server}/generate",
        {"text": "hello", "max_tokens": 6, "ignore_eos": True},
    )
    assert status == 200 and isinstance(out["text"], str)


def test_generate_input_ids(server):
    status, out = _post(
        f"{server}/generate",
        {"input_ids": [40, 41, 42], "max_tokens": 4, "ignore_eos": True},
    )
    assert status == 200


def test_chat_completion(server):
    status, out = _post(
        f"{server}/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4,
            "ignore_eos": True,
        },
    )
    assert status == 200
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_streaming_sse(server):
    body = json.dumps(
        {"text": "abc", "max_tokens": 4, "ignore_eos": True, "stream": True}
    ).encode()
    req = urllib.request.Request(
        f"{server}/generate",
        data=body,
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                chunks.append(line[6:])
    assert chunks[-1] == "[DONE]"
    assert any(json.loads(c).get("finished") for c in chunks[:-1])


def test_models_endpoint(server):
    with urllib.request.urlopen(f"{server}/v1/models", timeout=10) as r:
        out = json.loads(r.read())
    assert out["data"][0]["object"] == "model"


def test_bad_json_is_400(server):
    req = urllib.request.Request(
        f"{server}/generate",
        data=b"not json",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_profile_endpoint(server):
    status, out = _post(
        f"{server}/debug/profile", {"action": "start", "log_dir": "/tmp/mslt_prof_test"}
    )
    assert status == 200 and out["ok"]
    time.sleep(1)
    status, out = _post(f"{server}/debug/profile", {"action": "stop"})
    assert status == 200


def test_metrics_endpoint(server):
    """North-star serving metrics: counters + radix hit rate reportable from
    a live server (scheduler/metrics.py round trip)."""
    # identical prompts: the second admission should hit the radix cache
    long_prompt = {"input_ids": list(range(50, 114)), "max_tokens": 3,
                   "ignore_eos": True}
    _post(f"{server}/generate", long_prompt)
    _post(f"{server}/generate", long_prompt)
    with urllib.request.urlopen(f"{server}/metrics", timeout=10) as r:
        stats = json.loads(r.read())
    assert stats["reqs_received"] >= 2
    assert stats["reqs_finished"] >= 2
    assert stats["prefill_computed_tokens"] > 0
    assert stats["decode_tokens"] > 0
    assert stats["pages_total"] == 256
    # second identical prompt must have matched a cached prefix
    assert stats["prefill_cached_tokens"] > 0
    assert 0.0 < stats["radix_hit_rate"] < 1.0


def test_max_tokens_zero_rejected(server):
    req = urllib.request.Request(
        f"{server}/generate",
        data=json.dumps({"text": "x", "max_tokens": 0}).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_stop_string_truncates(server):
    # learn the deterministic greedy output, then stop on a mid-output
    # substring: the reply must cut exactly before the match and the
    # backend request must be aborted (not run to max_tokens)
    body = {"text": "stoptest", "max_tokens": 10, "ignore_eos": True}
    status, full = _post(f"{server}/generate", body)
    assert status == 200 and len(full["text"]) > 3
    text = full["text"]
    needle = text[len(text) // 2 : len(text) // 2 + 2]
    status, out = _post(f"{server}/generate", {**body, "stop": needle})
    assert status == 200
    assert needle not in out["text"]
    assert out["text"] == text[: text.index(needle)]


def test_stop_invalid_is_400(server):
    req = urllib.request.Request(
        f"{server}/v1/chat/completions",
        data=json.dumps(
            {
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4,
                "stop": ["", "x"],
            }
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_chat_logprobs(server):
    status, out = _post(
        f"{server}/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4,
            "ignore_eos": True,
            "logprobs": True,
            "top_logprobs": 2,
        },
    )
    assert status == 200
    content = out["choices"][0]["logprobs"]["content"]
    assert len(content) == 4
    for e in content:
        assert isinstance(e["token"], str)
        assert e["logprob"] <= 0.0
        assert len(e["top_logprobs"]) == 2
        # greedy: the sampled token IS the top-1 candidate
        assert abs(e["top_logprobs"][0]["logprob"] - e["logprob"]) < 1e-4
        # top list is sorted descending
        assert (
            e["top_logprobs"][0]["logprob"]
            >= e["top_logprobs"][1]["logprob"]
        )


def test_completions_legacy_logprobs(server):
    status, out = _post(
        f"{server}/v1/completions",
        {
            "prompt": "hello",
            "max_tokens": 3,
            "ignore_eos": True,
            "logprobs": 2,
        },
    )
    assert status == 200
    lp = out["choices"][0]["logprobs"]
    assert len(lp["tokens"]) == 3
    assert len(lp["token_logprobs"]) == 3
    # two alternatives per position (distinct ids may decode to the same
    # string in the byte-level fixture tokenizer, collapsing dict keys)
    assert all(1 <= len(d) <= 2 for d in lp["top_logprobs"])


def test_n_choices(server):
    status, out = _post(
        f"{server}/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4,
            "ignore_eos": True,
            "temperature": 0.9,
            "n": 3,
        },
    )
    assert status == 200
    assert [c["index"] for c in out["choices"]] == [0, 1, 2]
    assert all(
        isinstance(c["message"]["content"], str) for c in out["choices"]
    )
    u = out["usage"]
    assert u["completion_tokens"] == 12  # 3 choices x 4 tokens
    assert u["total_tokens"] == u["prompt_tokens"] + 12


def test_n_invalid_is_400(server):
    req = urllib.request.Request(
        f"{server}/v1/chat/completions",
        data=json.dumps(
            {
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4,
                "n": 0,
            }
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_n_streaming_indices(server):
    body = json.dumps(
        {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 3,
            "ignore_eos": True,
            "temperature": 0.9,
            "n": 2,
            "stream": True,
        }
    ).encode()
    req = urllib.request.Request(
        f"{server}/v1/chat/completions",
        data=body,
        headers={"Content-Type": "application/json"},
    )
    seen = set()
    finished = set()
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            c = json.loads(line[6:])["choices"][0]
            seen.add(c["index"])
            if c["finish_reason"] == "stop":
                finished.add(c["index"])
    assert seen == {0, 1}
    assert finished == {0, 1}
