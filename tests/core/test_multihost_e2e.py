"""Two-process multi-host serving: TP=2 spans two OS processes (one CPU
device each) through jax.distributed, with the request stream lockstepped by
the counted ZMQ broadcast. The test impersonates the tokenizer/detokenizer
over the real wire protocol (the reference's fake-frontend pattern,
tests/core/test_scheduler.py:26-73, extended across "hosts")."""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.message import BatchBackendMsg, ExitMsg, UserMsg
from minisgl_tpu.utils import ZmqPullQueue, ZmqPushQueue


def _free_port_block():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_tp2_lockstep(tmp_path):
    from tests.helpers import save_tiny_hf_model

    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    save_tiny_hf_model(model_dir, "llama")

    base_port = _free_port_block()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(base_port), model_dir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            start_new_session=True,
        )
        for rank in (0, 1)
    ]
    suffix = f".mh{base_port}"
    feeder = ZmqPushQueue(f"ipc:///tmp/minisgl_tpu_0{suffix}", bind=False)
    sink = ZmqPullQueue(f"ipc:///tmp/minisgl_tpu_1{suffix}", bind=True)

    try:
        # wait for engines (weights + jax.distributed + warmupless init)
        deadline = time.time() + 240
        msg = UserMsg(
            uid=1,
            input_ids=np.asarray([3, 5, 7, 9], np.int32),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=6, ignore_eos=True
            ),
        )
        feeder.put(BatchBackendMsg(data=[msg]))

        tokens = []
        while time.time() < deadline and len(tokens) < 6:
            for p in procs:
                if p.poll() is not None:
                    out = p.stdout.read().decode()
                    raise RuntimeError(f"worker died:\n{out[-4000:]}")
            batch = sink.get(block=False)
            if batch is None:
                time.sleep(0.5)
                continue
            for d in batch.data:
                tokens.append(d.next_token)
                if d.finished:
                    break
        assert len(tokens) == 6, f"got {tokens}"

        # single-process reference must produce identical greedy tokens
        from minisgl_tpu.llm import LLM

        ref = LLM(
            model_dir,
            use_dummy_weight=True,
            max_running_req=4,
            max_seq_len_override=128,
            num_page_override=128,
            page_size=4,
            cache_type="naive",
            attention_backend="xla",
        ).generate(
            [[3, 5, 7, 9]],
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        )
        assert tokens == ref[0]["token_ids"], (tokens, ref[0]["token_ids"])

        feeder.put(BatchBackendMsg(data=[ExitMsg()]))
        for p in procs:
            p.wait(timeout=30)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        feeder.stop()
        sink.stop()


def test_imbalanced_kv_sizing_rejected(tmp_path):
    """Deliberately unequal per-host page counts must hard-error (>5%
    imbalance), not silently diverge the lockstep page tables."""
    from tests.helpers import save_tiny_hf_model

    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    save_tiny_hf_model(model_dir, "llama")

    base_port = _free_port_block()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(base_port), model_dir,
             str(pages)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            start_new_session=True,
        )
        for rank, pages in ((0, 128), (1, 96))
    ]
    try:
        deadline = time.time() + 180
        outs = [b"", b""]
        while time.time() < deadline and any(p.poll() is None for p in procs):
            time.sleep(1)
        for i, p in enumerate(procs):
            assert p.poll() is not None, "worker should have exited with error"
            outs[i] = p.stdout.read()
        assert any(b"imbalance" in o for o in outs), outs
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


def test_two_process_lockstep_pipelined(tmp_path):
    """Lockstep x pipelined fetch x decode bursts: both hosts keep 2
    batches in flight and fuse K=2 decode steps; tokens must still be
    exact vs a single-process run. This is the riskiest interaction in the
    scheduler — every host must make byte-identical scheduling decisions
    while its result processing runs two iterations behind."""
    from tests.helpers import save_tiny_hf_model

    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    save_tiny_hf_model(model_dir, "llama")

    base_port = _free_port_block()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(base_port), model_dir,
             "128", "2", "2"],  # pages, pipeline_depth=2, decode_steps=2
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            start_new_session=True,
        )
        for rank in (0, 1)
    ]
    suffix = f".mh{base_port}"
    feeder = ZmqPushQueue(f"ipc:///tmp/minisgl_tpu_0{suffix}", bind=False)
    sink = ZmqPullQueue(f"ipc:///tmp/minisgl_tpu_1{suffix}", bind=True)

    try:
        deadline = time.time() + 240
        msgs = [
            UserMsg(
                uid=uid,
                input_ids=np.asarray(ids, np.int32),
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=6, ignore_eos=True
                ),
            )
            for uid, ids in ((1, [3, 5, 7, 9]), (2, [11, 13, 17]))
        ]
        feeder.put(BatchBackendMsg(data=msgs))

        tokens = {1: [], 2: []}
        while time.time() < deadline and (
            len(tokens[1]) < 6 or len(tokens[2]) < 6
        ):
            for p in procs:
                if p.poll() is not None:
                    out = p.stdout.read().decode()
                    raise RuntimeError(f"worker died:\n{out[-4000:]}")
            batch = sink.get(block=False)
            if batch is None:
                time.sleep(0.5)
                continue
            for d in batch.data:
                tokens[d.uid].append(d.next_token)
        assert len(tokens[1]) == 6 and len(tokens[2]) == 6, tokens

        from minisgl_tpu.llm import LLM

        # reference at the SAME tp=2 sharding (different shardings sum in
        # different orders; near-tie logits can flip greedy argmax between
        # tp=1 and tp=2 — this test checks lockstep/pipeline semantics,
        # so numerics must match), single process, depth 1, K=1
        ref = LLM(
            model_dir,
            use_dummy_weight=True,
            tp_size=2,
            max_running_req=4,
            max_seq_len_override=128,
            num_page_override=128,
            page_size=4,
            cache_type="naive",
            attention_backend="xla",
        ).generate(
            [[3, 5, 7, 9], [11, 13, 17]],
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        )
        assert tokens[1] == ref[0]["token_ids"], (tokens, ref)
        assert tokens[2] == ref[1]["token_ids"], (tokens, ref)

        feeder.put(BatchBackendMsg(data=[ExitMsg()]))
        for p in procs:
            p.wait(timeout=30)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        feeder.stop()
        sink.stop()


def test_two_process_tp4_lockstep_nontoy(tmp_path):
    """2 processes x 2 local virtual chips each = tp=4 at NON-TOY shapes
    (round-4 VERDICT #6): 1024-token context over 512 x 16-token pages,
    chunked prefill (a 300-token prompt over a 128-token extend budget),
    K=4 decode bursts, pipelined fetch depth 2 — tokens must match a
    single-process tp=4 run exactly."""
    from tests.helpers import save_tiny_hf_model

    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    save_tiny_hf_model(
        model_dir, "llama",
        vocab_size=1024, hidden_size=256, intermediate_size=512,
        num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=1024,
    )
    import json as _json

    overrides = _json.dumps(
        dict(
            devices_per_host=2,
            page_size=16,
            num_page_override=512,
            max_seq_len_override=1024,
            max_extend_tokens=128,
            max_running_req=4,
        )
    )
    base_port = _free_port_block()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(base_port), model_dir,
             "512", "2", "4", overrides],  # pipeline_depth=2, K=4
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            start_new_session=True,
        )
        for rank in (0, 1)
    ]
    suffix = f".mh{base_port}"
    feeder = ZmqPushQueue(f"ipc:///tmp/minisgl_tpu_0{suffix}", bind=False)
    sink = ZmqPullQueue(f"ipc:///tmp/minisgl_tpu_1{suffix}", bind=True)

    rng = np.random.default_rng(11)
    long_prompt = rng.integers(5, 1000, 300).tolist()  # 3 prefill chunks
    short_prompt = rng.integers(5, 1000, 40).tolist()
    want = {1: 12, 2: 12}
    try:
        deadline = time.time() + 420
        msgs = [
            UserMsg(
                uid=uid,
                input_ids=np.asarray(ids, np.int32),
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=want[uid], ignore_eos=True
                ),
            )
            for uid, ids in ((1, long_prompt), (2, short_prompt))
        ]
        feeder.put(BatchBackendMsg(data=msgs))

        tokens = {1: [], 2: []}
        while time.time() < deadline and any(
            len(tokens[u]) < want[u] for u in want
        ):
            for p in procs:
                if p.poll() is not None:
                    out = p.stdout.read().decode()
                    raise RuntimeError(f"worker died:\n{out[-4000:]}")
            batch = sink.get(block=False)
            if batch is None:
                time.sleep(0.5)
                continue
            for d in batch.data:
                tokens[d.uid].append(d.next_token)
        assert all(len(tokens[u]) == want[u] for u in want), tokens

        from minisgl_tpu.llm import LLM

        ref = LLM(
            model_dir,
            use_dummy_weight=True,
            tp_size=4,
            max_running_req=4,
            max_seq_len_override=1024,
            num_page_override=512,
            page_size=16,
            max_extend_tokens=128,
            cache_type="naive",
            attention_backend="xla",
        ).generate(
            [long_prompt, short_prompt],
            SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True),
        )
        assert tokens[1] == ref[0]["token_ids"], (tokens[1], ref[0])
        assert tokens[2] == ref[1]["token_ids"], (tokens[2], ref[1])

        feeder.put(BatchBackendMsg(data=[ExitMsg()]))
        for p in procs:
            p.wait(timeout=30)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        feeder.stop()
        sink.stop()
