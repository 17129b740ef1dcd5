"""Multi-host lockstep message broadcast (counterpart of the reference's
rank-lockstep protocol test surface, /root/reference/python/minisgl/scheduler/
io.py:88-122: every rank must consume a byte-identical message stream).

Runs node0 + one follower SchedulerIOMixin in threads on localhost tcp."""

import threading
import time

import numpy as np
import pytest

from minisgl_tpu.core import SamplingParams
from minisgl_tpu.message import BatchBackendMsg, UserMsg
from minisgl_tpu.scheduler.io import SchedulerIOMixin
from minisgl_tpu.utils import ZmqPushQueue


class _Cfg:
    offline_mode = False
    num_nodes = 2
    master_addr = "127.0.0.1"

    def __init__(self, port, suffix):
        self.lockstep_port = port
        self.zmq_backend_addr = f"ipc:///tmp/mslt_test_be_{suffix}"
        self.zmq_detokenizer_addr = f"ipc:///tmp/mslt_test_de_{suffix}"

    @property
    def lockstep_pub_addr(self):
        return f"tcp://{self.master_addr}:{self.lockstep_port}"

    @property
    def lockstep_ready_addr(self):
        return f"tcp://{self.master_addr}:{self.lockstep_port + 1}"


def _mk_io(cfg, rank, out):
    cfg.node_rank = rank
    io = SchedulerIOMixin.__new__(SchedulerIOMixin)
    SchedulerIOMixin.__init__(io, cfg)
    out[rank] = io


def test_lockstep_two_nodes():
    import os

    port = 31500 + os.getpid() % 500 * 2
    suffix = str(os.getpid())
    ios = {}
    threads = [
        threading.Thread(
            target=_mk_io, args=(_Cfg(port, suffix), r, ios), daemon=True
        )
        for r in (0, 1)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert 0 in ios and 1 in ios, "lockstep rendezvous failed"

    # a fake tokenizer feeds node 0
    feeder = ZmqPushQueue(_Cfg(port, suffix).zmq_backend_addr, bind=False)
    sent = [
        UserMsg(uid=i, input_ids=np.asarray([i, i + 1], np.int32),
                sampling_params=SamplingParams(max_tokens=4))
        for i in range(3)
    ]
    feeder.put(BatchBackendMsg(data=sent))
    time.sleep(0.3)

    got = {}

    def drain(rank):
        got[rank] = ios[rank].receive_msg(blocking=True)

    t1 = threading.Thread(target=drain, args=(1,), daemon=True)
    t1.start()
    drain(0)
    t1.join(timeout=10)

    assert len(got[0]) == len(got[1]) == 1
    a, b = got[0][0], got[1][0]
    assert isinstance(a, BatchBackendMsg) and isinstance(b, BatchBackendMsg)
    assert [m.uid for m in a.data] == [m.uid for m in b.data] == [0, 1, 2]
    np.testing.assert_array_equal(a.data[2].input_ids, b.data[2].input_ids)

    # empty drains broadcast too: follower's loop stays aligned
    def drain_nb(rank):
        got[rank] = ios[rank].receive_msg(blocking=False)

    t1 = threading.Thread(target=drain, args=(1,), daemon=True)
    t1.start()
    drain_nb(0)
    t1.join(timeout=10)
    assert got[0] == [] and got[1] == []

    for io in ios.values():
        io.shutdown_io()
    feeder.stop()
