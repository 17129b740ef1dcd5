"""Worker process for the 2-node lockstep serving test (run by
test_multihost_e2e.py): one scheduler per "host", TP=2 across the two
processes via jax.distributed over localhost, request stream lockstepped by
the ZMQ counted broadcast (scheduler/io.py).

Usage: python multihost_worker.py <node_rank> <base_port> <model_dir> \
    [num_pages] [pipeline_depth] [decode_steps] [json_overrides]

``json_overrides`` (SchedulerConfig field dict) additionally supports
"devices_per_host": each process hosts that many virtual CPU devices, so a
2-process run can span tp=4 (2 local chips per "host" — the non-toy
lockstep geometry of VERDICT round 4)."""

import json
import os
import sys

node_rank = int(sys.argv[1])
base_port = int(sys.argv[2])
model_dir = sys.argv[3]
num_pages = int(sys.argv[4]) if len(sys.argv) > 4 else 128
pipeline_depth = int(sys.argv[5]) if len(sys.argv) > 5 else 0
decode_steps = int(sys.argv[6]) if len(sys.argv) > 6 else 1
overrides = json.loads(sys.argv[7]) if len(sys.argv) > 7 else {}
devices_per_host = int(overrides.pop("devices_per_host", 1))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={devices_per_host}"
)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from minisgl_tpu.engine.config import SchedulerConfig
from minisgl_tpu.scheduler.scheduler import Scheduler

kwargs = dict(
    model_path=model_dir,
    tp_size=2 * devices_per_host,
    use_dummy_weight=True,
    max_running_req=4,
    max_seq_len_override=128,
    num_page_override=num_pages,
    page_size=4,
    cache_type="naive",
    attention_backend="xla",
    pipeline_depth=pipeline_depth,
    decode_steps=decode_steps,
    num_nodes=2,
    node_rank=node_rank,
    lockstep_port=base_port,
    dist_init_port=base_port + 10,
    _unique_suffix=f".mh{base_port}",
)
kwargs.update(overrides)
config = SchedulerConfig(**kwargs)

try:
    scheduler = Scheduler(config)
except Exception as e:  # noqa: BLE001 — init failures must EXIT, not hang
    # print-then-hard-exit: an abnormal exit must not run jax.distributed's
    # atexit shutdown barrier — with both ranks erroring at skewed times the
    # barrier deadlocks and the process never dies (timing-dependent; the
    # imbalance test caught it once the compile cache shifted init timing)
    print(f"NODE{node_rank} INIT FAILED: {e}", flush=True)
    os._exit(1)
print(f"NODE{node_rank} READY devices={jax.device_count()}", flush=True)
scheduler.run_forever()
print(f"NODE{node_rank} EXIT", flush=True)
