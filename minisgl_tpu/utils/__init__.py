from minisgl_tpu.utils.hf import (
    cached_load_hf_config,
    cached_load_tokenizer,
    list_safetensor_files,
    resolve_model_dir,
)
from minisgl_tpu.utils.logger import init_logger
from minisgl_tpu.utils.math_utils import (
    align_down,
    align_up,
    div_ceil,
    div_even,
    is_power_of_2,
    next_power_of_2,
)
from minisgl_tpu.utils.registry import Registry
from minisgl_tpu.utils.zmq_utils import (
    ZmqAsyncPullQueue,
    ZmqAsyncPushQueue,
    ZmqPubQueue,
    ZmqPullQueue,
    ZmqPushQueue,
    ZmqSubQueue,
)

__all__ = [
    "align_down",
    "align_up",
    "cached_load_hf_config",
    "cached_load_tokenizer",
    "div_ceil",
    "div_even",
    "init_logger",
    "is_power_of_2",
    "list_safetensor_files",
    "next_power_of_2",
    "Registry",
    "resolve_model_dir",
    "ZmqAsyncPullQueue",
    "ZmqAsyncPushQueue",
    "ZmqPubQueue",
    "ZmqPullQueue",
    "ZmqPushQueue",
    "ZmqSubQueue",
]
