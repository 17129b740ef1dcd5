from minisgl_tpu.server.args import ServerArgs, parse_args
from minisgl_tpu.server.launch import launch_server

__all__ = ["ServerArgs", "parse_args", "launch_server"]
