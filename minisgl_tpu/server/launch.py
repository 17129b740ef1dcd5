"""Process orchestration: scheduler + tokenizers + detokenizer + HTTP.

Counterpart of /root/reference/python/minisgl/server/launch.py:40-113. One
scheduler process drives ALL local chips through the device mesh (vs the
reference's one-process-per-GPU-rank), N tokenize workers round-robin the
frontend stream, one detokenize worker owns streaming state; an mp ack-queue
rendezvous gates uvicorn startup (reference launch.py:110-111).
"""

from __future__ import annotations

import multiprocessing as mp
from typing import List, Optional

from minisgl_tpu.server.args import ServerArgs, parse_args
from minisgl_tpu.utils import init_logger

logger = init_logger(__name__, "Launcher")


def _watch_parent() -> None:
    """Exit hard if the launcher dies: an orphaned scheduler would keep the
    TPU client alive and block every later process from using the chip."""
    import os
    import threading
    import time

    def poll():
        while True:
            if os.getppid() == 1:
                os._exit(0)
            time.sleep(1.0)

    threading.Thread(target=poll, daemon=True).start()


def _run_scheduler(args: ServerArgs, ack_queue) -> None:
    import os

    _watch_parent()

    if os.environ.get("MINISGL_FORCE_CPU") == "1":  # tests / debugging
        import jax

        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        jax.config.update("jax_platforms", "cpu")

    from minisgl_tpu.scheduler.scheduler import Scheduler

    scheduler = Scheduler(args)
    scheduler.warmup()
    ack_queue.put("scheduler")
    scheduler.run_forever()


def start_backend(args: ServerArgs) -> List[mp.Process]:
    """Spawn scheduler + tokenizer workers; block until all ack ready."""
    from minisgl_tpu.tokenizer.server import detokenize_worker, tokenize_worker

    ctx = mp.get_context("spawn")
    ack_queue = ctx.Queue()
    procs: List[mp.Process] = []

    procs.append(
        ctx.Process(target=_run_scheduler, args=(args, ack_queue), daemon=True)
    )
    procs.append(
        ctx.Process(
            target=detokenize_worker, args=(args, ack_queue), daemon=True
        )
    )
    for i in range(args.num_tokenizers):
        procs.append(
            ctx.Process(
                target=tokenize_worker, args=(args, i, ack_queue), daemon=True
            )
        )
    for p in procs:
        p.start()
    for _ in range(len(procs)):
        who = ack_queue.get()
        logger.info(f"{who} ready")
    return procs


def launch_server(
    argv: Optional[List[str]] = None, run_shell: bool = False
) -> None:
    args = parse_args(argv)
    procs = start_backend(args)
    from minisgl_tpu.server.api_server import (
        FrontendManager,
        run_api_server,
        run_shell as shell,
    )

    manager = FrontendManager(args)
    try:
        if run_shell:
            import asyncio

            asyncio.run(shell(manager, args))
        else:
            run_api_server(manager, args)
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.join(timeout=5)


def main() -> None:  # console entry (pyproject [project.scripts])
    launch_server()
