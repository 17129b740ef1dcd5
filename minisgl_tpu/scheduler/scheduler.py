"""The continuous-batching scheduler: THE hot loop.

Behavioral counterpart of /root/reference/python/minisgl/scheduler/
scheduler.py:45-233. Overlap scheduling maps 1:1 onto XLA async dispatch: the
reference schedules batch N+1 on a second CUDA stream while batch N runs and
synchronizes one iteration behind on a copy event (scheduler.py:83-106,142);
here ``Engine.forward_batch`` enqueues the jitted step and returns a device
token array immediately, the host schedules batch N+1, and only then blocks on
batch N's tokens via np.asarray — same pipeline, no streams to manage.

Data parallelism (no reference counterpart — the reference scales with TP
only): ``dp_size`` replicas are INDEPENDENT engines, each owning a disjoint
device subset, its own KV pool/page space, and its own admission/running
state, with requests routed to the least-loaded replica at arrival. This is
router-style DP — true throughput scaling with zero replicated compute or
wasted HBM — and every replica still overlaps its dispatch with host work.

Invariants carried over from the reference:
- prefill-first policy (scheduler.py:219-225)
- results processed one iteration behind; double-free of just-finished reqs
  guarded by the finished set (scheduler.py:159)
- radix insert on prefill completion and on finish (scheduler.py:163-164)
- input-too-long drop + max_tokens clamp (scheduler.py:177-188)
- idle integrity check (scheduler.py:78-81)
"""

from __future__ import annotations

import time
from collections import defaultdict, deque
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Deque, Dict, List, Optional, Set, Tuple

import numpy as np

from minisgl_tpu.core import Batch, Req
from minisgl_tpu.engine.config import SchedulerConfig
from minisgl_tpu.engine.engine import Engine, ForwardOutput
from minisgl_tpu.env import ENV
from minisgl_tpu.message import (
    AbortBackendMsg,
    BaseBackendMsg,
    BatchBackendMsg,
    DetokenizeMsg,
    ExitMsg,
    MetricsBackendMsg,
    MetricsSnapshot,
    ProfileBackendMsg,
    UserMsg,
)
from minisgl_tpu.scheduler.cache import CacheManager
from minisgl_tpu.scheduler.decode import DecodeManager
from minisgl_tpu.scheduler.io import SchedulerIOMixin
from minisgl_tpu.scheduler.metrics import SchedulerMetrics
from minisgl_tpu.scheduler.prefill import ChunkedReq, PrefillManager
from minisgl_tpu.scheduler.table import TableManager
from minisgl_tpu.spec import propose_lookup_drafts
from minisgl_tpu.utils import init_logger

logger = init_logger(__name__, "Scheduler")

_EMPTY_EOS = np.empty(0, dtype=np.int32)


def _fetch_output(output: ForwardOutput):
    """Blocking host fetch of a step's tokens (+ logprobs when requested).
    Runs on the fetch pool from dispatch time (see Scheduler._forward)."""
    tokens = np.asarray(output.tokens)
    lp = None
    if output.logprobs is not None:
        lp = tuple(np.asarray(a) for a in output.logprobs)
    return tokens, lp


@dataclass
class Replica:
    """One data-parallel serving replica: engine + all per-replica state."""

    idx: int
    engine: Engine
    table_manager: TableManager
    cache_manager: CacheManager
    decode_manager: DecodeManager
    prefill_manager: PrefillManager
    # reqs already finished (per an older batch's results) that still appear
    # in N not-yet-processed in-flight batches; value = that countdown
    finished_reqs: Dict[Req, int] = field(default_factory=dict)
    inflight: Deque["ForwardData"] = field(default_factory=deque)
    # phase of the most recently dispatched batch (interleave policy)
    last_phase: str = "decode"

    @property
    def load(self) -> int:
        return len(self.prefill_manager.pending_list) + len(
            self.decode_manager.running_reqs
        )

    @property
    def has_work(self) -> bool:
        return self.prefill_manager.runnable or self.decode_manager.runnable


# (replica, batch, in-flight device tokens, optional background host fetch)
# awaiting its pipelined fetch ``depth`` iterations later
ForwardData = Tuple[Replica, Batch, ForwardOutput, Optional[Future]]


class Scheduler(SchedulerIOMixin):
    def __init__(self, config: SchedulerConfig):
        self.config = config
        if config.num_nodes > 1:
            # multi-host: one scheduler per host, chips form one global mesh
            # (ICI intra-host, DCN across); the lockstep broadcast (io.py)
            # keeps every host's batch schedule byte-identical
            import jax

            assert config.dp_size == 1, "dp replicas are per-host; use tp across hosts"
            jax.distributed.initialize(
                config.dist_init_addr,
                num_processes=config.num_nodes,
                process_id=config.node_rank,
            )

        self.replicas = [
            self._make_replica(r, config) for r in range(config.dp_size)
        ]

        self.metrics = SchedulerMetrics()
        # host-loop time decomposition (seconds, cumulative): where wall
        # clock goes when the device is NOT the bottleneck. ~4 perf_counter
        # calls per iteration -- negligible vs a multi-ms device step.
        self.loop_times: Dict[str, float] = defaultdict(float)
        self.eos_token_ids = self._resolve_eos_ids()  # property: keeps
        # the vectorized np.isin mirror (_eos_arr) in sync on assignment
        self.prefill_budget = config.max_extend_tokens
        self._running = True
        # pipelined result fetch: process results `depth` iterations behind,
        # each with its blocking D2H transfer running on a pool thread from
        # dispatch time — on devices with high per-fetch latency (tunneled
        # TPU: ~45 ms RTT regardless of copy_to_host_async) the loop is
        # otherwise fetch-bound, not device-bound (BENCHLOG host-loop
        # decomposition). depth=1 keeps the reference's one-behind semantics.
        self.pipeline_depth = max(1, config.pipeline_depth or ENV.PIPELINE_DEPTH)
        self._fetch_pool = (
            ThreadPoolExecutor(
                max_workers=self.pipeline_depth + 1,
                thread_name_prefix="mslt-fetch",
            )
            if ENV.ASYNC_FETCH
            else None
        )

        super().__init__(config)

    def _make_replica(self, idx: int, config: SchedulerConfig) -> Replica:
        from minisgl_tpu.parallel.mesh import create_mesh

        mesh_info = None
        if config.dp_size > 1:
            import jax

            devs = jax.devices()[idx * config.tp_size : (idx + 1) * config.tp_size]
            assert len(devs) == config.tp_size, (
                f"dp={config.dp_size} x tp={config.tp_size} needs "
                f"{config.dp_size * config.tp_size} devices"
            )
            mesh_info = create_mesh(config.tp_size, devices=devs)
        engine = Engine(config, mesh_info=mesh_info)
        table_manager = TableManager(config.max_running_req)
        cache_manager = CacheManager(
            engine.num_pages, config.page_size, table_manager, config.cache_type
        )
        decode_manager = DecodeManager(
            config.page_size,
            max_seq_len=engine.max_seq_len,
            decode_steps=config.decode_steps,
        )
        prefill_manager = PrefillManager(
            cache_manager, table_manager, decode_manager
        )
        return Replica(
            idx=idx,
            engine=engine,
            table_manager=table_manager,
            cache_manager=cache_manager,
            decode_manager=decode_manager,
            prefill_manager=prefill_manager,
        )

    # -- single-replica compatibility accessors (tests, launch, offline API)
    @property
    def engine(self) -> Engine:
        return self.replicas[0].engine

    @property
    def cache_manager(self) -> CacheManager:
        return self.replicas[0].cache_manager

    @property
    def table_manager(self) -> TableManager:
        return self.replicas[0].table_manager

    @property
    def decode_manager(self) -> DecodeManager:
        return self.replicas[0].decode_manager

    @property
    def prefill_manager(self) -> PrefillManager:
        return self.replicas[0].prefill_manager

    def warmup(self) -> None:
        for rep in self.replicas:
            rep.engine.warmup()
        if self.config.background_warmup:
            # serving plane: AOT-compile the remaining bucket variants on a
            # daemon thread while requests are served (cold buckets cost
            # 10-60 s of first-hit TTFT through remote compile)
            for rep in self.replicas:
                rep.engine.warmup_background()

    @property
    def eos_token_ids(self) -> Set[int]:
        return self._eos_token_ids

    @eos_token_ids.setter
    def eos_token_ids(self, value: Set[int]) -> None:
        self._eos_token_ids = set(value)
        self._eos_arr = np.asarray(sorted(self._eos_token_ids), np.int32)

    def _resolve_eos_ids(self) -> Set[int]:
        eos: Set[int] = set()
        hf = self.config.hf_config
        raw = hf.get("eos_token_id")
        if isinstance(raw, int):
            eos.add(raw)
        elif isinstance(raw, list):
            eos.update(raw)
        try:
            from minisgl_tpu.utils import cached_load_tokenizer

            tok = cached_load_tokenizer(self.config.model_path)
            if tok.eos_token_id is not None:
                eos.add(int(tok.eos_token_id))
        except Exception:
            pass
        return eos

    # ------------------------------------------------------------- main loop

    def run_when_idle(self) -> None:
        for rep in self.replicas:
            rep.cache_manager.check_integrity()

    def overlap_loop(self) -> None:
        blocking = all(not rep.inflight for rep in self.replicas) and not any(
            rep.has_work for rep in self.replicas
        )
        if blocking:
            self.run_when_idle()
            # idle device time loads background-compiled step programs one
            # per iteration (first execution of an AOT executable pays a
            # device load; engine.idle_warmup_tick); keep polling messages
            # non-blocking while ticks remain
            for rep in self.replicas:
                if rep.engine.warmup_ticks_pending:
                    rep.engine.idle_warmup_tick()
                    blocking = False
        t0 = time.perf_counter()
        for msg in self.receive_msg(blocking=blocking):
            self._process_one_msg(msg)
        t1 = time.perf_counter()
        self.loop_times["recv_msgs"] += t1 - t0

        dispatched: Dict[int, bool] = {}
        for rep in self.replicas:
            batches = self._schedule_next_batches(rep)
            dispatched[rep.idx] = bool(batches)
            for batch in batches:
                rep.inflight.append(self._forward(rep, batch))
        t2 = time.perf_counter()
        self.loop_times["schedule_dispatch"] += t2 - t1

        for rep in self.replicas:
            # steady state: keep `pipeline_depth` batches in flight. When
            # nothing was schedulable (drain tail / results gate new work,
            # e.g. pages held until a finish is observed), drain fully so
            # the pipeline can never deadlock on its own results.
            keep = self.pipeline_depth if dispatched[rep.idx] else 0
            while len(rep.inflight) > keep:
                self._process_last_data(rep.inflight.popleft())
        self.loop_times["process_results"] += time.perf_counter() - t2

    def normal_loop(self) -> None:
        blocking = not any(rep.has_work for rep in self.replicas)
        if blocking:
            self.run_when_idle()
        for msg in self.receive_msg(blocking=blocking):
            self._process_one_msg(msg)
        for rep in self.replicas:
            for batch in self._schedule_next_batches(rep):
                self._process_last_data(self._forward(rep, batch))

    def run_forever(self) -> None:
        # Other exceptions (e.g. the offline API's RequestAllFinished)
        # propagate to the caller without tearing the engine down.
        try:
            if ENV.DISABLE_OVERLAP_SCHEDULING:
                while self._running:
                    self.normal_loop()
            else:
                while self._running or any(
                    rep.inflight for rep in self.replicas
                ):
                    self.overlap_loop()
        except KeyboardInterrupt:
            logger.info("scheduler interrupted, shutting down")
            self.shutdown()

    def shutdown(self) -> None:
        for rep in self.replicas:
            rep.engine.shutdown()
        if self._fetch_pool is not None:
            self._fetch_pool.shutdown(wait=False, cancel_futures=True)
        self.shutdown_io()

    # ------------------------------------------------------------ processing

    def _process_last_data(self, last_data: Optional[ForwardData]) -> None:
        if last_data is None:
            return
        rep, batch, output, future = last_data
        # the only host-device sync, `pipeline_depth` iterations behind
        # (reference scheduler.py:142 copy_done.synchronize()); with a
        # fetch pool the transfer has been running since dispatch
        t0 = time.perf_counter()
        if future is not None:
            tokens, lp = future.result()
        else:
            tokens, lp = _fetch_output(output)
            self.metrics.completion_events.append(
                (batch.phase, time.perf_counter(), batch.decode_steps)
            )
        if tokens.ndim == 1:  # single-step: [B] -> [1, B]
            tokens = tokens[None, :]
        dt = time.perf_counter() - t0
        self.loop_times["fetch_wait"] += dt
        if dt > 1.0:  # steady state: the fetch lags dispatched batches
            logger.debug(f"token fetch waited {dt:.1f}s ({batch.phase})")
        reply: List[DetokenizeMsg] = []
        for i, req in enumerate(batch.reqs):
            if isinstance(req, ChunkedReq):
                continue
            if req in rep.finished_reqs:
                # overlap scheduling decoded extra steps for an
                # already-finished req; drop them (reference
                # scheduler.py:159), forgetting the req once the last
                # in-flight batch containing it has been processed
                rep.finished_reqs[req] -= 1
                if rep.finished_reqs[req] <= 0:
                    del rep.finished_reqs[req]
                continue
            # accept this req's burst column in one vectorized pass:
            # take at most remaining-length tokens, truncate at the first
            # EOS (exact per-token finish semantics as the reference's
            # scalar loop, one append/EOS-check per token — measured 8 ms
            # per iteration in Python at bs=128 x K=8)
            if batch.phase == "verify":
                # the column holds the model's target tokens at every fed
                # position; the valid prefix is the matched drafts (all
                # equal to their targets) plus one correction/bonus token
                # — the same acceptance rule the device used for its token-
                # ring scatter (engine/step.py _verify)
                drafts = req.spec_drafts
                matched = tokens[: len(drafts), i] == drafts
                m = int(np.argmax(~matched)) if not matched.all() else len(drafts)
                valid = m + 1
            else:
                valid = tokens.shape[0]
            limit = min(valid, req.output_len - req.num_output_tokens)
            col = tokens[:limit, i]
            n_take = limit
            finished = False
            sp = req.sampling_params
            eos_arr = self._eos_arr if not sp.ignore_eos else _EMPTY_EOS
            if sp.stop_token_ids:
                eos_arr = np.concatenate(
                    [eos_arr, np.asarray(sp.stop_token_ids, np.int32)]
                )
            if eos_arr.size:
                hits = np.nonzero(np.isin(col, eos_arr))[0]
                if hits.size:
                    n_take = int(hits[0]) + 1
                    finished = True
            col = col[:n_take]
            req.append_host_many(col)
            if batch.phase == "verify":
                # rewind bookkeeping past the rejected drafts; generated
                # tokens count toward decode throughput at processing time
                # (decode batches count theirs at dispatch)
                req.settle_verify()
                self.metrics.spec_accepted_tokens += max(0, n_take - 1)
                self.metrics.decode_tokens += n_take
            finished |= req.num_output_tokens >= req.output_len
            last = n_take - 1
            n_lp = min(sp.logprobs, 0 if lp is None else lp[1].shape[-1])
            for j, next_token in enumerate(col.tolist()):
                fin = finished and j == last
                msg = DetokenizeMsg(
                    uid=req.uid,
                    next_token=next_token,
                    finished=fin,
                    prompt_tokens=req.prompt_len if fin else 0,
                    completion_tokens=(
                        req.num_output_tokens if fin else 0
                    ),
                )
                if n_lp:
                    msg.logprob = float(lp[0][j, i])
                    msg.top_ids = lp[1][j, i, :n_lp].tolist()
                    msg.top_logprobs = lp[2][j, i, :n_lp].tolist()
                reply.append(msg)
            if finished:
                # discard device-side tokens past the finish point
                req.clamp_to_host()
                rep.decode_manager.remove_req(req)
                self._free_req_resources(rep, req)
                # batches already dispatched (still in rep.inflight) may
                # contain this req; skip it that many more times
                pending = sum(req in fd[1].reqs for fd in rep.inflight)
                if pending:
                    rep.finished_reqs[req] = pending
                self.metrics.reqs_finished += 1
            else:
                if batch.is_prefill:
                    rep.cache_manager.cache_req(req, finished=False)
                if batch.phase == "verify":
                    # staging advanced device_len to the request's limit, so
                    # filter_reqs dropped it from the running set at
                    # dispatch; the settle rewind above may have put it back
                    # UNDER the limit (rejected drafts) — re-admit it or it
                    # is stranded with its slot and pages leaked (found by
                    # the on-chip spec bench: near-limit rejections)
                    rep.decode_manager.filter_reqs([req])
                if self.config.spec_algo != "none":
                    self._propose_drafts(rep, req)
        self.send_result(reply)

    def _route_replica(self, input_ids=None) -> Replica:
        """Pick the dp replica for a new request.

        "load" (default): least-loaded. "cache": longest radix prefix match
        wins (each replica owns a disjoint KV pool + radix tree, so a
        request routed away from its cached prefix recomputes it from
        scratch); load breaks ties and takes over when nothing matches.
        """
        if len(self.replicas) == 1:
            return self.replicas[0]
        if self.config.dp_route == "cache" and input_ids is not None:
            ids = np.asarray(input_ids, dtype=np.int32)[:-1]

            def key(rep: Replica):
                matched = (
                    rep.cache_manager.prefix_cache.match_prefix(ids).handle.cached_len
                    if len(ids)
                    else 0
                )
                return (-matched, rep.load)

            return min(self.replicas, key=key)
        return min(self.replicas, key=lambda rep: rep.load)

    def _process_one_msg(self, msg: BaseBackendMsg) -> None:
        if isinstance(msg, BatchBackendMsg):
            for m in msg.data:
                self._process_one_msg(m)
        elif isinstance(msg, ExitMsg):
            raise KeyboardInterrupt
        elif isinstance(msg, UserMsg):
            logger.debug(f"recv uid={msg.uid} len={len(msg.input_ids)}")
            self.metrics.reqs_received += 1
            input_len = len(msg.input_ids)
            max_seq_len = self.engine.max_seq_len
            max_output_len = max_seq_len - input_len
            if max_output_len <= 0:
                logger.warning(
                    f"input length {input_len} >= max_seq_len {max_seq_len}; "
                    f"request {msg.uid} dropped"
                )
                self.send_result(
                    [DetokenizeMsg(uid=msg.uid, next_token=0, finished=True)]
                )
                return
            if msg.sampling_params.max_tokens > max_output_len:
                msg.sampling_params.max_tokens = max_output_len
            self._route_replica(msg.input_ids).prefill_manager.add_one_req(
                msg.uid, msg.input_ids, msg.sampling_params
            )
        elif isinstance(msg, ProfileBackendMsg):
            from minisgl_tpu.utils.profiling import (
                start_device_trace,
                stop_device_trace,
            )

            if msg.action == "start":
                ok = start_device_trace(msg.log_dir)
                logger.info(f"profiler start -> {msg.log_dir} (ok={ok})")
            else:
                out = stop_device_trace()
                logger.info(f"profiler stopped -> {out}")
        elif isinstance(msg, MetricsBackendMsg):
            self.send_result(
                [MetricsSnapshot(nonce=msg.nonce, stats=self.metrics.snapshot(self))]
            )
        elif isinstance(msg, AbortBackendMsg):
            for rep in self.replicas:
                req = rep.prefill_manager.abort_req(msg.uid)
                req = req or rep.decode_manager.abort_req(msg.uid)
                if req is not None and req not in rep.finished_reqs:
                    self.metrics.reqs_aborted += 1
                    self._free_req_resources(rep, req)
                    # in-flight batches may still carry the req: make the
                    # result processor skip (not re-finish + double-free) it
                    pending = sum(req in fd[1].reqs for fd in rep.inflight)
                    if pending:
                        rep.finished_reqs[req] = pending
                    # tell the detokenizer to drop its per-uid streaming
                    # state (otherwise it leaks for the server's lifetime)
                    self.send_result(
                        [
                            DetokenizeMsg(
                                uid=msg.uid, next_token=0, finished=True,
                                aborted=True,
                            )
                        ]
                    )
                if req is not None:
                    break
        else:
            raise NotImplementedError(f"unknown message {type(msg)}")

    def _free_req_resources(self, rep: Replica, req: Req) -> None:
        rep.cache_manager.cache_req(req, finished=True)
        rep.table_manager.free(req.table_idx)

    # ------------------------------------------------------------ scheduling

    def _schedule_next_batches(self, rep: Replica) -> List[Batch]:
        """Pick this iteration's dispatches. At most one prefill OR decode
        batch (the reference's policy), plus — when speculative decoding is
        on — an optional verify batch alongside the decode batch: verify
        rows and decode rows are disjoint requests, so both can be in
        flight without blocking each other."""
        batches: List[Batch] = []
        batch = None
        if (
            self.config.schedule_policy == "interleave"
            and rep.last_phase == "prefill"
            and rep.decode_manager.runnable
        ):
            # bound inter-token latency during long chunked prefills: run
            # one decode step between consecutive prefill chunks instead of
            # the reference's strict prefill-first (scheduler.py:219-225),
            # which stalls every running decode for the whole chunk train
            batch = rep.decode_manager.schedule_next_batch(
                1 if rep.prefill_manager.runnable else self.config.decode_steps
            )
        if batch is None:
            batch = rep.prefill_manager.schedule_next_batch(
                self.prefill_budget, q_align=rep.engine.q_align,
                metrics=self.metrics,
            )
        if batch is not None:
            batches.append(batch)
            if (
                batch.is_prefill
                and self.config.schedule_policy != "interleave"
                and rep.decode_manager.runnable
            ):
                # Combined dispatch (round 4): admission/continuation
                # prefills must not stall the decode stream. Prefill rows
                # and running decode rows are DISJOINT requests (a request
                # joins the running set only after its last prefill chunk,
                # filter_reqs in _forward), so the decode burst rides the
                # same iteration — under strict prefill-first the decode
                # batch shrank toward the drain tail every time staggered
                # finishers triggered replacement prefills (256-seq run:
                # avg bs 76.8 vs the 128 bucket, round-3 BENCHLOG).
                # "interleave" keeps its one-decode-between-chunks ITL
                # contract unchanged.
                decode = rep.decode_manager.schedule_next_batch(
                    self.config.decode_steps
                )
                if decode is not None:
                    batches.append(decode)
            if self.config.spec_algo != "none":
                # spec-reserved rows (staged proposals) are excluded from
                # the decode stream, so during a sustained prefill train
                # they would produce zero tokens until a prefill-free
                # iteration (advisor, round 4). Verify rows are disjoint
                # from both the prefill rows (not yet running) and the
                # decode rows (no staged proposal) — ride this iteration.
                verify = self._schedule_verify(rep)
                if verify is not None:
                    batches.append(verify)
        elif self.config.spec_algo != "none":
            verify = self._schedule_verify(rep)
            if verify is not None:
                batches.append(verify)
            # withhold rows whose settled prefix hints a lookup match from
            # the decode stream: under overlap scheduling a row that keeps
            # being re-dispatched never settles, so the proposer would
            # never run for it (its in-flight results get processed this
            # iteration; _propose_drafts fires once it settles)
            withhold = {
                r
                for r in rep.decode_manager.running_reqs
                if r.spec_drafts is None
                and r.spec_proposal is None
                and self._hint_spec(rep, r)
            }
            decode = rep.decode_manager.schedule_next_batch(
                self.config.decode_steps, exclude=withhold
            )
            if decode is not None:
                batches.append(decode)
        else:
            # Reaching here means NO prefill could actually be admitted
            # this iteration (queue empty, or blocked on slots/KV memory
            # until running requests finish) — so burst the full K. A
            # blocked prefill cannot start until results free resources
            # either way; throttling to k=1 while requests merely WAIT in
            # the queue multiplied host round trips by K for the whole run
            # (the Llama-8B bench pathology: 64 seqs over max_running=32
            # pinned decode at k=1, ~33 tokens/dispatch). TTFT cost is
            # bounded by one burst: admission is re-checked next iteration.
            decode = rep.decode_manager.schedule_next_batch(
                self.config.decode_steps
            )
            if decode is not None:
                batches.append(decode)
        for batch in batches:
            rep.last_phase = batch.phase
            rep.cache_manager.allocate_paged(
                batch.reqs, lookahead=batch.decode_steps - 1
            )
            if batch.is_prefill:
                self._dispatch_boundary_copies(rep, batch)
            batch.metadata = rep.engine.build_metadata(
                batch, rep.table_manager  # TableManager: cached page arrays
            )
            logger.debug(
                f"scheduled {batch.phase} B={batch.size} "
                f"T={batch.metadata.num_tokens} replica={rep.idx}"
            )
        return batches

    def _dispatch_boundary_copies(self, rep: Replica, batch: Batch) -> None:
        """Copy-on-extend for token-granular radix adoption: requests
        admitted with a mid-page prefix match copy the matched rows of the
        tree's boundary page into their own fresh page (allocated by
        allocate_paged just above) before their first prefill step. One
        batched device copy per dispatch; consumed once per admission."""
        srcs: List[int] = []
        dsts: List[int] = []
        ps = self.config.page_size
        for req in batch.reqs:
            if req.boundary_rows:
                srcs.append(req.boundary_src)
                dsts.append(
                    rep.table_manager.page_lists[req.table_idx][
                        req.cached_len // ps
                    ]
                )
                req.boundary_src = -1
                req.boundary_rows = 0
        if srcs:
            rep.engine.copy_partial_pages(srcs, dsts)

    def _spec_gated(self, rep: Replica) -> bool:
        """Speculative drafting auto-gate by running-set size: above the
        measured crossover (config.spec_max_batch; BENCHLOG round 3 spec
        table) the verify extend costs more than the drafts save, so new
        proposals are bypassed and rows stay in the plain decode flow.
        Already-staged proposals still drain through _schedule_verify."""
        lim = self.config.spec_max_batch
        return lim > 0 and len(rep.decode_manager.running_reqs) > lim

    def _hint_spec(self, rep: Replica, req: Req) -> bool:
        """Cheap settle-ahead test: would the lookup proposer (probably)
        find drafts for this request? Runs on the settled prefix — in-flight
        tokens may change the suffix, so the authoritative proposal happens
        at settle time (_propose_drafts); a stale hit just costs the row one
        idle iteration. Cached per history length (the scan is O(history)
        and the length only changes when results land)."""
        sp = req.sampling_params
        if not sp.is_greedy or sp.logprobs or not req.can_decode:
            return False
        if self._spec_gated(rep):
            return False
        L = len(req.input_ids)
        if getattr(req, "_spec_hint_len", -1) == L:
            return req._spec_hint
        cfg = self.config
        hit = bool(
            len(
                propose_lookup_drafts(
                    req.input_ids,
                    min(cfg.spec_draft_tokens, req.remain_len),
                    cfg.spec_ngram_max,
                    cfg.spec_ngram_min,
                )
            )
        )
        req._spec_hint_len = L
        req._spec_hint = hit
        return hit

    def _propose_drafts(self, rep: Replica, req: Req) -> None:
        """Called when a request settles (its last in-flight result was just
        processed — the only moment its full history is host-known under
        overlap scheduling): run the lookup proposer and reserve the request
        for the verify phase when it yields drafts. Requests without a match
        stay in the plain decode flow."""
        sp = req.sampling_params
        if (
            not req.can_decode
            or len(req.input_ids) != req.device_len  # another batch in flight
            or not sp.is_greedy
            or sp.logprobs
            or self._spec_gated(rep)
        ):
            return
        cfg = self.config
        drafts = propose_lookup_drafts(
            req.input_ids,
            min(cfg.spec_draft_tokens, req.remain_len),
            cfg.spec_ngram_max,
            cfg.spec_ngram_min,
        )
        if len(drafts):
            req.spec_proposal = drafts

    def _schedule_verify(self, rep: Replica) -> Optional[Batch]:
        """Build a speculative-verify batch from requests whose settle-time
        draft proposal is pending. The verify forward is extend-phase, so
        rows consume the prefill token budget (each padded to q_align, like
        chunked-prefill admission); rows that don't fit stay reserved and
        ride the next verify batch."""
        cfg = self.config
        q_align = rep.engine.q_align
        seg = -(-(cfg.spec_draft_tokens + 1) // q_align) * q_align
        budget = self.prefill_budget
        reqs: List[Req] = []
        for req in sorted(
            rep.decode_manager.running_reqs, key=lambda r: r.table_idx
        ):
            if budget < seg:
                break
            if req.spec_proposal is None or req.spec_drafts is not None:
                continue
            drafts = req.spec_proposal
            req.spec_proposal = None
            req.stage_drafts(drafts)
            self.metrics.spec_draft_tokens += len(drafts)
            reqs.append(req)
            budget -= seg
        if not reqs:
            return None
        return Batch(reqs=reqs, phase="verify")

    def _fetch_and_stamp(self, output: ForwardOutput, phase: str, k: int):
        """Pool-thread fetch + completion stamp: np.asarray returns right
        after the device finishes this batch (serial device queue), so the
        stamp marks device completion plus a constant RTT that cancels in
        consecutive-completion differences (metrics.completion_events)."""
        result = _fetch_output(output)
        self.metrics.completion_events.append((phase, time.perf_counter(), k))
        return result

    def _forward(self, rep: Replica, batch: Batch) -> ForwardData:
        self.metrics.dispatch_events.append(
            (batch.phase, time.perf_counter())
        )
        if batch.is_prefill:
            self.metrics.prefill_steps += 1
        elif batch.phase == "verify":
            self.metrics.spec_steps += 1
        else:
            self.metrics.decode_steps += 1
            self.metrics.decode_tokens += batch.size * batch.decode_steps
            self.metrics.count_decode_dispatch(batch.size, batch.decode_steps)
        output = rep.engine.forward_batch(batch)
        # start the D2H token transfer NOW: it overlaps the device executing
        # this batch plus the host scheduling the next one, so the
        # pipelined np.asarray in _process_last_data finds the bytes
        # (mostly) already on the host instead of paying a full device
        # round trip per scheduler iteration (reference analogue: the
        # async copy_ + cuda event at engine.py:202-206). On runtimes where
        # copy_to_host_async can't pre-land bytes (tunneled devices), the
        # fetch pool runs the whole blocking transfer off-loop instead.
        try:
            output.tokens.copy_to_host_async()
        except AttributeError:
            pass  # non-jax.Array stand-ins in tests
        future = (
            self._fetch_pool.submit(
                self._fetch_and_stamp, output, batch.phase, batch.decode_steps
            )
            if self._fetch_pool is not None
            else None
        )
        logger.debug(f"dispatched {batch.phase} B={batch.size} r={rep.idx}")
        rep.decode_manager.filter_reqs(batch.reqs)
        return (rep, batch, output, future)
