"""Per-host engine: mesh + params + device state + jitted step cache.

TPU-native counterpart of /root/reference/python/minisgl/engine/engine.py.
Departures from the reference's per-GPU-process design:

- ONE engine per host drives all local chips through a ("data","model") mesh;
  NCCL/gloo process groups are replaced by XLA collectives inside the jitted
  step (parallel/mesh.py).
- CUDA graphs (graph.py) are replaced by jit compilation per static bucket
  shape; ``warmup()`` precompiles the decode ladder like the reference's
  capture loop (graph.py:105-147).
- KV sizing by memory probing (engine.py:148-189) uses per-device
  memory_stats() minima instead of cross-rank all-reduce.
- The dual CUDA stream overlap trick becomes XLA async dispatch: forward_batch
  returns a device token array immediately; the host fetches it one iteration
  later (scheduler loop).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Deque, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from minisgl_tpu.attention import create_attention_backend, resolve_backend_name
from minisgl_tpu.attention.metadata import pack_step_meta
from minisgl_tpu.core import Batch, BatchMetadata
from minisgl_tpu.engine.batch_builder import all_greedy, build_batch_metadata
from minisgl_tpu.engine.config import EngineConfig
from minisgl_tpu.engine.step import KV_SPEC, DeviceState, build_step_fn
from minisgl_tpu.env import ENV
from minisgl_tpu.models.base import create_model
from minisgl_tpu.models.weight import init_dummy_params, load_params
from minisgl_tpu.parallel.mesh import MeshInfo, create_mesh
from minisgl_tpu.utils import (
    div_ceil,
    init_logger,
    next_power_of_2,
    resolve_model_dir,
)

logger = init_logger(__name__, "Engine")


def _enable_compile_cache() -> None:
    """Point JAX's persistent compilation cache at MSLT_COMPILE_CACHE
    (default ~/.cache/jax_comp) so step-variant compiles — tens of seconds
    each on remote-compile devices — are paid once per machine, not once per
    server process (a cold serving plane measured 69-184 s first-request
    TTFT without it). Explicit JAX_COMPILATION_CACHE_DIR still wins."""
    import os

    path = ENV.COMPILE_CACHE
    if not path or os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return  # configured programmatically before Engine construction
    if jax.default_backend() == "cpu":
        # CPU compiles are fast AND cached CPU executables can deserialize
        # with narrower ISA features than the host ("may SIGILL" + a
        # observed wedged jax.distributed rank in the 2-process tests) —
        # never default-cache on CPU; explicit JAX_COMPILATION_CACHE_DIR
        # still opts in
        return
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser(path)
        )
        # cache even sub-second compiles: warmup ladders compile dozens of
        # small variants (the default 1.0 s threshold would skip them)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # unsupported on exotic backends: non-fatal
        logger.warning(f"compile cache unavailable: {e}")


class ForwardOutput(NamedTuple):
    batch: Batch
    tokens: jax.Array  # [B_pad] device array (fetch one iteration later)
    # set when the batch requested logprobs: [K, B] sampled-token logprob,
    # [K, B, LOGPROBS_K] top token ids, [K, B, LOGPROBS_K] top logprobs
    logprobs: Optional[tuple] = None


class Engine:
    def __init__(self, config: EngineConfig, mesh_info: Optional[MeshInfo] = None):
        self.config = config
        _enable_compile_cache()
        # DP is replica-level (scheduler/scheduler.py Replica): one engine
        # owns ONE tp-mesh; dp>1 callers pass a device-subset mesh_info
        self.mesh_info = mesh_info or create_mesh(config.tp_size)
        self.model_config = config.model_config
        self.model = create_model(
            self.model_config, config.tp_size, quant=config.quantization
        )
        self.dtype = (
            jnp.float32 if config.resolved_dtype == "float32" else jnp.bfloat16
        )
        self.kv_dtype = {
            "float32": jnp.float32,
            "bf16": jnp.bfloat16,
            "fp8": jnp.float8_e4m3fn,
            # v5e-native low-precision KV: int8 data + per-(token, head)
            # f32 scales applied to the scores inside the kernel (ops/kv.py
            # quantize_kv_rows rationale)
            "int8": jnp.int8,
        }[config.resolved_kv_dtype]
        self.kv_scaled = config.resolved_kv_dtype == "int8"

        if config.use_dummy_weight:
            self.params = init_dummy_params(self.model.params_spec, self.mesh_info)
        else:
            self.params = load_params(
                resolve_model_dir(config.model_path),
                self.model.params_spec,
                self.mesh_info,
            )

        self.num_pages = self._agree_num_pages_across_hosts(
            self._determine_num_pages()
        )
        # The probe measures the largest SINGLE allocation that succeeds,
        # but the remote (tunneled) runtime can still refuse the real pool
        # at that size (allocator fragmentation / deferred frees we cannot
        # see). Back off 15% per refusal rather than dying — sizing by
        # retry is strictly more honest than any margin constant.
        probed = config.num_page_override is None
        while True:
            self.max_seq_len = min(
                config.max_seq_len, self.num_pages * config.page_size
            )
            self.pages_cap = div_ceil(self.max_seq_len, config.page_size)
            # The retry decision must be COLLECTIVE: RESOURCE_EXHAUSTED can
            # hit only a subset of hosts (per-process allocator
            # fragmentation), and a failing host re-entering a collective
            # while successful hosts have broken out silently hangs the job
            # (advisor, round 4). Every host attempts, then all hosts
            # all-gather (ok, proposed_pages) and take the same decision.
            state = None
            try:
                state = self._init_device_state()
                ok = True
            except jax.errors.JaxRuntimeError as e:
                if not probed or "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                ok = False
            proposal = self.num_pages if ok else int(self.num_pages * 0.85)
            all_ok, agreed = self._agree_alloc_outcome(ok, proposal)
            if all_ok:
                self.state = state
                break
            del state  # successful hosts free their pool before retrying
            if agreed < 16:
                raise RuntimeError(
                    f"KV pool allocation refused down to {agreed} pages; "
                    f"not enough device memory"
                )
            logger.warning(
                f"KV pool allocation of {self.num_pages} pages refused "
                f"(this or another host); retrying with {agreed}"
            )
            self.num_pages = agreed
        logger.info(
            f"engine up: {self.num_pages} pages x {config.page_size} tokens, "
            f"max_seq_len {self.max_seq_len}, tp={config.tp_size}"
        )

        backend = resolve_backend_name(config.attention_backend)
        if (
            self.kv_scaled
            and backend == "pallas"
            and jax.default_backend() == "tpu"
        ):
            import math

            kvh_l = self.model.dims.kv_heads_local
            sw = config.page_size * kvh_l
            # the flat decode kernel (used when the K/V plane split is
            # int8-tileable: kvh_local % 8 == 0, attention/pallas_backend.py)
            # needs a 128-lane aligned scale sidecar row; other geometries
            # fall back to the general kernel, which has no such constraint
            if kvh_l % 8 == 0 and sw % 128:
                need = 128 // math.gcd(128, kvh_l)
                raise ValueError(
                    f"int8 KV with the pallas backend needs page_size * "
                    f"kv_heads_local % 128 == 0 (Mosaic DMA lane tiling); "
                    f"got {config.page_size} * {kvh_l} = {sw}. Use a "
                    f"--page-size multiple of {need}."
                )
        from minisgl_tpu.attention.pallas_backend import QUERY_ALIGN

        self.q_align = QUERY_ALIGN.get(backend, 1)
        # pallas-family backends pin the page-table width (compile-variant
        # control); the xla fallback gathers all PB pages so keep it tight
        self.fixed_pages = backend != "xla"
        hd = self.model_config.head_dim
        self._attn = {
            phase: create_attention_backend(
                backend, page_size=config.page_size, head_dim=hd, phase=phase
            )
            for phase in ("prefill", "decode")
        }
        # speculative verify is an extend forward: same ragged kernel
        self._attn["verify"] = self._attn["prefill"]
        self._step_fns: Dict[Tuple[str, bool], object] = {}
        self._copy_fns: Dict[int, object] = {}  # copy_partial_pages buckets
        self._shutdown = False
        self._warmup_thread = None
        # (key, dummy meta) pairs whose Compiled executable exists but has
        # never run: first execution loads the program onto the device
        # (seconds on remote runtimes); drained by idle_warmup_tick from
        # the scheduler thread, which owns self.state
        self._pending_first_exec: Deque = deque()
        self.bs_buckets = config.decode_bs_buckets()
        self.token_buckets = getattr(
            config, "prefill_token_buckets", lambda: [self.max_seq_len]
        )()
        # Abstract shapes for background (thread) compilation, snapshotted
        # HERE on the constructing thread: the scheduler thread donates and
        # reassigns self.state (donate_argnums), so the warmup thread must
        # never read live arrays (advisor, round 3). Shapes/shardings are
        # invariant for the engine's lifetime — donation preserves them.
        def _shape_of(x):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)

        self._abstract_params = jax.tree.map(_shape_of, self.params)
        self._abstract_state = jax.tree.map(_shape_of, self.state)

    # ------------------------------------------------------------------ init

    def _kv_bytes_per_page_per_device(self) -> int:
        cfg = self.config
        itemsize = jnp.dtype(self.kv_dtype).itemsize
        kvh_local = self.model.dims.kv_heads_local
        data = (
            2  # K and V
            * self.model_config.num_layers
            * kvh_local
            * cfg.page_size
            * self.model_config.head_dim
            * itemsize
        )
        sidecars = 0
        if self.kv_scaled:
            # per page: flat decode sidecar [2, ps*kvh] f32 + prefill
            # sidecar [ps, 128] f32 (ops/kv.py layouts)
            from minisgl_tpu.ops.kv import SCALE_P_LANES

            sidecars = self.model_config.num_layers * 4 * (
                2 * cfg.page_size * kvh_local + cfg.page_size * SCALE_P_LANES
            )
        return int(data + sidecars)

    def _determine_num_pages(self) -> int:
        cfg = self.config
        if cfg.num_page_override is not None:
            return cfg.num_page_override
        page_bytes = self._kv_bytes_per_page_per_device()
        avail = None
        for dev in self.mesh_info.mesh.devices.flat:
            try:
                stats = dev.memory_stats()
                limit = stats["bytes_limit"] * cfg.memory_ratio
                free = limit - stats["bytes_in_use"]
            except Exception:
                free = None
            if free is not None:
                avail = free if avail is None else min(avail, free)
        if avail is None:
            if jax.default_backend() == "cpu":
                # tests: size for a fraction of max_running_req
                return min(
                    4096, cfg.pages_per_req * max(4, cfg.max_running_req // 8)
                )
            # TPU without memory_stats (e.g. tunneled device): probe the
            # real free HBM by allocate-and-verify binary search — the
            # reference's memory-probing discipline (engine.py:148-189) —
            # instead of trusting a blind HBM-size constant (the 14B run
            # previously needed a hand-tuned MSLT_HBM_GB override).
            from minisgl_tpu.env import ENV

            avail = self._probe_free_bytes() if ENV.KV_PROBE else None
            if avail is not None:
                param_bytes = sum(
                    p.nbytes for p in self.params.values()
                ) / max(1, self.mesh_info.tp_size)
                if avail + param_bytes > ENV.HBM_GB * 1.05e9:
                    # The probe subprocess saw MORE free HBM than the chip
                    # could have with our params resident: the tunneled
                    # runtime virtualizes memory per process (allocations
                    # succeed lazily; only XLA's compile-time accounting
                    # enforces the physical limit), so the probe is
                    # params-BLIND. Size against PHYSICAL capacity minus
                    # weights minus a fixed compile-temp reserve — a
                    # multiplicative ratio would starve big-param models
                    # (Qwen3-14B int8 = 14.8 of 15.75 GB; round 2 proved
                    # it serves with ~0.9 GB of KV). Measured round 4: the
                    # probe reported 11.81 GB beside 14.8 GB of resident
                    # 14B weights and the pool it sized OOMed at compile
                    # (23.7 of 15.75 GB).
                    avail = ENV.HBM_GB * 1e9 - param_bytes - 0.75e9
                    logger.info(
                        f"KV probe is params-blind on this runtime; "
                        f"sizing from {ENV.HBM_GB:.1f} GB physical - "
                        f"{param_bytes / 1e9:.2f} GB weights - 0.75 GB "
                        f"reserve -> {max(avail, 0) / 1e9:.2f} GB for KV"
                    )
                    if avail <= 0:
                        raise RuntimeError(
                            f"no HBM left for KV after "
                            f"{param_bytes / 1e9:.2f} GB of weights on a "
                            f"{ENV.HBM_GB:.1f} GB device; reduce model "
                            f"size or quantize, or raise MSLT_HBM_GB"
                        )
                else:
                    avail *= cfg.memory_ratio  # headroom for activations
            else:
                hbm = ENV.HBM_GB * 1e9
                param_bytes = sum(
                    p.nbytes for p in self.params.values()
                ) / max(1, self.mesh_info.tp_size)
                avail = hbm * cfg.memory_ratio - param_bytes
                logger.warning(
                    f"no device memory stats and no probe; budgeting KV "
                    f"from {hbm / 1e9:.0f} GB HBM - {param_bytes / 1e9:.2f} "
                    f"GB params"
                )
        num_pages = int(avail // page_bytes)
        if num_pages <= 0:
            raise RuntimeError(
                f"not enough device memory for KV cache: {avail} bytes free, "
                f"{page_bytes} per page"
            )
        logger.info(
            f"KV sizing: {avail / 1e9:.2f} GB free/chip -> {num_pages} pages"
        )
        return num_pages

    def _probe_free_bytes(self):
        """Largest single device allocation that succeeds, by binary search
        (granularity 256 MB) — run AFTER params are resident, so the result
        IS the KV budget. The search runs in a SUBPROCESS sharing the same
        physical chip: failed trial allocations through the remote runtime
        wedge that process's allocator (measured round 4: after an
        11.81 GB probe succeeded in-process, even a 4.3 GB pool alloc was
        refused), and a process exit is the only reliable way to free the
        trials. The reference's equivalent probes torch allocations and
        all-reduces the result (engine.py:148-189); here every host probes
        its own chips and _agree_num_pages_across_hosts reconciles."""
        import subprocess
        import sys

        from minisgl_tpu.env import ENV

        step = 256 << 20
        hi_units = int(ENV.HBM_GB * 1.5e9) // step
        script = (
            "import jax, jax.numpy as jnp, numpy as np\n"
            f"step = {step}\n"
            f"lo, hi = 0, {hi_units}\n"
            "def try_alloc(units):\n"
            "    try:\n"
            "        a = jax.jit(lambda: jnp.zeros((units * step,), jnp.uint8))()\n"
            "        np.asarray(a[:1])\n"
            "        del a\n"
            "        return True\n"
            "    except Exception:\n"
            "        return False\n"
            "while lo + 1 < hi:\n"
            "    mid = (lo + hi) // 2\n"
            "    lo, hi = (mid, hi) if try_alloc(mid) else (lo, mid)\n"
            "print('PROBE_BYTES', lo * step)\n"
        )
        t0 = time.perf_counter()
        try:
            out = subprocess.run(
                [sys.executable, "-c", script],
                capture_output=True, text=True, timeout=300,
            ).stdout
            bytes_free = next(
                int(line.split()[1])
                for line in out.splitlines()
                if line.startswith("PROBE_BYTES")
            )
        except Exception as e:
            logger.warning(f"KV memory probe subprocess failed: {e!r}")
            return None
        if bytes_free == 0:
            return None
        logger.info(
            f"KV memory probe: {bytes_free / 1e9:.2f} GB allocatable "
            f"({time.perf_counter() - t0:.1f}s, subprocess)"
        )
        return bytes_free

    def _agree_num_pages_across_hosts(self, num_pages: int) -> int:
        """Multi-host: every host must build the same page table. All-gather
        each host's count, take the min, and hard-error on >5% imbalance —
        a silently divergent pool would corrupt the lockstep schedule
        (reference engine.py:148-189 all-reduces its allocation probe the
        same way)."""
        import jax

        if jax.process_count() <= 1:
            return num_pages
        from jax.experimental import multihost_utils

        counts = np.asarray(
            multihost_utils.process_allgather(np.asarray([num_pages]))
        ).reshape(-1)
        lo, hi = int(counts.min()), int(counts.max())
        if hi - lo > 0.05 * hi:
            raise RuntimeError(
                f"cross-host KV sizing imbalance: per-host page counts "
                f"{counts.tolist()} differ by more than 5% — check HBM "
                f"usage/HBM_GB overrides on each host"
            )
        if lo != num_pages:
            logger.warning(
                f"KV pages reduced {num_pages} -> {lo} to match the smallest "
                f"host"
            )
        return lo

    def _agree_alloc_outcome(self, ok: bool, proposal: int):
        """Collective allocation-retry agreement: all-gather every host's
        (attempt succeeded, proposed next page count) so each host executes
        the same number of collectives and converges on the same pool size
        — min over proposals, success only if ALL hosts succeeded."""
        import jax

        if jax.process_count() <= 1:
            return ok, proposal
        from jax.experimental import multihost_utils

        arr = np.asarray(
            multihost_utils.process_allgather(
                np.asarray([int(ok), proposal], dtype=np.int64)
            )
        ).reshape(-1, 2)
        return bool(arr[:, 0].min()), int(arr[:, 1].min())

    def _init_device_state(self) -> DeviceState:
        cfg = self.config
        L = self.model_config.num_layers
        kvh = self.model.dims.kv_heads_eff
        hd = self.model_config.head_dim
        P_layer = self.num_pages + 1  # +1 dummy page 0 per layer
        kv_sharding = self.mesh_info.sharding(KV_SPEC)

        from minisgl_tpu.engine.step import KV_SCALE_P_SPEC, KV_SCALE_SPEC
        from minisgl_tpu.ops.kv import KV, SCALE_P_LANES

        # plane DMA store slices address [kvh, hd] row blocks at off*kvh —
        # Mosaic tiling needs kvh_local to be a whole sublane tile
        plane_ok = self.model.dims.kv_heads_local % 8 == 0
        if cfg.kv_layout == "plane" and not plane_ok:
            raise ValueError(
                f"--kv-layout plane needs kv_heads_local % 8 == 0 (Mosaic "
                f"sublane tiling for the per-token store slices); got "
                f"{self.model.dims.kv_heads_local}. Use --kv-layout heads."
            )
        plane = cfg.kv_layout == "plane" or (
            cfg.kv_layout == "auto"
            and plane_ok
            and resolve_backend_name(cfg.attention_backend) == "pallas"
        )
        # plane-major [L*P, 2, ps*kvh, hd] vs head-blocked
        # [L*P, ps, 2*kvh, hd] (ops/kv.py module doc; sharding axis 2 holds
        # the head-carrying dim in both). page_size 2 is reserved for BOTH
        # layouts: it makes the shapes ambiguous to the shape-based layout
        # detection (ops/kv.py pool_page_size raises at every entry point).
        assert cfg.page_size != 2, "page_size 2 is reserved (ops/kv.py)"
        pool_shape = (
            (L * P_layer, 2, cfg.page_size * kvh, hd)
            if plane
            else (L * P_layer, cfg.page_size, 2 * kvh, hd)
        )
        # allocate directly on-device in shards (no host-side global buffer)
        make_pool = jax.jit(
            lambda: jnp.zeros(pool_shape, self.kv_dtype),
            out_shardings=kv_sharding,
        )
        if self.kv_scaled:
            # sidecar lane dims are tp-blocked per-shard containers
            # (ops/kv.py): global lane width = tp * local width
            tp = self.mesh_info.tp_size
            kvh_local = self.model.dims.kv_heads_local
            make_scale = jax.jit(
                lambda: jnp.full(
                    (L * P_layer, 2, tp * cfg.page_size * kvh_local),
                    1e-8,
                    jnp.float32,
                ),
                out_shardings=self.mesh_info.sharding(KV_SCALE_SPEC),
            )
            make_scale_p = jax.jit(
                lambda: jnp.zeros(
                    (L * P_layer, cfg.page_size, tp * SCALE_P_LANES),
                    jnp.float32,
                ),
                out_shardings=self.mesh_info.sharding(KV_SCALE_P_SPEC),
            )
            kv_state = KV(
                data=make_pool(), scale=make_scale(), scale_p=make_scale_p()
            )
        else:
            kv_state = KV(data=make_pool())
        return DeviceState(
            kv=kv_state,
            token_slots=jax.device_put(
                jnp.zeros((cfg.max_running_req + 1,), jnp.int32),
                self.mesh_info.replicated,
            ),
            rng=jax.device_put(jax.random.PRNGKey(0), self.mesh_info.replicated),
        )

    # ------------------------------------------------------------------ run

    def _get_step_fn(
        self, phase: str, greedy: bool, dims, decode_steps=1,
        want_logprobs=False,
    ):
        key = (phase, greedy, dims, decode_steps, want_logprobs)
        if key not in self._step_fns:
            logger.debug(f"building step fn {key}")
            self._step_fns[key] = build_step_fn(
                self.model,
                self.mesh_info,
                self._attn[phase],
                phase,
                greedy,
                packed_dims=dims,
                decode_steps=decode_steps,
                want_logprobs=want_logprobs,
                kv_has_scale=self.kv_scaled,
                spec_cols=self.spec_cols if phase == "verify" else 0,
            )
        return self._step_fns[key]

    @property
    def spec_cols(self) -> int:
        """Verify-phase sampling width: 1 (the re-fed last token) + the max
        draft tokens staged per row (config.spec_draft_tokens)."""
        return 1 + self.config.spec_draft_tokens

    def copy_partial_pages(self, srcs: List[int], dsts: List[int]) -> None:
        """Copy-on-extend for token-granular prefix adoption: duplicate each
        src page into dst across ALL layers (+ int8 scale sidecars) before
        the adopter's first prefill step. Whole-page copies are safe — rows
        past the matched prefix are overwritten by the adopter's own writes
        or masked by its shorter attention bound. Device-queue ordering
        makes the copy land before the step that reads it."""
        if not srcs:
            return
        n = len(srcs)
        bucket = 1 << (n - 1).bit_length()  # pad with 0->0 dummy self-copies
        sd = np.zeros((2, bucket), np.int32)
        sd[0, :n] = srcs
        sd[1, :n] = dsts
        self.state = self._get_copy_fn(bucket)(
            self.state, jax.device_put(sd, self.mesh_info.replicated)
        )

    def _get_copy_fn(self, bucket: int):
        fn = self._copy_fns.get(bucket)
        if fn is None:
            L = self.model_config.num_layers
            ppl = self.num_pages + 1  # pages per layer incl. dummy page 0

            def copy_fn(state, sd):
                offs = jnp.arange(L, dtype=jnp.int32)[:, None] * ppl
                src = (sd[0][None, :] + offs).reshape(-1)
                dst = (sd[1][None, :] + offs).reshape(-1)
                kv = state.kv
                new = kv._replace(data=kv.data.at[dst].set(kv.data[src]))
                if kv.scale is not None:
                    new = new._replace(
                        scale=kv.scale.at[dst].set(kv.scale[src]),
                        scale_p=kv.scale_p.at[dst].set(kv.scale_p[src]),
                    )
                return state._replace(kv=new)

            fn = jax.jit(copy_fn, donate_argnums=0)
            self._copy_fns[bucket] = fn
        return fn

    def build_metadata(self, batch: Batch, page_lists) -> BatchMetadata:
        return build_batch_metadata(
            batch,
            page_lists,
            self.config.page_size,
            self.bs_buckets,
            self.token_buckets,
            self.pages_cap,
            q_align=self.q_align,
            fixed_pages=self.fixed_pages,
            spec_cols=self.spec_cols if batch.phase == "verify" else 0,
        )

    def forward_batch(self, batch: Batch) -> ForwardOutput:
        assert batch.metadata is not None
        m = batch.metadata
        dims = (len(m.seq_lens), len(m.out_slots), m.page_table.shape[1])
        # ONE host->device transfer per step (packed wire format); placed
        # with the mesh-wide replicated sharding so the same call works in
        # multi-controller (multi-host) mode, where every host dispatches
        # the identical batch (scheduler lockstep)
        packed = jax.device_put(pack_step_meta(m), self.mesh_info.replicated)
        want_lp = any(r.sampling_params.logprobs for r in batch.reqs)
        step = self._get_step_fn(
            batch.phase, all_greedy(batch), dims, batch.decode_steps,
            want_logprobs=want_lp,
        )
        t0 = time.perf_counter()
        if want_lp:
            self.state, tokens, logprobs = step(self.params, self.state, packed)
        else:
            self.state, tokens = step(self.params, self.state, packed)
            logprobs = None
        dt = time.perf_counter() - t0
        if dt > 1.0:  # cold-bucket compile; steady-state dispatch is ~ms
            logger.debug(f"step dispatch took {dt:.1f}s (compile?)")
        # host-side length bookkeeping advances at dispatch (reference
        # engine.py:199-200). Verify batches advanced device_len when the
        # drafts were staged (core.py stage_drafts); acceptance-dependent
        # rewind happens at result processing (settle_verify).
        if batch.phase != "verify":
            for req in batch.reqs:
                req.complete_k(batch.decode_steps)
        return ForwardOutput(batch=batch, tokens=tokens, logprobs=logprobs)

    def warmup(self) -> None:
        """Precompile the decode bucket ladder + the smallest prefill bucket
        (reference graph capture's role, graph.py:105-147)."""
        from minisgl_tpu.engine.batch_builder import pages_bucket

        PB = (
            next_power_of_2(self.pages_cap)
            if self.fixed_pages
            else pages_bucket(1, self.pages_cap)
        )
        ks = [1] + (
            [self.config.decode_steps] if self.config.decode_steps > 1 else []
        )
        for greedy in (True,):
            for bs in self.bs_buckets:
                for k in ks:
                    m = self._dummy_meta("decode", bs, bs, PB)
                    step = self._get_step_fn(
                        "decode", greedy, (bs, bs, PB), decode_steps=k
                    )
                    self.state, tokens = step(
                        self.params,
                        self.state,
                        jax.device_put(
                            pack_step_meta(m), self.mesh_info.replicated
                        ),
                    )
            T0 = self.token_buckets[0]
            m = self._dummy_meta("prefill", 1, T0, PB)
            step = self._get_step_fn("prefill", greedy, (1, T0, PB))
            self.state, tokens = step(
                self.params,
                self.state,
                jax.device_put(pack_step_meta(m), self.mesh_info.replicated),
            )
        jax.block_until_ready(tokens)
        logger.info(
            f"warmup compiled decode buckets {self.bs_buckets} + prefill "
            f"bucket {self.token_buckets[0]}"
        )

    def warmup_background(self) -> None:
        """AOT-compile every remaining (phase, bucket, K, greedy) step
        variant on a daemon thread while the engine serves (round-2 VERDICT
        #10: a cold bucket ambushing live traffic cost 10-60 s of TTFT per
        first hit through the remote-compile tunnel). ``lower().compile()``
        touches no device state, so it is safe beside the serving loop; the
        Compiled executable is installed into the step-fn table and called
        directly (same signature, donation preserved)."""
        import threading

        t = threading.Thread(target=self._warm_all_variants, daemon=True)
        t.start()
        self._warmup_thread = t

    def _abstract_args(self, meta: BatchMetadata):
        packed = pack_step_meta(meta)
        return (
            self._abstract_params,
            self._abstract_state,
            jax.ShapeDtypeStruct(
                packed.shape,
                packed.dtype,
                sharding=self.mesh_info.replicated,
            ),
        )

    def _warm_all_variants(self) -> None:
        from minisgl_tpu.engine.batch_builder import pages_bucket

        PB = (
            next_power_of_2(self.pages_cap)
            if self.fixed_pages
            else pages_bucket(1, self.pages_cap)
        )
        ks = [1] + (
            [self.config.decode_steps] if self.config.decode_steps > 1 else []
        )
        # prefill row buckets EXACTLY as the builder picks them
        # (batch_builder.py: PREFILL_BS_BUCKETS capped at len(page_lists) =
        # max_running_req + 1 — the +1 dummy slot means the top bucket is
        # NOT a power of two; warming 128 while traffic needs 129 was a
        # 17 s TTFT ambush on the first full-load prefill)
        from minisgl_tpu.engine.batch_builder import PREFILL_BS_BUCKETS

        cap = self.config.max_running_req + 1
        prefill_rows = [b for b in PREFILL_BS_BUCKETS if b < cap] + [cap]
        variants = []
        # cheap (small T) first, greedy before sampled: the order traffic
        # most likely needs them
        for greedy in (True, False):
            for bs in self.bs_buckets:
                for k in ks:
                    variants.append(("decode", greedy, (bs, bs, PB), k))
            for T in self.token_buckets:
                # all (row, T) combos: row buckets pad ABOVE the real req
                # count, so even row > T / q_align pairs occur (e.g. 128
                # minimal extends pad to 129 rows x 2048 tokens)
                for bs in prefill_rows:
                    variants.append(("prefill", greedy, (bs, T, PB), 1))
        n = 0
        t0 = time.perf_counter()
        # boundary-copy buckets (token-granular radix adoption): tiny
        # kernels, but a first-hit compile mid-traffic still stalls 3-6 s.
        # copy_partial_pages rounds n UP to the next power of two, so the
        # top reachable bucket is 1 << (max_running_req - 1).bit_length()
        # (e.g. max_running_req=100 -> bucket 128) — warm through it
        # (advisor, round 3).
        top_bucket = 1 << max(0, self.config.max_running_req - 1).bit_length()
        bucket = 1
        while bucket <= top_bucket and not self._shutdown:
            if bucket not in self._copy_fns:
                try:
                    compiled = self._get_copy_fn(bucket).lower(
                        self._abstract_state,
                        jax.ShapeDtypeStruct(
                            (2, bucket),
                            np.int32,
                            sharding=self.mesh_info.replicated,
                        ),
                    ).compile()
                    self._copy_fns[bucket] = compiled
                    self._pending_first_exec.append(("copy", bucket, None))
                    n += 1
                except Exception as e:
                    logger.warning(f"copy-bucket compile {bucket} failed: {e}")
            bucket *= 2
        for phase, greedy, dims, k in variants:
            key = (phase, greedy, dims, k, False)
            if key in self._step_fns or self._shutdown:
                continue
            try:
                fn = build_step_fn(
                    self.model,
                    self.mesh_info,
                    self._attn[phase],
                    phase,
                    greedy,
                    packed_dims=dims,
                    decode_steps=k,
                    kv_has_scale=self.kv_scaled,
                    spec_cols=0,
                )
                meta = self._dummy_meta(phase, dims[0], dims[1], PB)
                compiled = fn.lower(*self._abstract_args(meta)).compile()
                # install only if the serving thread didn't get there first
                if self._step_fns.setdefault(key, compiled) is compiled:
                    # first EXECUTION still pays a device program load
                    # (seconds through a remote runtime) — queue a one-time
                    # dummy execution for the scheduler's idle ticks
                    self._pending_first_exec.append(("step", key, meta))
                n += 1
            except Exception as e:  # background QoS: never kill serving
                logger.warning(f"background compile {key} failed: {e}")
        logger.info(
            f"background warmup: {n} step variants compiled in "
            f"{time.perf_counter() - t0:.0f}s"
        )

    @property
    def warmup_ticks_pending(self) -> bool:
        return bool(self._pending_first_exec)

    def idle_warmup_tick(self) -> None:
        """Execute ONE background-compiled step variant on a dummy batch so
        its program is loaded on the device before traffic needs it. Called
        from the scheduler thread when fully idle — it owns self.state, and
        a dummy batch writes only the dummy page / slot 0 (same contract as
        warmup())."""
        if not self._pending_first_exec:
            return
        kind, key, meta = self._pending_first_exec.popleft()
        try:
            if kind == "copy":
                # bucket of 0->0 dummy self-copies: loads the program, a
                # value no-op on the pool
                self.state = self._copy_fns[key](
                    self.state,
                    jax.device_put(
                        np.zeros((2, key), np.int32), self.mesh_info.replicated
                    ),
                )
                return
            step = self._step_fns.get(key)
            if step is None:
                return
            # non-greedy variants split state.rng inside the step; a dummy
            # execution must not make unseeded sampling depend on warmup
            # timing (advisor, round 3). Snapshot rng to host BEFORE the call
            # (the step donates state) and restore it after.
            greedy = key[1]
            old_rng = None if greedy else np.asarray(self.state.rng)
            self.state, _ = step(
                self.params,
                self.state,
                jax.device_put(pack_step_meta(meta), self.mesh_info.replicated),
            )
            if old_rng is not None:
                self.state = self.state._replace(
                    rng=jax.device_put(
                        jnp.asarray(old_rng), self.mesh_info.replicated
                    )
                )
        except Exception as e:
            logger.warning(f"idle warmup exec {key} failed: {e}")

    def _dummy_meta(self, phase: str, B: int, T: int, PB: int) -> BatchMetadata:
        q_req_ids = np.full((T,), -1, np.int32)
        q_req_ids[: (B if phase == "decode" else 1)] = (
            np.arange(B, dtype=np.int32) if phase == "decode" else 0
        )
        cu = np.zeros((B + 1,), np.int32)
        if phase == "decode":
            cu[1:] = np.arange(1, B + 1)
        else:
            cu[1:] = self.q_align
        return BatchMetadata(
            phase=phase,
            slot_ids=np.zeros((B,), np.int32),
            out_slots=np.zeros((T,), np.int32),
            positions=np.zeros((T,), np.int32),
            page_table=np.zeros((B, PB), np.int32),
            seq_lens=np.ones((B,), np.int32),
            input_ids=np.zeros((T,), np.int32) if phase == "prefill" else None,
            q_req_ids=q_req_ids,
            last_q_index=np.zeros((B,), np.int32),
            cu_q_lens=cu,
            temperature=np.zeros((B,), np.float32),
            top_k=np.full((B,), -1, np.int32),
            top_p=np.ones((B,), np.float32),
            num_reqs=B if phase == "decode" else 1,
            num_tokens=B if phase == "decode" else 1,
        )

    def shutdown(self) -> None:
        self._shutdown = True  # stops the background warmup thread
