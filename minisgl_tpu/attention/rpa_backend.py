"""Backend wrapping JAX's bundled ragged-paged-attention Pallas kernel.

Serves the same role as the reference delegating to FlashInfer/FlashAttention
library kernels (/root/reference/python/minisgl/attention/fi.py:80-271,
fa.py:139-182): a vendor-tuned kernel behind the same backend interface, used
for A/B comparison against our own Pallas kernel (pallas_backend.py). Our
combined pool layout [L*P, page_size, 2*kvh, hd] was chosen to be directly
consumable by kernels of this shape — the layer "slice" is an offset already
folded into meta.page_table, so the FULL pool is passed and only the
referenced pages are DMA'd.
"""

from __future__ import annotations

import jax

from minisgl_tpu.attention.metadata import AttnMetadata


def rpa_attention(
    q: jax.Array,  # [T, Hq_local, hd]
    kv,  # ops.kv.KV: pool [L*P, page_size, 2*kvh_local, hd] K/V head-block
    meta: AttnMetadata,
    scale: float,
) -> jax.Array:
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention.kernel import (
        ragged_paged_attention,
    )

    # our pool stores K heads then V heads per page row (ops/kv.py block
    # layout); the library kernel wants them interleaved K0 V0 K1 V1 ... .
    # This transposes the WHOLE pool per call — rpa is an A/B and parity
    # backend only (it VMEM-OOMs at bs>=128 decode and crashes on prefill
    # shapes, BENCHLOG.md), so clarity beats cost here.
    kv_pool, kv_scale = kv.data, kv.scale
    assert kv_pool.shape[1] != 2, (
        "rpa (vendor A/B backend) needs the head-blocked pool layout; "
        "run with --kv-layout heads"
    )
    if kv_scale is not None:
        # parity-only backend: dequantize the whole int8 pool up front from
        # the flat sidecar [N, 2, ps*kvh] (lane order off*kvh + h)
        import jax.numpy as jnp

        N_, ps_, kvh2_, _ = kv_pool.shape
        sc = kv_scale.reshape(N_, 2, ps_, kvh2_ // 2).transpose(
            0, 2, 1, 3
        ).reshape(N_, ps_, kvh2_)
        kv_pool = kv_pool.astype(jnp.bfloat16) * sc[..., None].astype(
            jnp.bfloat16
        )
    N, ps, kvh2, hd = kv_pool.shape
    kvh = kvh2 // 2
    interleaved = (
        kv_pool.reshape(N, ps, 2, kvh, hd)
        .transpose(0, 1, 3, 2, 4)
        .reshape(N, ps, kvh2, hd)
    )
    return ragged_paged_attention(
        q,
        interleaved,
        meta.seq_lens,
        meta.page_table,
        meta.cu_q_lens,
        meta.num_seqs,
        sm_scale=scale,
    )
