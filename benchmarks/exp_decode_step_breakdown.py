"""In-model decode-step cost breakdown (round 4).

The isolated component numbers do not add up: attention alone measures
9.09 ms/32-layer step (exp_decode_attn_variants), int4 weight streaming
alone is ~4.2 ms (3.4 GB / 819 GB/s), yet the full scanned step is
10.5 ms — so either the isolated numbers overstate or the real step
already overlaps streams.  Before designing a megakernel around the
per-pallas_call overhead finding, measure what the REAL step pays per
component by ablation:

  int4+kv8 full        the shipped step (bench_decode_quant parity run)
  int4+kv8 no-attn     decode attention monkeypatched to a near-free
                       touch (cache writes stay live) -> attention's
                       true in-model marginal cost
  int8+kv8 full        weights stream 2x the bytes of int4: the delta
                       vs int4 is the marginal cost of +3.4 GB/step of
                       weight DMA (== 4.2 ms iff weights run at HBM
                       bandwidth and overlap nothing)
  int8+kv8 no-attn     same delta without attention in the way

Run: python benchmarks/exp_decode_step_breakdown.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()

import jax.numpy as jnp  # noqa: E402

import bench_decode_quant as bdq  # noqa: E402
from groma_tpu.ops import decode_attention as da  # noqa: E402
from _fixtures import mk_llama_quant_params  # noqa: E402

REAL_ATTN = da.int8_decode_attention


def ablated_attention(q, k_q, k_s, v_q, v_s, mask_bias):
    """Near-free stand-in: touches one cache row so the per-step KV
    scatter stays live, but streams no KV and launches no kernel."""
    touch = (k_q[:, :, :1, :].astype(jnp.float32) * k_s[:, :, :1, None]
             + v_q[:, :, :1, :].astype(jnp.float32) * v_s[:, :, :1, None])
    return q.astype(jnp.float32) + touch * 1e-9 \
        + mask_bias[:, :, :, :1] * 1e-30


def main():
    # restore the module-level monkeypatch and STEPS even if a measure
    # raises mid-sweep (device OOM): a leaked patch would poison any
    # driver that imports this module and runs other benches after
    steps0 = bdq.STEPS
    try:
        bdq.STEPS = 128
        for bits in (4, 8):
            qp = mk_llama_quant_params(bdq.cfg, bits=bits)
            for ablate in (False, True):
                da.int8_decode_attention = ablated_attention if ablate \
                    else REAL_ATTN
                tag = f'int{bits}_kv8_b8_' + ('noattn' if ablate else 'full')
                bdq.measure(qp, 8, True, f'exp_breakdown_{tag}')
            del qp
    finally:
        da.int8_decode_attention = REAL_ATTN
        bdq.STEPS = steps0


if __name__ == '__main__':
    main()
