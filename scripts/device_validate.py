"""On-device (real TPU) validation of the Pallas kernels.

The pytest suite pins JAX_PLATFORMS=cpu (tests/conftest.py) so the real
Mosaic-lowering checks skip there; this script runs them on the axon TPU
tunnel.  It covers exactly the kernels reworked in round 3 (heads-batched
flash grids, head-vectorized decode attention, paged decode kernel) plus
the fwd+bwd numeric parity of flash attention against the XLA chain.

Usage: python scripts/device_validate.py
Exit code 0 == every check passed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def check(name, got, want, atol, rtol):
    got, want = np.asarray(got), np.asarray(want)
    ok = np.allclose(got, want, atol=atol, rtol=rtol)
    err = float(np.max(np.abs(got - want)))
    print(f'{"PASS" if ok else "FAIL"} {name}: max|err|={err:.3e}')
    return ok


def check_vs_oracle(name, got, baseline, oracle):
    """Kernel must be no farther from the fp32-highest oracle than 1.5x
    the default-precision XLA path's own distance (MXU truncation noise
    affects both paths equally; measured round 3: flash 0.074 vs XLA
    0.090 max grad err at b2h8s768d128)."""
    got, baseline, oracle = map(np.asarray, (got, baseline, oracle))
    e_got = float(np.max(np.abs(got - oracle)))
    e_base = float(np.max(np.abs(baseline - oracle)))
    ok = e_got <= 1.5 * e_base + 1e-3
    print(f'{"PASS" if ok else "FAIL"} {name}: kernel-vs-oracle='
          f'{e_got:.3e} xla-vs-oracle={e_base:.3e}')
    return ok


def main():
    dev = jax.devices()[0]
    print(f'device: {dev} platform={dev.platform}')
    if dev.platform != 'tpu':
        # off-TPU the kernels silently fall back to interpret/reference
        # paths, so a pass here would NOT validate Mosaic lowering
        print('FAIL: not a TPU — this script validates Mosaic lowering '
              'and is meaningless on', dev.platform)
        return 1
    rng = np.random.default_rng(0)
    ok = True

    # ---- flash attention fwd+bwd (heads-batched grids) -----------------
    from groma_tpu.ops.flash_attention import flash_attention, mha_reference

    def fb(fn, q, k, v, prec=None, **kw):
        def loss(q, k, v):
            if prec:
                with jax.default_matmul_precision(prec):
                    return jnp.sum(fn(q, k, v, **kw) ** 2)
            return jnp.sum(fn(q, k, v, **kw) ** 2)
        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
        return val, grads

    for (b, h, s, d, causal, mask_n) in [
            (2, 8, 768, 128, True, None),     # LLaMA causal, tiled kernel
            (2, 8, 2048, 128, True, None),    # long causal
            (8, 16, 1025, 64, False, 1025),   # ViT@448 bidirectional, whole-kv
            (2, 8, 1152, 64, False, 1025),    # padded bidirectional (pad cols)
    ]:
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        kv_mask = None
        if mask_n is not None and mask_n < s:
            kv_mask = jnp.arange(s)[None, :] < mask_n
            kv_mask = jnp.broadcast_to(kv_mask, (b, s))
        vw, gw = fb(mha_reference, q, k, v, causal=causal, kv_mask=kv_mask)
        vo, go = fb(mha_reference, q, k, v, prec='highest', causal=causal,
                    kv_mask=kv_mask)
        vg, gg = fb(flash_attention, q, k, v, causal=causal, kv_mask=kv_mask)
        tag = f'flash b{b} h{h} s{s} d{d} causal={causal} mask={mask_n}'
        ok &= check_vs_oracle(tag + ' fwd', vg, vw, vo)
        for nm, a, w, o in zip('q k v'.split(), gg, gw, go):
            ok &= check_vs_oracle(tag + f' d{nm}', a, w, o)

    # ---- fused int8 decode attention (head-vectorized) -----------------
    from groma_tpu.models.llama_quant import (_int8_cache_attention,
                                              _quantize_tokens)
    from groma_tpu.ops.decode_attention import int8_decode_attention

    def mk_dec(b=2, h=8, s=256, d=128, masked_tail=32):
        q = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        k8, ks = _quantize_tokens(k)
        v8, vs = _quantize_tokens(v)
        bias = np.zeros((b, 1, 1, s), np.float32)
        if masked_tail:
            bias[..., -masked_tail:] = -1e30
        return q, k8, ks, v8, vs, jnp.asarray(bias)

    for (b, h, s) in [(2, 8, 256), (8, 32, 2048)]:
        args = mk_dec(b=b, h=h, s=s)
        want = _int8_cache_attention(*args)
        got = int8_decode_attention(*args)
        ok &= check(f'decode_attention b{b} h{h} s{s}', got, want, 2e-2, 2e-2)

    # ---- paged int8 decode attention (scalar-prefetch indirection) -----
    from groma_tpu.ops.paged_attention import (PAGE,
                                               paged_int8_decode_attention)

    def mk_paged(b=2, h=8, np_=4, pool_pages=32, d=128):
        s = np_ * PAGE
        q = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
        k8, ks = _quantize_tokens(k)
        v8, vs = _quantize_tokens(v)
        lengths = np.full((b,), s - PAGE // 2, np.int32)
        bias = np.zeros((b, 1, 1, s), np.float32)
        for i, L in enumerate(lengths):
            bias[i, ..., L:] = -1e30
        contig = (q, k8, ks, v8, vs, jnp.asarray(bias))
        perm = rng.permutation(pool_pages - 1)[:b * np_] + 1
        table = jnp.asarray(perm.reshape(b, np_), jnp.int32)
        kp = jnp.zeros((pool_pages, h, PAGE, d), jnp.int8)
        vp = jnp.zeros((pool_pages, h, PAGE, d), jnp.int8)
        ksp = jnp.zeros((pool_pages, h, PAGE), jnp.float32)
        vsp = jnp.zeros((pool_pages, h, PAGE), jnp.float32)
        for i in range(b):
            for p in range(np_):
                pid = int(table[i, p])
                sl = slice(p * PAGE, (p + 1) * PAGE)
                kp = kp.at[pid].set(k8[i, :, sl, :])
                vp = vp.at[pid].set(v8[i, :, sl, :])
                ksp = ksp.at[pid].set(ks[i, :, sl])
                vsp = vsp.at[pid].set(vs[i, :, sl])
        paged = (q, kp, ksp, vp, vsp, table, jnp.asarray(lengths))
        return contig, paged

    contig, paged = mk_paged()
    want = _int8_cache_attention(*contig)
    got = paged_int8_decode_attention(*paged)
    ok &= check('paged_decode_attention', got, want, 2e-2, 2e-2)

    print('ALL PASS' if ok else 'FAILURES PRESENT')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
