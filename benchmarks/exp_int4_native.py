"""Experiment: XLA-native int4 (S4) weights through the axon tunnel.

ROADMAP: 'XLA-native int4 weights once the tunnel can ship S4 arrays
(currently device_put on int4 jit args crashes)'.  Probe the workaround:
create the int4 array ON DEVICE (jit int8->int4 convert) so the tunnel
never serializes an S4 host array, then time a decode-shaped dequant
matmul against the Pallas packed-nibble kernel.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import numpy as np
import jax
import jax.numpy as jnp

K, N = 4096, 22016   # gate_up shape, the biggest decode matmul
M = 8
ITERS = 256

rng = np.random.default_rng(0)
w8 = jnp.asarray(rng.integers(-8, 8, (K, N)), jnp.int8)
scale = jnp.full((N,), 1e-4, jnp.float32)
x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

# --- step 1: can we even make an S4 array on device? ---
try:
    to4 = jax.jit(lambda a: a.astype(jnp.int4))
    w4 = to4(w8)
    w4.block_until_ready()
    print('int4 on-device convert OK:', w4.dtype, w4.shape)
except Exception as e:  # noqa: BLE001
    print('int4 convert FAILED:', type(e).__name__, str(e)[:200])
    sys.exit(0)

# --- step 2: does a jit matmul taking the device-resident S4 arg run? ---
def mm4(x, w4, scale):
    return (jnp.dot(x, w4.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            * scale[None, :]).astype(jnp.bfloat16)

try:
    f = jax.jit(mm4)
    out = f(x, w4, scale)
    out.block_until_ready()
    print('int4 matmul OK:', out.shape, out.dtype)
except Exception as e:  # noqa: BLE001
    print('int4 matmul FAILED:', type(e).__name__, str(e)[:200])
    sys.exit(0)

# --- step 3: timing, amortized in-graph ---
def loop4(x, w4, scale):
    def body(c, _):
        y = mm4(c, w4, scale)
        # feed a K-slice back so iterations are serialized
        return c + y[:, :K] * 0.0, ()
    c, _ = jax.lax.scan(body, x, None, length=ITERS)
    return c

lf = jax.jit(loop4)
r = lf(x, w4, scale); r.block_until_ready()
t0 = time.perf_counter()
r = lf(x, w4, scale); r.block_until_ready()
dt = (time.perf_counter() - t0) / ITERS
bw = K * N * 0.5 / dt / 1e9
print(f'XLA S4 matmul {M}x{K}x{N}: {dt*1e6:.0f} us/iter '
      f'({bw:.0f} GB/s effective weight stream)')

# --- compare: current Pallas packed-nibble kernel ---
from groma_tpu.ops.quant4 import INT4_BLOCK, int4_matmul, \
    quantize_weight_int4  # noqa: E402
qd = jax.jit(lambda w: quantize_weight_int4(w, block=INT4_BLOCK),
             static_argnums=())(w8.astype(jnp.float32))
packed, pscale = qd['q'], qd['scale']

def loopp(x, packed, pscale):
    def body(c, _):
        y = int4_matmul(c, packed, pscale, block=INT4_BLOCK)
        return c + y[:, :K].astype(c.dtype) * 0.0, ()
    c, _ = jax.lax.scan(body, x, None, length=ITERS)
    return c

lp = jax.jit(loopp)
r = lp(x, packed, pscale); r.block_until_ready()
t0 = time.perf_counter()
r = lp(x, packed, pscale); r.block_until_ready()
dtp = (time.perf_counter() - t0) / ITERS
bwp = K * N * 0.5 / dtp / 1e9
print(f'Pallas packed-int4     : {dtp*1e6:.0f} us/iter ({bwp:.0f} GB/s)')
print(f'speedup XLA-S4 vs Pallas: {dtp/dt:.2f}x')
