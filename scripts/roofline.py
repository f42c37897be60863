"""Measure this chip's practical peaks: bf16 matmul TFLOP/s, HBM copy
GB/s, and a fused elementwise chain — the denominators every MFU claim
in README/PARITY uses. Carried-dependency loops (no hoisting)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def timeit(fn, *a, loops_attr=10, reps=5):
    float(jnp.sum(fn(*a)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(jnp.sum(fn(*a))); ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / loops_attr

L = 10
n = 4096
a = jnp.asarray(np.random.default_rng(0).random((n, n)), jnp.bfloat16)

@jax.jit
def mm(a):
    def body(_, x):
        return jax.lax.dot(x, x, preferred_element_type=jnp.bfloat16) * 1e-3
    return jax.lax.fori_loop(0, L, body, a)

dt = timeit(mm, a, loops_attr=L)
print(f"matmul {n}x{n} bf16: {2*n**3/dt/1e12:.1f} TFLOP/s  ({dt*1e3:.2f} ms)")

# int8 leg — is quantized inference a lever on THIS backend? v5e's
# datasheet says int8 = 2x bf16 (394 vs 197), but the axon-virtualized
# chip delivers ~1/5 of nameplate and flattens the gap: measured r4
# bf16 37.5 vs int8 42.1 TOPS (+12%) — quantization is NOT worth its
# PSNR cost here; revisit only on bare-metal hardware.
ai = jnp.asarray(np.random.default_rng(1).integers(-127, 127, (n, n)),
                 jnp.int8)

@jax.jit
def mmi(a):
    def body(_, x):
        r = jax.lax.dot(x, x, preferred_element_type=jnp.int32)
        return (r >> 8).astype(jnp.int8)
    return jax.lax.fori_loop(0, L, body, a)

dt = timeit(mmi, ai, loops_attr=L)
print(f"matmul {n}x{n} int8: {2*n**3/dt/1e12:.1f} TOPS  ({dt*1e3:.2f} ms)")

m = 256 * 1024 * 1024 // 2  # 256M bf16 elements = 512MB
v = jnp.zeros((m,), jnp.bfloat16)

@jax.jit
def cp(v):
    def body(_, x):
        return x + jnp.bfloat16(1)
    return jax.lax.fori_loop(0, L, body, v)

dt = timeit(cp, v, loops_attr=L)
print(f"elementwise add 512MB bf16 (R+W): {2*m*2/dt/1e9:.0f} GB/s  ({dt*1e3:.2f} ms)")

# LayerNorm-like: mean/var over last dim 180
x = jnp.zeros((8 * 720 * 224, 180), jnp.bfloat16)

@jax.jit
def ln(x):
    def body(_, t):
        mu = jnp.mean(t, -1, keepdims=True)
        va = jnp.mean((t - mu) ** 2, -1, keepdims=True)
        return ((t - mu) * jax.lax.rsqrt(va + 1e-5)).astype(t.dtype)
    return jax.lax.fori_loop(0, L, body, x)

dt = timeit(ln, x)
print(f"layernorm (8,720,224,180) bf16: {dt*1e3:.2f} ms  ({2*x.size*2/dt/1e9:.0f} GB/s)")

# 3x3 conv 180->180 NHWC
xi = jnp.zeros((8, 720, 224, 180), jnp.bfloat16)
w = jnp.zeros((3, 3, 180, 180), jnp.bfloat16)

@jax.jit
def conv(xi, w):
    def body(_, t):
        o = jax.lax.conv_general_dilated(t, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
        return o * 1e-3
    return jax.lax.fori_loop(0, L, body, xi)

dt = timeit(conv, xi, w)
fl = 2 * 8 * 720 * 224 * 9 * 180 * 180
print(f"3x3 conv 180->180 (8,720,224): {dt*1e3:.2f} ms  ({fl/dt/1e12:.1f} TFLOP/s)")
