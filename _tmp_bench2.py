import time, numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
B=16
x = jnp.asarray(rng.normal(size=(B,512,512,3)), jnp.bfloat16)
w7 = jnp.asarray(rng.normal(size=(7,7,3,128))*0.05, jnp.bfloat16)

def bench(f, x, name, iters=20):
    for _ in range(2): out=f(x)
    jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(iters): out=f(x)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.3f} ms", flush=True)

@jax.jit
def conv_f32acc(x):
    return jax.lax.conv_general_dilated(x, w7, (2,2), [(3,3),(3,3)],
        dimension_numbers=('NHWC','HWIO','NHWC'), preferred_element_type=jnp.float32).astype(jnp.bfloat16)

@jax.jit
def conv_bf16acc(x):
    return jax.lax.conv_general_dilated(x, w7, (2,2), [(3,3),(3,3)],
        dimension_numbers=('NHWC','HWIO','NHWC'))

bench(conv_f32acc, x, "conv7 f32 acc")
bench(conv_bf16acc, x, "conv7 bf16 acc")

# also: pure output-write roofline probe at same shape
w11 = jnp.asarray(rng.normal(size=(1,1,128,128))*0.05, jnp.bfloat16)
y = jnp.asarray(rng.normal(size=(B,256,256,128)), jnp.bfloat16)
@jax.jit
def probe(y):
    return y * 2.0 + 1.0
bench(probe, y, "elementwise @256MB out")
