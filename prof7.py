import time, numpy as np, jax, jax.numpy as jnp
from iris_lama_tpu.sdm import pool as pool_mod
table = pool_mod.table_init(8192)
keys = jnp.asarray((np.arange(324, dtype=np.int32) * 997 + 5) % (1<<28))
table, _ = pool_mod.table_insert(table, keys)

def bench(name, fn, arg, n=50):
    a = fn(arg); jax.block_until_ready(a)
    t0 = time.time()
    for _ in range(n): a = fn(a)
    jax.block_until_ready(a); print(name, (time.time()-t0)/n*1e3, "ms", flush=True)

look_mm = jax.jit(lambda k: pool_mod.table_lookup(table, k) * 0 + k)
bench("lookup mm (324)", look_mm, keys)

# force the gather path by large batch
big = jnp.tile(keys, 20)  # 6480 > 4096
look_g = jax.jit(lambda k: pool_mod.table_lookup(table, k) * 0 + k)
bench("lookup gather (6480)", look_g, big)
