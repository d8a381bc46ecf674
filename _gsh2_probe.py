import time
import numpy as np
import jax
import jax.numpy as jnp
print(jax.devices())
from swiftvideo_tpu.ops import motion

h, w = 1080, 1920
rng = np.random.default_rng(5)
ref = rng.integers(0, 255, (h, w), np.uint8)
cur = np.clip(ref.astype(int) + rng.integers(-12, 12, ref.shape),
              0, 255).astype(np.uint8)
t0 = time.time()
out = np.asarray(motion.me_fullsearch_ssd_pallas(cur, ref, 16, 64))
print("global-SH2 dense compile+run:", round(time.time() - t0, 1), "s")
grp = np.asarray(motion.me_fullsearch_mxu(cur, ref, 16, 64, grouped=True))
print("parity global-SH2 vs grouped:", np.array_equal(out, grp))

prog = motion._me_ssd_pallas_program(h, w, 16, 64)
curj, refj = jnp.asarray(cur), jnp.asarray(ref)

@jax.jit
def loop(c0, r0, n):
    def body(i, carry):
        c, acc = carry
        o = prog(c, r0)
        return c ^ o[0, 0, 0].astype(jnp.uint8), acc + jnp.int32(o[0, 0, 3])
    return jax.lax.fori_loop(0, n, body, (c0, jnp.int32(0)))[1]

for n in (2, 6):
    loop(curj, refj, n).block_until_ready()
reps = []
for r in range(6):
    ts = {}
    for n in (4, 12):
        t0 = time.time()
        loop(curj, refj, n).block_until_ready()
        ts[n] = time.time() - t0
    reps.append((ts[12] - ts[4]) / 8 * 1000)
print("global-SH2 dense per-frame ms:", [round(x, 3) for x in reps],
      "min:", round(min(reps), 3))
