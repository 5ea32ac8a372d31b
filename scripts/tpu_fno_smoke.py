"""Tiny TPU smoke of the FNO training scan (triage for device errors)."""
import time

import jax
import jax.numpy as jnp

from airpollution_tpu.models import fno

print("backend:", jax.default_backend(), flush=True)
k = jax.random.PRNGKey(0)
X = jax.random.normal(k, (64, 64, 64, 6), jnp.float32)
Y = jax.random.normal(jax.random.fold_in(k, 1), (64, 64, 64, 1),
                      jnp.float32)
params = fno.init_fno_params(jax.random.PRNGKey(1), in_ch=6, modes=16,
                             width=48, depth=4)
t0 = time.time()
params, opt_state, losses = fno.train_fno(params, X, Y, epochs=20,
                                          batch=32, lr=1e-3)
losses.block_until_ready()
print(f"20-step scan ok in {time.time() - t0:.1f}s; "
      f"loss {losses[0]:.3f} -> {losses[-1]:.3f}", flush=True)
