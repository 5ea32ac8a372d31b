"""Data-parallel FNO training over a device mesh.

The FNO surrogate (models/fno.py) trains on solver-manufactured field
datasets — (B, H, W, C) batches whose per-sample losses are independent,
the textbook data-parallel shape. The reference has no counterpart (it
has no operator-learning family and no distributed backend at all,
SURVEY.md section 2.5); this module is the TPU scale-out path for the
third model family, mirroring ``pinn_parallel``'s design:

- the per-step minibatch is sharded across the ``'data'`` mesh axis;
- every device computes the *global* relative-L2^2 loss via one ``psum``
  over 'data', so ``jax.grad`` of that scalar is already the globally
  reduced gradient — no separate all-reduce, and the optax Adam state
  stays replicated and bit-identical across devices;
- the epoch loop is a ``lax.scan`` inside ``shard_map`` — zero host
  round-trips for the whole run (models/fno._train_scan discipline).

Exactness contract: with the same key, the sharded trainer samples the
SAME global index sequence as the serial ``train_fno`` (the randint is
computed identically on every device; device d then takes its slice of
the batch), so serial and distributed training agree to float
reassociation (tested in tests/test_fno.py). The dataset arrives
replicated — operator-learning sets here are hundreds of small fields;
shard X/Y over 'data' and fold the device index into the sampling key
when the dataset itself outgrows one chip's HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from airpollution_tpu.models.fno import fno_apply

__all__ = ["build_fno_dp_trainer", "train_fno_dp"]


def build_fno_dp_trainer(mesh: Mesh, *, epochs: int, batch: int,
                         axis: str = "data"):
    """Jitted multi-epoch FNO trainer sharded over ``mesh[axis]``.

    Returns ``train(params, opt_state, X, Y, key, lr, wd) -> (params,
    opt_state, losses)`` with the minibatch split across the ``axis``
    devices and the global loss/update replicated. ``lr``/``wd`` are traced
    (stepped-LR chunks reuse one compiled scan); ``opt_state`` must come
    from ``optax.adamw(lr).init(params)`` (pass the previous chunk's
    state to continue training, exactly like models/fno.train_fno).
    """
    import optax

    n_dev = mesh.shape[axis]
    if batch % n_dev != 0:
        raise ValueError(
            f"batch {batch} not divisible by {axis}={n_dev}")
    b_local = batch // n_dev

    def device_train(params, opt_state, X, Y, key, lr, wd):
        opt = optax.adamw(lr, weight_decay=wd)
        d_idx = jax.lax.axis_index(axis)
        n = X.shape[0]

        def loss_fn(p, xb, yb):
            pred = fno_apply(p, xb)
            num = ((pred - yb) ** 2).sum(axis=(1, 2, 3))
            den = jnp.maximum((yb ** 2).sum(axis=(1, 2, 3)), 1e-12)
            # psum of local sums / global batch == the serial batch mean;
            # the global scalar makes grad() globally reduced for free.
            return jax.lax.psum(jnp.sum(num / den), axis) / batch

        def step(carry, k):
            p, s = carry
            # Same global index draw on every device (serial-equality
            # contract); each device trains on its contiguous slice.
            idx = jax.random.randint(k, (batch,), 0, n)
            local = jax.lax.dynamic_slice_in_dim(
                idx, d_idx * b_local, b_local)
            l, g = jax.value_and_grad(loss_fn)(p, X[local], Y[local])
            upd, s = opt.update(g, s, p)
            p = jax.tree.map(lambda a, u: a + u, p, upd)
            return (p, s), l

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jax.random.split(key, epochs))
        return params, opt_state, losses

    # check_vma=False: lax.fft's transpose rule drops the varying-axis
    # annotation on its cotangent under manual sharding (grad-of-irfft2
    # inside shard_map fails the VMA check with "cotangent type does not
    # match function output ... {V:data}"); correctness is covered by the
    # serial-equality test instead (tests/test_fno.py).
    shard_train = jax.shard_map(
        device_train,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_train)


def train_fno_dp(mesh, params, X, Y, *, epochs=2000, batch=16, lr=1e-3,
                 weight_decay=0.0, key=None, opt_state=None, axis="data"):
    """Convenience wrapper matching ``models.fno.train_fno``'s signature
    plus a mesh: one call, returns (params, opt_state, losses)."""
    import optax

    if key is None:
        key = jax.random.PRNGKey(0)
    if opt_state is None:
        # adamw's chain has one more (stateless) element than adam's,
        # so init must match the update transform used in the scan.
        opt_state = optax.adamw(lr).init(params)
    train = _trainer_cached(mesh, int(epochs), int(batch), axis)
    return train(params, opt_state, X, Y, key,
                 jnp.asarray(lr, jnp.float32),
                 jnp.asarray(weight_decay, jnp.float32))


_DP_TRAINER_CACHE: dict = {}


def _trainer_cached(mesh, epochs, batch, axis):
    # Keyed on mesh identity/config only — problem data and lr are traced
    # (the W7 lesson: never key a trainer cache on traced values).
    key = (id(mesh), tuple(mesh.shape.items()), epochs, batch, axis)
    if key not in _DP_TRAINER_CACHE:
        _DP_TRAINER_CACHE[key] = build_fno_dp_trainer(
            mesh, epochs=epochs, batch=batch, axis=axis)
    return _DP_TRAINER_CACHE[key]
