"""Train the FNO operator surrogate on solver-manufactured plume data.

The pitch (models/fno.py): the vmapped FEM engine manufactures
ground-truth datasets in seconds, an FNO trains on them in minutes, and
the result answers NEW (D, v, sigma, center) queries in one forward
pass — an amortized solution operator next to the per-instance FEM and
PINN paths. Every sample keeps a closed form (ShiftedPlumeProblem), so
the surrogate is scored against both the FEM field and the exact
solution on held-out problems.

Writes results_snapshot/fno_surrogate.json (--write). With --n_times K
the surrogate is TIME-CONDITIONED: trained on K trajectory snapshots per
problem with a t/T input channel (fno.make_plume_time_dataset), scored
against the closed form at every snapshot time, and written to
results_snapshot/fno_time_surrogate.json instead.
"""

import argparse
import json
import os
import time

import numpy as np

if os.environ.get("APT_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

import airpollution_tpu as apt
from airpollution_tpu.models import fno


def log(*a):
    print(*a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_size", type=int, default=65)
    ap.add_argument("--nt", type=int, default=128)
    ap.add_argument("--n_train", type=int, default=640)
    ap.add_argument("--n_test", type=int, default=128)
    ap.add_argument("--modes", type=int, default=16)
    ap.add_argument("--width", type=int, default=48)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1.5e-3)
    ap.add_argument("--weight_decay", type=float, default=0.0,
                    help="decoupled AdamW decay (generalization lever "
                    "for small manufactured datasets)")
    ap.add_argument("--lr_decay_chunks", type=int, default=4,
                    help="halve the LR this many times over training")
    ap.add_argument("--scan_chunk", type=int, default=200,
                    help="epochs per jitted scan call (long device "
                    "executions trip the remote tunnel; every call "
                    "reuses ONE compiled program — opt_state threads "
                    "through)")
    ap.add_argument("--n_times", type=int, default=0,
                    help="train a TIME-CONDITIONED surrogate on this "
                    "many trajectory snapshots per problem (0 = "
                    "final-state operator)")
    ap.add_argument("--superres_mesh", type=int, default=0,
                    help="also evaluate ZERO-SHOT on this finer mesh "
                    "(final-state mode only; the spectral conv is "
                    "resolution-agnostic)")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    log(f"backend: {jax.default_backend()}")

    domain = apt.Domain()
    md = apt.MeshData(apt.create_mesh(args.mesh_size, 20.0), domain,
                      nt=args.nt)
    n_all = args.n_train + args.n_test
    t0 = time.time()
    if args.n_times:
        X, Y, probs, snap_times = fno.make_plume_time_dataset(
            md, domain, jax.random.PRNGKey(0), n_all,
            n_times=args.n_times)
        rows_per = args.n_times
    else:
        X, Y, probs = fno.make_plume_dataset(
            md, domain, jax.random.PRNGKey(0), n_all)
        snap_times, rows_per = None, 1
    Y.block_until_ready()
    t_data = time.time() - t0
    log(f"dataset: {n_all} FEM solves ({md.number_of_segments} DOFs, "
        f"nt={args.nt}) in {t_data:.1f}s -> X{tuple(X.shape)}")
    # Split by PROBLEM (rows of one problem stay together) so holdout
    # scores measure generalization to unseen (D, v, sigma, center).
    n_tr_rows = args.n_train * rows_per
    Xtr, Ytr = X[:n_tr_rows], Y[:n_tr_rows]
    Xte, Yte = X[n_tr_rows:], Y[n_tr_rows:]

    params = fno.init_fno_params(
        jax.random.PRNGKey(1), in_ch=X.shape[-1], modes=args.modes,
        width=args.width, depth=args.depth)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    log(f"FNO: modes={args.modes} width={args.width} depth={args.depth} "
        f"-> {n_params / 1e6:.2f}M params")

    # Stepped LR decay via repeated train_fno calls (each chunk reuses
    # the one compiled scan per (epochs, batch, lr) signature).
    chunks = max(1, args.lr_decay_chunks)
    per = args.epochs // chunks
    opt_state = None
    lr = args.lr
    t0 = time.time()
    losses_all = []
    sc = min(args.scan_chunk, per)
    if per % sc:
        # Every inner call must have the SAME static epochs value or the
        # ragged final chunk compiles a second program (minutes on the
        # tunnel) — round the per-chunk count up to a multiple of sc.
        per_new = ((per + sc - 1) // sc) * sc
        log(f"note: epochs/chunk {per} -> {per_new} (multiple of "
            f"scan_chunk={sc} keeps one compiled program)")
        per = per_new
    for ci in range(chunks):
        # Inner scan chunks: same (epochs, batch) signature + traced lr
        # -> one compiled program for the WHOLE schedule.
        done = 0
        while done < per:
            n_ep = min(sc, per - done)
            key = jax.random.PRNGKey(100 + 1000 * ci + done)
            params, opt_state, losses = fno.train_fno(
                params, Xtr, Ytr, epochs=n_ep, batch=args.batch, lr=lr,
                weight_decay=args.weight_decay,
                key=key, opt_state=None if ci == 0 and done == 0
                else opt_state)
            losses.block_until_ready()
            losses_all.append(np.asarray(losses))
            if ci == 0 and done == 0:
                t_first = time.time() - t0
                log(f"first scan chunk ({n_ep} steps, incl. compile): "
                    f"{t_first:.1f}s")
            done += n_ep
        lr *= 0.5
    t_train = time.time() - t0
    losses_all = np.concatenate(losses_all)
    # The ACTUAL trained-step count (chunk rounding may exceed
    # args.epochs) — throughput and the artifact report this, not the
    # requested number.
    epochs_run = int(losses_all.shape[0])
    log(f"train: {epochs_run} steps in {t_train:.1f}s "
        f"({epochs_run / t_train:.0f} steps/s); loss "
        f"{losses_all[0]:.3f} -> {losses_all[-1]:.5f}")

    rel_tr = fno.relative_l2(params, Xtr, Ytr)
    rel_te = fno.relative_l2(params, Xte, Yte)

    # Score held-out predictions against the CLOSED FORM too (at every
    # snapshot time in the time-conditioned mode, matching row order).
    coords = jnp.asarray(fno.grid_coordinates(md), dtype=X.dtype)
    cc = coords.reshape(-1, 2)
    eval_times = [domain.T] if snap_times is None else list(snap_times)
    exact = []
    for p in probs[args.n_train:]:
        for t in eval_times:
            xyt = jnp.concatenate(
                [cc, jnp.full((cc.shape[0], 1), t, dtype=cc.dtype)],
                axis=1)
            exact.append(np.asarray(p.analytical_solution(xyt)).reshape(
                coords.shape[0], coords.shape[0]))
    exact = np.stack(exact)[..., None]
    pred = np.asarray(fno_predict_batched(params, Xte))
    num = np.sqrt(((pred - exact) ** 2).sum(axis=(1, 2, 3)))
    den = np.sqrt((exact ** 2).sum(axis=(1, 2, 3)))
    rel_exact = float((num / np.maximum(den, 1e-12)).mean())
    # The FEM's own error against the closed form — the floor the
    # surrogate is trained toward.
    yte = np.asarray(Yte)
    numf = np.sqrt(((yte - exact) ** 2).sum(axis=(1, 2, 3)))
    rel_fem = float((numf / np.maximum(den, 1e-12)).mean())
    log(f"rel-L2 vs FEM: train {rel_tr:.4f}, holdout {rel_te:.4f}; "
        f"holdout vs closed form {rel_exact:.4f} (FEM itself "
        f"{rel_fem:.4f})")

    # Inference throughput: fields per second at a production batch.
    bs = min(128, args.n_test)
    f = jax.jit(lambda xb: fno.fno_apply(params, xb))
    f(Xte[:bs]).block_until_ready()
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        f(Xte[:bs]).block_until_ready()
    t_inf = (time.time() - t0) / reps
    fields_per_s = bs / t_inf
    log(f"inference: {fields_per_s:.0f} fields/s (batch {bs})")

    sr = {}
    if args.superres_mesh and not args.n_times:
        # Zero-shot super-resolution: the spectral conv's low-mode
        # mixing is resolution-agnostic (rfft2 at any H x W >= modes),
        # so the SAME trained parameters answer queries on a finer
        # grid they never saw — scored against a fresh FEM set and the
        # closed form at that resolution.
        md_sr = apt.MeshData(apt.create_mesh(args.superres_mesh, 20.0),
                             domain, nt=args.nt)
        n_sr = 64
        Xsr, Ysr, probs_sr = fno.make_plume_dataset(
            md_sr, domain, jax.random.PRNGKey(7), n_sr)
        pred_sr = np.asarray(fno_predict_batched(params, Xsr))
        ysr = np.asarray(Ysr)
        den_sr = np.sqrt((ysr ** 2).sum(axis=(1, 2, 3)))
        num_sr = np.sqrt(((pred_sr - ysr) ** 2).sum(axis=(1, 2, 3)))
        rel_sr_fem = float((num_sr / np.maximum(den_sr, 1e-12)).mean())
        coords_sr = fno.grid_coordinates(md_sr)
        cc_sr = jnp.asarray(coords_sr.reshape(-1, 2), dtype=Xsr.dtype)
        xyt_sr = jnp.concatenate(
            [cc_sr, jnp.full((cc_sr.shape[0], 1), domain.T,
                             dtype=cc_sr.dtype)], axis=1)
        exact_sr = np.stack([
            np.asarray(p.analytical_solution(xyt_sr)).reshape(
                coords_sr.shape[0], coords_sr.shape[0])
            for p in probs_sr
        ])[..., None]
        den_e = np.sqrt((exact_sr ** 2).sum(axis=(1, 2, 3)))
        rel_sr_exact = float((np.sqrt(
            ((pred_sr - exact_sr) ** 2).sum(axis=(1, 2, 3))
        ) / np.maximum(den_e, 1e-12)).mean())
        rel_sr_fem_exact = float((np.sqrt(
            ((ysr - exact_sr) ** 2).sum(axis=(1, 2, 3))
        ) / np.maximum(den_e, 1e-12)).mean())
        sr = {
            "superres_mesh": args.superres_mesh,
            "superres_grid": int(Xsr.shape[1]),
            "superres_rel_l2_vs_fem": rel_sr_fem,
            "superres_rel_l2_vs_exact": rel_sr_exact,
            "superres_fem_vs_exact": rel_sr_fem_exact,
        }
        log(f"zero-shot super-resolution at {Xsr.shape[1]}^2 (trained "
            f"on {X.shape[1]}^2): rel-L2 vs FEM {rel_sr_fem:.4f}, vs "
            f"closed form {rel_sr_exact:.4f} (FEM itself "
            f"{rel_sr_fem_exact:.4f})")

    out = {
        "mesh_size": args.mesh_size, "grid": int(X.shape[1]),
        "nt": args.nt, "n_train": args.n_train, "n_test": args.n_test,
        "n_times": args.n_times,
        "snapshot_times": None if snap_times is None
        else [float(t) for t in snap_times],
        "modes": args.modes, "width": args.width, "depth": args.depth,
        "n_params": n_params, "epochs": epochs_run,
        "batch": args.batch, "lr": args.lr, "weight_decay": args.weight_decay,
        "dataset_gen_s": t_data, "train_s": t_train,
        "train_steps_per_sec": epochs_run / t_train,
        "loss_first": float(losses_all[0]),
        "loss_last": float(losses_all[-1]),
        "rel_l2_train_vs_fem": rel_tr,
        "rel_l2_holdout_vs_fem": rel_te,
        "rel_l2_holdout_vs_exact": rel_exact,
        "rel_l2_fem_vs_exact": rel_fem,
        "inference_fields_per_sec": fields_per_s,
        "backend": jax.default_backend(),
        **sr,
    }
    if args.write:
        name = ("fno_time_surrogate.json" if args.n_times
                else "fno_surrogate.json")
        path = os.path.abspath(os.path.join(
            os.path.dirname(__file__), "..", "results_snapshot", name))
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        log(f"wrote {path}")
    log(json.dumps(out))


# Module-scope jitted apply: every fno_predict_batched call shares ONE
# trace/compile cache (a fresh jax.jit wrapper per call would re-pay
# trace + executable reload on the remote-compile tunnel).
_fno_apply_jit = jax.jit(fno.fno_apply)


def fno_predict_batched(params, X, batch=32):
    apply = _fno_apply_jit  # eager dispatch is slow on the tunnel
    outs = []
    for i in range(0, X.shape[0], batch):
        xb = X[i:i + batch]
        k = xb.shape[0]
        if k < batch:  # pad so every call reuses one compiled program
            xb = jnp.pad(xb, [(0, batch - k)] + [(0, 0)] * (X.ndim - 1))
        outs.append(apply(params, xb)[:k])
    return jnp.concatenate(outs)


if __name__ == "__main__":
    main()
