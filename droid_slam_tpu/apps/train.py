"""Training entry point.

TPU-native equivalent of /root/reference/train.py: TartanAir clips sampled
through the covisibility graph, randomized edge graphs, the unrolled
DroidNet forward with differentiable DBA, random restarts, Adam + OneCycle,
gradient clipping, periodic checkpoints. Data parallelism is a `('dp',)`
device mesh (XLA inserts the gradient all-reduce; the reference spawns one
torch-DDP process per GPU, train.py:28-36,186).

Usage:
  python -m droid_slam_tpu.apps.train --datapath datasets/TartanAir
      --name mymodel --batch 4 --steps 250000 [--ckpt restore.msgpack]
"""

from __future__ import annotations

import argparse
import os

# first compiles of the tracking/training steps are minutes; persistent
# cache unless the caller chose one (CLAUDE.md rule for all scripts)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def pad_graph(ii, jj, n_edges: int):
    """Pad an edge list to a fixed length with a validity mask."""
    n = len(ii)
    assert n <= n_edges, (n, n_edges)
    ii_p = np.zeros(n_edges, np.int32)
    jj_p = np.zeros(n_edges, np.int32)
    valid = np.zeros(n_edges, bool)
    ii_p[:n] = ii
    jj_p[:n] = jj
    valid[:n] = True
    return ii_p, jj_p, valid


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", default="droid", help="experiment name")
    parser.add_argument("--ckpt", help="params-only checkpoint to restore (msgpack)")
    parser.add_argument("--resume", help="full train-state checkpoint dir (orbax): "
                        "restores params + optimizer + step counter")
    parser.add_argument("--schedule", default="onecycle",
                        choices=["onecycle", "constant", "cosine"],
                        help="lr schedule; constant for low-lr fine-tune "
                        "resumes, cosine for a decay-to---lr_final fine-tune")
    parser.add_argument("--lr_final", type=float, default=5e-6,
                        help="cosine schedule floor (ignored otherwise)")
    parser.add_argument("--state_every", type=int, default=0,
                        help="save a full resumable train state (orbax) every N "
                        "steps in addition to the msgpack params (0 = off)")
    parser.add_argument("--datapath", default=None)
    parser.add_argument("--synthetic", action="store_true",
                        help="train on procedurally rendered scenes "
                        "(data/synthetic.py) instead of TartanAir")
    parser.add_argument("--varied_frac", type=float, default=0.7,
                        help="synthetic: fraction of clips from the VARIED "
                        "curriculum (rich textures, extra planes, motion "
                        "modes, close-ups)")
    parser.add_argument("--ckpt_every", type=int, default=10000)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--steps", type=int, default=250000)
    parser.add_argument("--lr", type=float, default=2.5e-4)
    parser.add_argument("--n_frames", type=int, default=7)
    parser.add_argument("--iters", type=int, default=15)
    parser.add_argument("--fmin", type=float, default=8.0)
    parser.add_argument("--fmax", type=float, default=96.0)
    parser.add_argument("--w1", type=float, default=10.0)
    parser.add_argument("--w2", type=float, default=0.01)
    parser.add_argument("--w3", type=float, default=0.05)
    parser.add_argument("--edges", type=int, default=24)
    parser.add_argument("--restart_prob", type=float, default=0.2)
    parser.add_argument("--clip", type=float, default=2.5)
    parser.add_argument("--crop", type=int, nargs=2, default=[384, 512])
    # multi-process data parallelism (the reference spawns one torch-DDP
    # process per GPU with an NCCL rendezvous, train.py:28-36,184-186; here
    # each process joins a jax.distributed coordination service and the SAME
    # jitted step runs over the global mesh — XLA's all-reduce replaces NCCL)
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0; enables multi-process "
                        "training when --num_processes > 1")
    parser.add_argument("--num_processes", type=int, default=1)
    parser.add_argument("--process_id", type=int, default=0)
    args = parser.parse_args()

    import jax

    if args.num_processes > 1:
        assert args.coordinator, "--coordinator required with --num_processes"
        # CPU cross-process collectives need an explicit backend; the setting
        # is ignored by non-CPU backends, so set it unconditionally rather
        # than string-matching JAX_PLATFORMS (which may be unset or a list)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    is_main = jax.process_index() == 0

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ..data.dataset import TartanAir
    from ..models.droid_net import init_params
    from ..ops import lie
    from ..train import checkpoints
    from ..train.graph_utils import build_frame_graph, graph_to_edge_list
    from ..train.trainer import (
        TrainConfig,
        host_local_slice,
        init_state,
        make_train_step,
        rendezvous,
        replicate_for_mesh,
        shard_batch_for_mesh,
    )
    from ..utils.logger import Logger

    cfg = TrainConfig(
        lr=args.lr, steps=args.steps, n_frames=args.n_frames,
        num_iters=args.iters, clip=args.clip,
        w1=args.w1, w2=args.w2, w3=args.w3, restart_prob=args.restart_prob,
        schedule=args.schedule, lr_final=args.lr_final,
    )

    N = args.n_frames
    # default graph: |i−j| ≤ 2 neighborhood (train.py:96-99)
    base_ii, base_jj = [], []
    for i in range(N):
        for j in range(N):
            if i != j and abs(i - j) <= 2:
                base_ii.append(i)
                base_jj.append(j)
    n_edges = max(len(base_ii), args.edges + 4 * N)  # static pad

    # each process samples DISTINCT data (its slice of the global batch);
    # graph/restart decisions below use a SHARED seed so every process runs
    # the same number of forward passes per optimizer step
    assert args.batch % args.num_processes == 0, (args.batch, args.num_processes)
    local_batch = args.batch // args.num_processes
    if args.synthetic:
        from ..data.synthetic import SyntheticDataset

        db = SyntheticDataset(
            n_frames=N, image_size=tuple(args.crop), seed=args.process_id,
            varied_frac=args.varied_frac,
        )
        if is_main:
            print("dataset: procedural synthetic scenes")
    else:
        assert args.datapath, "--datapath required unless --synthetic"
        db = TartanAir(
            datapath=args.datapath, n_frames=N, fmin=args.fmin, fmax=args.fmax,
            crop_size=tuple(args.crop), seed=args.process_id,
        )
        if is_main:
            print(f"dataset: {len(db)} clips")

    params = init_params(jax.random.PRNGKey(0))
    state = init_state(params, cfg)
    if args.resume:
        state = checkpoints.restore_train_state(args.resume, state)
        print(f"resumed full train state from {args.resume} "
              f"(step {int(state['step'])})")
    elif args.ckpt:
        state["params"] = checkpoints.load_params(args.ckpt, state["params"])

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    state = replicate_for_mesh(state, mesh)
    step_fn = make_train_step(cfg, np.asarray(base_ii), np.asarray(base_jj))

    # SHARED seed: the randomized-graph and restart draws must agree across
    # processes (the graph is replicated; a process that ran a different
    # number of restart passes would deadlock the gradient all-reduce)
    rng = np.random.default_rng(12345)
    total_steps = int(jax.device_get(state["step"]))
    first_batch = True
    # seed the logger so a resumed run continues the TB curve instead of
    # overwriting it from step 0
    logger = Logger(args.name, total_steps=total_steps) if is_main else None

    for batch in db.clips(local_batch):
        if args.num_processes > 1 and not first_batch:
            # re-rendezvous at the TOP of every batch: one-sided host work
            # (process-0 checkpoint saves, logging, slow renders on a loaded
            # host) otherwise lets the faster process post the FIRST
            # collective of the next batch (the randomized-graph broadcast
            # below, or the grad all-reduce) half an hour before its peer
            # arrives — past gloo's cap, which killed two real 2-process
            # segments in r4
            rendezvous(f"train_step_{total_steps}")
        # poses: dataset convention c2w → w2c (train.py:86-88)
        Ps = np.asarray(lie.inv(jnp.asarray(batch["poses"])))
        Gs0 = Ps.copy()
        Gs0[:, 1:] = Ps[:, 1:2]

        # randomized graph (train.py:91-99); the draw uses the SHARED rng so
        # every process takes the same branch
        randomized = rng.random() < 0.5
        if randomized:
            graph = build_frame_graph(
                batch["poses"][0], batch["disps"][0], batch["intrinsics"][0],
                num=args.edges,
            )
            gi, gj, _ = graph_to_edge_list(graph)
        else:
            gi, gj = np.asarray(base_ii), np.asarray(base_jj)
        ii_p, jj_p, valid = pad_graph(gi, gj, n_edges)
        if args.num_processes > 1 and randomized:
            if first_batch:
                # the graph broadcast is the first cross-process program of
                # the session when the first batch draws a randomized graph —
                # align the processes before it, or asymmetric startup work
                # (pool renders, imports) lets one process sit in the
                # broadcast alone toward gloo's send cap
                rendezvous("first_graph_broadcast")
            # the covisibility graph above was built from PROCESS-LOCAL data
            # (each process samples distinct clips), but shard_batch_for_mesh
            # places the graph keys replicated — the replicas must be
            # identical on every process, so adopt process 0's graph
            from jax.experimental import multihost_utils

            ii_p, jj_p, valid = (
                np.asarray(a) for a in multihost_utils.broadcast_one_to_all(
                    (ii_p, jj_p, valid)
                )
            )

        h, w = batch["images"].shape[2] // 8, batch["images"].shape[3] // 8
        train_batch = {
            "images": batch["images"],
            "poses": Ps,
            "disps": batch["disps"],
            "intrinsics": batch["intrinsics"],
            "poses_init": Gs0,
            "disps_init": np.ones(
                (batch["images"].shape[0], N, h, w), np.float32
            ),
            "ii": ii_p,
            "jj": jj_p,
            "edge_valid": valid,
        }

        # random restarts (train.py:102-118): like the reference's repeated
        # loss.backward(), gradients ACCUMULATE across restart passes and a
        # single optimizer step is taken per batch. Only adopt a finite
        # estimate as the next pass's initialisation — a diverged forward
        # must not poison it. Always run at least one pass (restart_prob=0
        # must still train).
        grads_sum = None
        # static keys (images etc.) transfer once; restart passes re-put
        # only the two initialisation arrays they update
        sharded = shard_batch_for_mesh(train_batch, mesh)
        if args.num_processes > 1 and first_batch:
            # first batch of this session: AOT-compile the cross-process
            # program BEFORE the rendezvous — asymmetric compile durations
            # (cache hit on one process, miss on the other) otherwise let
            # one process sit in the all-reduce past gloo's cap
            first_batch = False
            step_fn.grad.lower(state["params"], sharded).compile()
            rendezvous("train_first_batch")
        r = -1.0
        while r < args.restart_prob:
            r = rng.random()
            grads, metrics, out = step_fn.grad(state["params"], sharded)
            grads_sum = (
                grads if grads_sum is None
                else jax.tree.map(jnp.add, grads_sum, grads)
            )
            # multi-process: fetch/re-put only the rows this process owns
            # (local_rows guards against GSPMD replicating the output)
            poses_re = host_local_slice(out.poses[-1], local_batch)
            disps_re = host_local_slice(
                out.disps_up[-1][:, :, 3::8, 3::8], local_batch
            )
            if np.isfinite(poses_re).all() and np.isfinite(disps_re).all():
                upd = shard_batch_for_mesh(
                    {"poses_init": poses_re,
                     "disps_init": np.clip(disps_re, 1e-3, 10.0)}, mesh
                )
                sharded = {**sharded, **upd}
        state = step_fn.apply(state, grads_sum)

        total_steps += 1
        if is_main:
            logger.push({k: float(v) for k, v in metrics.items()})

            if total_steps % args.ckpt_every == 0:
                path = f"checkpoints/{args.name}_{total_steps:06d}.msgpack"
                os.makedirs("checkpoints", exist_ok=True)
                checkpoints.save_params(path, jax.device_get(state["params"]))
                print(f"saved {path}")
        if args.state_every and total_steps % args.state_every == 0:
            # orbax's save is a COLLECTIVE in multi-process mode (its
            # StandardCheckpointer runs sync_global_processes barriers):
            # EVERY process must call it — process 0 writes, the others
            # join the sync. Gating this behind is_main left process 0
            # alone in an allgather until gloo's 30-min cap killed it
            # (found by a real 2-process segment, r4).
            spath = f"checkpoints/{args.name}_state_{total_steps:06d}"
            checkpoints.save_train_state(
                spath, jax.device_get(state),
                # only a resumed run may overwrite an existing state dir
                # (it legitimately re-reaches saved steps); a fresh run
                # colliding with an old run's dir should fail loudly
                overwrite=bool(args.resume),
            )
            if is_main:
                print(f"saved {spath}")

        if total_steps >= args.steps:
            break


if __name__ == "__main__":
    main()
