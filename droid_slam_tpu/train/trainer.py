"""Training step and loop: unrolled DroidNet forward → differentiable DBA →
three losses → Adam + OneCycle, data-parallel over a device mesh.

TPU-native equivalent of /root/reference/train.py (the reference trains with
torch DDP/NCCL, one process per GPU, train.py:28-36; here a single process
jits the step over a `jax.sharding.Mesh` data axis and XLA inserts the
gradient all-reduce over ICI).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.droid_net import DroidNet
from ..ops import lie
from . import losses as L

Array = jax.Array


@dataclasses.dataclass
class TrainConfig:
    lr: float = 2.5e-4  # train.py:156
    steps: int = 250000
    n_frames: int = 7
    num_iters: int = 15  # unroll steps (train.py:161)
    fixedp: int = 2
    clip: float = 2.5  # grad-norm clip (train.py:125,160)
    weight_decay: float = 1e-5
    w1: float = 10.0  # geodesic (train.py:163)
    w2: float = 0.01  # residual
    w3: float = 0.05  # flow
    restart_prob: float = 0.2
    pct_start: float = 0.01
    # lr schedule: "onecycle" (reference, train.py:157) for from-scratch runs,
    # "constant" for low-lr fine-tune resumes (the reference has no resume
    # story at all — it restores params only, train.py:57-58), "cosine" for
    # a decay-into-the-basin fine-tune (lr → lr_final over `steps`)
    schedule: str = "onecycle"
    lr_final: float = 5e-6  # cosine schedule floor
    # rematerialise update-op + BA activations in backward: required to fit
    # the 15-step unroll at 384x512 on a 16 GB chip (droid_net.DroidNet.remat)
    remat: bool = True


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    # warmup must span >= 1 step: optax's onecycle divides by the interval
    # length, and steps*pct_start < 1 yields a NaN learning rate at step 0
    # (found when a 10-step smoke run silently NaN'd every parameter)
    steps = max(cfg.steps, 2)
    pct = min(max(cfg.pct_start, 1.0 / steps), 0.5)
    if cfg.schedule == "constant":
        # a callable (not a float): keeps the optimizer state tree identical
        # to the onecycle one, so an orbax train state saved under either
        # schedule restores under the other
        schedule = optax.constant_schedule(cfg.lr)
    elif cfg.schedule == "cosine":
        schedule = optax.cosine_decay_schedule(
            init_value=cfg.lr, decay_steps=steps,
            alpha=cfg.lr_final / cfg.lr,
        )
    else:
        schedule = optax.cosine_onecycle_schedule(
            transition_steps=steps,
            peak_value=cfg.lr,
            pct_start=pct,
        )
    return optax.chain(
        # a single bad batch (degenerate scene -> non-finite grads through the
        # BA) must not poison the parameters forever; the reference gets
        # partial protection from GradClip's NaN-zeroing
        # (modules/clipping.py:13-16), this guards every leaf (observed: a
        # 500-step run NaN'd without it). Must zero inf too, not just NaN —
        # an inf leaf makes clip_by_global_norm scale by clip/inf = 0 and the
        # leaf itself becomes inf*0 = NaN downstream of a NaN-only guard.
        _zero_nonfinite(),
        optax.clip_by_global_norm(cfg.clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


def _zero_nonfinite() -> optax.GradientTransformation:
    """Zero every non-finite (NaN or ±inf) gradient element."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), updates
        )
        return updates, state

    return optax.GradientTransformation(init, update)


def init_state(params, cfg: TrainConfig):
    tx = make_optimizer(cfg)
    return {"params": params, "opt_state": tx.init(params["params"]), "step": jnp.int32(0)}


def make_train_step(cfg: TrainConfig, ii: np.ndarray, jj: np.ndarray):
    """Build the jitted train step. The edge graph can be randomised per
    batch (train.py:91-99): pass `ii`/`jj`/`edge_valid` in the batch dict,
    padded to the same static length as the `ii`/`jj` given here (which
    serve as the default graph)."""
    model = DroidNet(remat=cfg.remat)
    tx = make_optimizer(cfg)
    ii = jnp.asarray(ii, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)

    def loss_fn(params, batch):
        images = batch["images"]  # [B, F, H, W, 3] RGB uint8/float
        Ps = batch["poses"]  # [B, F, 7] GT world→camera
        disps_gt = batch["disps"]  # [B, F, H, W] GT inverse depth (full res)
        intrinsics = batch["intrinsics"]  # [B, F, 4] full-res
        Gs0 = batch["poses_init"]  # [B, F, 7]
        disp0 = batch["disps_init"]  # [B, F, h, w]
        g_ii = batch.get("ii", ii)
        g_jj = batch.get("jj", jj)
        g_valid = batch.get("edge_valid", jnp.ones(g_ii.shape, bool))

        out = model.apply(
            params, Gs0, images, disp0, intrinsics / 8.0, g_ii, g_jj,
            num_steps=cfg.num_iters, fixedp=cfg.fixedp, edge_valid=g_valid,
        )

        geo, geo_m = L.geodesic_loss(
            Ps, out.poses, g_ii, g_jj, do_scale=False, edge_valid=g_valid
        )
        B = images.shape[0]
        res, res_m = L.residual_loss(
            out.residuals, edge_valid=jnp.tile(g_valid, B)
        )
        # flow loss at FULL resolution with full-res intrinsics, like the
        # reference (train.py:112) — at 1/8 res it is 8x under-weighted
        flo, flo_m = L.flow_loss(
            Ps, disps_gt, out.poses, out.disps_up, intrinsics,
        )
        total = cfg.w1 * geo + cfg.w2 * res + cfg.w3 * flo
        metrics = {"loss": total, **geo_m, **res_m, **flo_m}
        return total, (metrics, out)

    @jax.jit
    def grad_step(params, batch):
        """Forward + backward only (no optimizer update): the restart loop
        accumulates gradients across passes like the reference's repeated
        loss.backward() (train.py:102-118) and applies ONE optimizer step
        per batch."""
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, out)), grads = grad_fn(params, batch)
        return grads, metrics, out

    @jax.jit
    def apply_step(state, grads):
        """One optimizer update from (possibly accumulated) gradients;
        `step` counts batches, exactly like the reference's total_steps."""
        updates, opt_state = tx.update(
            grads["params"], state["opt_state"], state["params"]["params"]
        )
        params = {"params": optax.apply_updates(state["params"]["params"], updates)}
        return {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }

    def train_step(state, batch):
        grads, metrics, out = grad_step(state["params"], batch)
        return apply_step(state, grads), metrics, out

    train_step.grad = grad_step
    train_step.apply = apply_step
    return train_step


def make_initial_batch(
    rng: np.random.Generator,
    batch: int,
    n_frames: int,
    image_size: Tuple[int, int],
):
    """Synthetic batch with the trainer's initialisation conventions
    (train.py:95-101): Gs starts at [P0, P1, P1, ...], disp0 = 1."""
    H, W = image_size
    h, w = H // 8, W // 8
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (batch, n_frames, 1))
    tw = 0.03 * rng.standard_normal((batch, n_frames, 6)).astype(np.float32)
    poses = np.asarray(lie.retr(jnp.asarray(poses), jnp.asarray(tw)))

    init = poses.copy()
    init[:, 1:] = init[:, 1:2]

    return {
        "images": rng.integers(0, 255, (batch, n_frames, H, W, 3)).astype(np.uint8),
        "poses": poses,
        "disps": (0.5 + rng.random((batch, n_frames, H, W))).astype(np.float32),
        "intrinsics": np.tile(
            np.array([W, W, W / 2, H / 2], np.float32), (batch, n_frames, 1)
        ),
        "poses_init": init,
        "disps_init": np.ones((batch, n_frames, h, w), np.float32),
    }


_REPLICATED_KEYS = {"ii", "jj", "edge_valid"}  # graph shared across the batch


def shard_batch_for_mesh(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch on the mesh: per-sample arrays sharded over the
    leading (batch) axis, the shared edge graph replicated.

    Multi-process (``jax.process_count() > 1``, the DDP analogue of the
    reference's per-GPU torch processes, train.py:28-36): ``batch`` holds the
    PROCESS-LOCAL samples — each process contributes its slice of the global
    batch axis — and the graph keys must be identical on every process."""

    multiprocess = jax.process_count() > 1

    def put(key, x):
        if key in _REPLICATED_KEYS:
            spec = P()
        else:
            spec = P("dp", *([None] * (np.ndim(x) - 1)))
        sharding = NamedSharding(mesh, spec)
        x = np.asarray(x)
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(jnp.asarray(x), sharding)

    return {k: put(k, v) for k, v in batch.items()}


def host_local_slice(arr: Array, local_rows: int | None = None) -> np.ndarray:
    """The process-local rows of a batch-axis-sharded global array (inverse
    of :func:`shard_batch_for_mesh`); the full array when replicated or
    single-process. Used by the host-side restart loop, which must not fetch
    rows another process owns.

    ``local_rows``: the number of batch rows this process owns. Jitted
    outputs carry whatever sharding GSPMD chose — if it replicated an output
    (no out_shardings are pinned on grad_step), the addressable shard holds
    the GLOBAL batch; passing ``local_rows`` recovers this process's slice
    (processes contribute contiguous row blocks in process-index order, the
    layout :func:`shard_batch_for_mesh` builds)."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    # dedup shards by row range: an output replicated across a process's
    # LOCAL devices (but sharded across processes) presents several
    # addressable shards with identical indices — concatenating them all
    # would duplicate rows
    by_start = {}
    for s in arr.addressable_shards:
        by_start.setdefault(s.index[0].start or 0, s)
    shards = [by_start[k] for k in sorted(by_start)]
    first = shards[0].index[0]
    if len(shards) == 1 and (first.start or 0) == 0 and first.stop in (
        None, arr.shape[0]
    ):
        full = np.asarray(shards[0].data)  # fully replicated
        if local_rows is not None and full.shape[0] != local_rows:
            # the slice below assumes process-contiguous row order and an
            # exact global batch (shard_batch_for_mesh's layout); any other
            # shape means a mesh/sharding this helper doesn't understand —
            # fail loudly rather than return another process's rows
            assert full.shape[0] == local_rows * jax.process_count(), (
                full.shape, local_rows, jax.process_count()
            )
            p = jax.process_index()
            return full[p * local_rows:(p + 1) * local_rows]
        return full
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def rendezvous(name: str, timeout_ms: int = 3_600_000) -> None:
    """Cross-process barrier via the jax.distributed coordination service.

    gloo's collective send timeout is hard-capped (~30 min), so multi-process
    training must bound skew explicitly: rendezvous after asymmetric work
    (first-program compiles, one-sided checkpoint saves) before the next
    collective. Centralizes the private-API access
    (tests/test_parallel.py's children use the same discipline)."""
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def replicate_for_mesh(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        # device_put cannot target non-addressable devices; build the global
        # replicated array from the (identical) per-process copy instead
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
