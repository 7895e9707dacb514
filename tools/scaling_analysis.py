"""Back the multi-host global-BA scaling claim with measurable numbers.

The ≥70%-scaling-efficiency north star (BASELINE.json) cannot be measured
directly in this environment (one TPU chip); what CAN be produced here:

  1. **Bytes on the wire per GN iteration** — extracted from the compiled
     HLO of the sharded iteration (all-reduce / all-gather operand shapes),
     as a function of (t, edges, window). This is exact, not estimated.
  2. **Shard-local FLOPs** — XLA's cost analysis of the same executable,
     divided by the shard count.
  3. **Measured single-chip GN wall time** (run with JAX_PLATFORMS=axon on
     the TPU) at the same problem sizes — the T_compute that communication
     must overlap/amortise.
  4. An **implied-efficiency table**: ring-all-reduce time on a v5e ICI link
     (~45 GB/s per direction, 2 links usable per axis on a v5e-64 slice ->
     ~90 GB/s effective; "How to Scale Your Model", TPU chapter) vs the
     measured shard compute: eff = T_comp / (T_comp + T_comm).

Usage:
  # CPU part (HLO bytes + FLOPs), 8 virtual devices:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_analysis.py --sizes 64 128 256
  # TPU part (adds measured single-chip GN step time; 1-device mesh):
  python tools/scaling_analysis.py --sizes 64 128 256 --time
"""

from __future__ import annotations

import argparse
import json
import os
import re
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

# v5e ICI: ~45 GB/s per direction per link; a 2-D torus axis gives 2 links
# -> ~90 GB/s effective ring bandwidth (scaling-book numbers; stated
# assumption, not a measurement)
ICI_GBPS = 90.0


def build_problem(t: int, image_size=(240, 320), seed=5):
    """Synthetic global-BA problem at the bench's backend scale: t keyframes,
    ~16*t proximity-style edges (bench.py backend_scale_probe layout)."""
    import jax.numpy as jnp

    from droid_slam_tpu.ops import lie
    from droid_slam_tpu.ops import projective as pops

    h, w = image_size[0] // 8, image_size[1] // 8
    rng = np.random.default_rng(seed)
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (t, 1))
    tw = np.cumsum(0.01 * rng.standard_normal((t, 6)), axis=0).astype(np.float32)
    poses = np.asarray(lie.retr(jnp.asarray(poses), jnp.asarray(tw)))
    disps = (0.5 + rng.random((t, h, w))).astype(np.float32)
    intr = np.array([image_size[1] / 8, image_size[1] / 8, w / 2, h / 2], np.float32)

    ii, jj = [], []
    for i in range(t):
        for d in (1, 2):
            if i - d >= 0:
                ii.extend([i, i - d])
                jj.extend([i - d, i])
    n_rand = 8 * t - len(ii) // 2
    a = rng.integers(0, t, 3 * n_rand)
    b = rng.integers(0, t, 3 * n_rand)
    keep = np.abs(a - b) > 2
    ii.extend(a[keep][:n_rand]); jj.extend(b[keep][:n_rand])
    ii.extend(b[keep][:n_rand]); jj.extend(a[keep][:n_rand])
    ii = np.asarray(ii, np.int32); jj = np.asarray(jj, np.int32)

    tgt = np.asarray(pops.projective_transform(
        jnp.asarray(poses), jnp.asarray(disps),
        jnp.asarray(np.broadcast_to(intr, (t, 4))),
        jnp.asarray(ii), jnp.asarray(jj))[0])
    wgt = (0.4 + 0.6 * rng.random(tgt.shape)).astype(np.float32)
    eta = np.full((t, h, w), 0.01, np.float32)
    return dict(poses=poses, disps=disps, intr=intr, ii=ii, jj=jj,
                target=tgt, weight=wgt, eta=eta, hw=h * w)


def collective_bytes_from_hlo(hlo: str) -> dict:
    """Sum operand bytes of all-reduce / all-gather / reduce-scatter ops in
    compiled HLO text (shapes like f32[384,6,384,6])."""
    sizes = {"all-reduce": 0, "all-gather": 0, "reduce-scatter": 0}
    dtb = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "f64": 8, "pred": 1}
    # HLO line shape: `%name = <result-type> all-reduce(...)`; result type is
    # a shape or a tuple of shapes. CPU HLO spells it all_gather, TPU
    # all-gather — normalise. all-reduce result bytes == reduced bytes;
    # all-gather result is the gathered (full) array.
    pat = re.compile(
        r"=\s*(?P<shapes>[^=]*?)\s*"
        r"(?P<kind>all[-_]reduce|all[-_]gather|reduce[-_]scatter)"
        r"(?:-start)?\("
    )
    for line in hlo.splitlines():
        m = pat.search(line)
        if m is None:
            continue
        kind = m.group("kind").replace("_", "-")
        for dt, shp in re.findall(
            r"(f32|bf16|f16|s32|f64|pred)\[([\d,]*)\]", m.group("shapes")
        ):
            n = 1
            for d in filter(None, shp.split(",")):
                n *= int(d)
            sizes[kind] += n * dtb[dt]
    return sizes


def analyze(t: int, n_dev_target: int, do_time: bool):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from droid_slam_tpu.ops import ba as ba_ops
    from droid_slam_tpu.parallel.sharded_ba import (
        ShardedBAPlan, build_sharded_ba, place_plan,
    )

    prob = build_problem(t)
    F = t
    t0, t1 = 1, t
    window = -(-(t1 - t0) // 32) * 32
    n_edges = int(len(prob["ii"]))

    devs = jax.devices()
    n_dev = min(n_dev_target, len(devs))
    mesh = Mesh(np.array(devs[:n_dev]), ("ba",))
    plan = ShardedBAPlan.build(prob["ii"], prob["jj"],
                               np.ones(n_edges, bool), n_dev, F, t0, t1)
    run = build_sharded_ba(mesh, window, plan.frames_per_shard)
    plan_arrays = place_plan(mesh, plan, prob["target"], prob["weight"])
    args = (
        plan_arrays, jnp.asarray(prob["poses"]), jnp.asarray(prob["disps"]),
        jnp.asarray(prob["intr"]), jnp.zeros_like(jnp.asarray(prob["disps"])),
        jnp.asarray(prob["eta"]), jnp.int32(t0), jnp.int32(t1),
    )
    lowered = run.lower(*args)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    wire = collective_bytes_from_hlo(hlo)
    # closed-form wire bytes of sharded_ba.py's collective layout: one psum
    # of the combined (H−S, v−v_schur) window system + one tiled all-gather
    # of dz. The multi-device path CROSS-CHECKS these against the compiled
    # HLO so a layout change cannot silently stale the 1-device numbers.
    closed = {
        "all-reduce": (36 * window * window + 6 * window) * 4,
        "all-gather": window * prob["hw"] * 4,
    }
    if n_dev == 1:
        # a 1-device mesh (the real-TPU timing run) compiles no collectives;
        # report the closed forms and say so
        wire["all-reduce"] = closed["all-reduce"]
        wire["all-gather"] = closed["all-gather"]
        wire["analytic"] = True
    else:
        for k, v in closed.items():
            if wire[k] != v:
                print(f"WARNING: closed-form {k} bytes {v} != HLO {wire[k]} "
                      f"at t={t} — sharded_ba.py's collective layout changed; "
                      "update the closed forms (1-device --time runs report "
                      "them)")
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", float("nan")))

    row = {
        "t": t, "edges": n_edges, "window": window, "hw": prob["hw"],
        "n_dev": n_dev,
        "psum_bytes": wire["all-reduce"],
        "allgather_bytes": wire["all-gather"],
        "wire_bytes_analytic": bool(wire.get("analytic", False)),
        "total_flops": flops,
        "flops_per_shard": flops / n_dev,
    }

    if do_time:
        out = run(*args); jax.block_until_ready(out)
        reps = 5
        start = time.perf_counter()
        for _ in range(reps):
            out = run(*args)
        jax.block_until_ready(out)
        row["gn_step_s"] = (time.perf_counter() - start) / reps

    # implied v5e efficiency: ring all-reduce moves 2(D-1)/D * bytes per
    # chip; all-gather (D-1)/D. T_comp(D) ~= measured 1-chip step / D for
    # the shard-local part (the replicated [P6]^2 solve does not shard —
    # subtract nothing here: it is counted against efficiency).
    if "gn_step_s" in row:
        implied = {}
        for D in (4, 8, 16, 64):
            t_comm = (2 * (D - 1) / D * row["psum_bytes"]
                      + (D - 1) / D * row["allgather_bytes"]) / (ICI_GBPS * 1e9)
            t_comp = row["gn_step_s"] / D
            implied[D] = round(t_comp / (t_comp + t_comm), 3)
        row["implied_efficiency_v5e"] = implied
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--time", action="store_true",
                    help="measure GN step wall time (run on the TPU)")
    args = ap.parse_args()

    rows = [analyze(t, args.ndev, args.time) for t in args.sizes]
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
