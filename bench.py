"""Headline benchmark: end-to-end tracking throughput (frames/s) at demo scale.

Runs the full per-frame tracking path — motion filter (fnet + corr probe +
GRU), frontend factor-graph updates (corr pyramid + ConvGRU + dense BA) —
on synthetic frames at the reference demo resolution (240×320, 1/8 feature
grid), with every frame forced to become a keyframe (worst case: the real
pipeline runs the frontend only on ~1/3 of frames).

North star (BASELINE.md): >30 fps tracking on one TPU v5e chip.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"};
`extra` carries the secondary driver-readable metrics — terminate (global BA)
wall time for the tracked session and a backend-scale `update_lowmem` probe
at t≈200 keyframes / 16·t edges (the likelier regression surface now that
tracking is past target). Set BENCH_BACKEND_T=0 to skip the backend probe,
or to another keyframe count to rescale it.
"""

import json
import os
import time

# first compiles of the fused track step are minutes (CLAUDE.md script rule)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

import jax
import jax.numpy as jnp


def backend_scale_probe(t: int = 200, image_size=(240, 320)) -> dict:
    """Time one global-BA step (`update_lowmem`: AltCorr + chunked update op
    + block-sparse-Schur GN) over a synthetic t-keyframe map with ~16·t
    proximity-style edges — the reference terminate path at ETH3D-ish scale
    (/root/reference/droid_slam/factor_graph.py:255-302, droid_backend.py:32).
    """
    from droid_slam_tpu.models.droid_net import init_params
    from droid_slam_tpu.ops import lie
    from droid_slam_tpu.runtime.backend import _pow2ceil
    from droid_slam_tpu.runtime.config import DroidConfig
    from droid_slam_tpu.runtime.factor_graph import FactorGraph
    from droid_slam_tpu.runtime.video import VideoState

    cfg = DroidConfig(image_size=image_size, buffer=t + 8, window_pad=64)
    h, w = cfg.feat_size
    params = init_params(jax.random.PRNGKey(1))
    upd = {"params": params["params"]["update"]}

    rng = np.random.default_rng(5)
    v = VideoState(cfg)
    v.counter = t
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (cfg.buffer, 1))
    tw = np.zeros((cfg.buffer, 6), np.float32)
    tw[:t] = np.cumsum(0.01 * rng.standard_normal((t, 6)), axis=0).astype(np.float32)
    v.poses = lie.retr(jnp.asarray(poses), jnp.asarray(tw))
    v.disps = jnp.asarray((0.5 + rng.random((cfg.buffer, h, w))).astype(np.float32))
    v.intrinsics = jnp.asarray(
        np.broadcast_to(
            np.array([image_size[1] / 8, image_size[1] / 8, w / 2, h / 2], np.float32),
            (cfg.buffer, 4),
        ).copy()
    )
    v.fmaps = jnp.asarray(rng.standard_normal((cfg.buffer, 1, h, w, 128)).astype(np.float32))
    v.nets = jnp.asarray(np.tanh(rng.standard_normal((cfg.buffer, h, w, 128))).astype(np.float32))
    v.inps = jnp.asarray(rng.standard_normal((cfg.buffer, h, w, 128)).astype(np.float32))

    graph = FactorGraph(v, upd, max_factors=_pow2ceil(16 * t),
                        edge_pad=_pow2ceil(16 * t), inactive_pad=16)

    # 16·t-edge graph: temporal neighborhood + random long-range, both directions
    ii, jj = [], []
    for i in range(t):
        for d in (1, 2):
            if i - d >= 0:
                ii.extend([i, i - d])
                jj.extend([i - d, i])
    n_rand = 8 * t - len(ii) // 2
    a = rng.integers(0, t, 2 * n_rand)
    b = rng.integers(0, t, 2 * n_rand)
    keep = np.abs(a - b) > 2
    ii.extend(a[keep][:n_rand])
    jj.extend(b[keep][:n_rand])
    ii.extend(b[keep][:n_rand])
    jj.extend(a[keep][:n_rand])
    graph.add_factors(np.asarray(ii, np.int32), np.asarray(jj, np.int32))

    n_edges = graph.num_active
    graph.update_lowmem(steps=1)  # compile + warm
    jax.block_until_ready(v.poses)

    t_host0 = time.perf_counter()
    graph.update_lowmem(steps=2)
    jax.block_until_ready(v.poses)
    dt = (time.perf_counter() - t_host0) / 2
    return {
        "backend_step_s": round(dt, 3),
        "backend_keyframes": t,
        "backend_edges": int(n_edges),
    }


def _probe_tunnel():
    """Fail fast (not hang) when the axon relay is down — same pattern as
    tests/conftest.py. A dead relay blocks jax.devices() forever in the
    plugin's connect-retry loop; probe it in a subprocess with a deadline."""
    import subprocess
    import sys

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    if os.environ.get("BENCH_SKIP_PROBE"):
        return  # flapping-relay escape: caller handles hangs with timeout
    # no JAX_PLATFORMS skip: the sitecustomize plugin blocks backend init in
    # its connect-retry loop even under an in-process JAX_PLATFORMS=cpu pin
    # (CLAUDE.md) — only unsetting PALLAS_AXON_POOL_IPS makes a run safe
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=120, capture_output=True,
        )
    except subprocess.TimeoutExpired:
        print(
            "bench: axon TPU tunnel configured but jax.devices() hung >120s "
            "— relay down; refusing to hang. CPU run: "
            "env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python bench.py",
            file=sys.stderr,
        )
        raise SystemExit(3)


def main():
    _probe_tunnel()
    from droid_slam_tpu.runtime import Droid, DroidConfig

    config = DroidConfig(
        image_size=(240, 320),
        buffer=64,
        warmup=8,
        max_factors=48,
        inactive_pad=96,
        window_pad=32,
        filter_thresh=-1.0,  # every frame keyframes (worst case)
        keyframe_thresh=0.0,  # never cull (synthetic distances are arbitrary)
        frontend_window=16,
        frontend_thresh=1e9,
        backend_thresh=1e9,
    )
    droid = Droid(config)

    rng = np.random.default_rng(0)
    H, W = config.image_size
    intr = jnp.asarray([W * 1.2, W * 1.2, W / 2, H / 2], jnp.float32)

    frames = [
        jnp.asarray(rng.integers(0, 255, (H, W, 3), np.uint8)) for _ in range(28)
    ]

    # warmup: init + a few steady-state updates → everything compiles
    t = 0
    for _ in range(config.warmup + 4):
        droid.track(t, frames[t % len(frames)], intrinsics=intr)
        t += 1
    droid.sync()  # fence on the LIVE fused state (video.poses is a stale copy)

    n_timed = 30  # long steady-state window: run-to-run noise was ±0.6 fps at 12

    # timed steady-state tracking
    start = time.perf_counter()
    for _ in range(n_timed):
        droid.track(t, frames[t % len(frames)], intrinsics=intr)
        t += 1
    droid.sync()
    elapsed = time.perf_counter() - start

    fps = n_timed / elapsed

    # precompile the terminate path in the idle moment after tracking (what
    # a production deployment does): terminate_cold_s then measures the
    # warmed-process first terminate instead of program compiles/loads.
    # NOT before the timed window — resident backend executables cost the
    # track step ~2 fps (measured A/B, r4), a price any session pays only
    # once terminate programs load. BENCH_WARM_TERMINATE=0 skips (A/B knob).
    warm_terminate_on = os.environ.get("BENCH_WARM_TERMINATE", "1") != "0"
    warm_precompile_s = 0.0
    if warm_terminate_on:
        t_w0 = time.perf_counter()
        droid.warm_terminate(expected_keyframes=droid.video.counter
                             if not droid.fused else t)
        warm_precompile_s = time.perf_counter() - t_w0

    # ---- terminate (global BA) on the tracked session: first call pays the
    # compiles (cold), the second measures the steady-state backend cost ----
    t_term0 = time.perf_counter()
    droid.terminate()
    t_term_cold = time.perf_counter() - t_term0
    t_term0 = time.perf_counter()
    droid.terminate()
    t_term = time.perf_counter() - t_term0
    # warm_terminate_s makes the cold number self-describing: with the
    # precompile on, terminate_cold_s is the warmed-process first terminate
    # and the compile/load cost sits in warm_precompile_s; with it off,
    # terminate_cold_s includes the compiles (the pre-r4 definition)
    extra = {
        "terminate_warm_s": round(t_term, 3),
        "terminate_cold_s": round(t_term_cold, 3),
        "warm_precompile": warm_terminate_on,
        "warm_precompile_s": round(warm_precompile_s, 3),
        "terminate_keyframes": int(droid.video.counter),
    }

    # ---- backend-scale global BA probe ----
    bt = int(os.environ.get("BENCH_BACKEND_T", "200"))
    if bt > 0:
        extra.update(backend_scale_probe(bt))

    # ---- reference-scale long-loop session (384×512, ≥150 keyframes,
    # loop revisit): track + warm_terminate + both global-BA passes +
    # filler, reporting terminate wall time and scale-corrected ATE.
    # Auto mode runs only when the rendered-sequence cache exists
    # (tools/longloop.py builds it; rendering costs minutes of host
    # raycasting that the driver's bench run should not pay). ----
    llp = os.environ.get("BENCH_LONGLOOP", "auto")
    ll_frames, (ll_h, ll_w) = 240, (384, 512)
    ll_cache = f"/tmp/droid_longloop_7_{ll_frames}_{ll_h}x{ll_w}.npz"
    if llp == "1" or (llp == "auto" and os.path.exists(ll_cache)):
        from tools.longloop import run as longloop_run

        extra["longloop"] = longloop_run(7, ll_frames, ll_h, ll_w,
                                         config.compute_dtype)

    print(
        json.dumps(
            {
                "metric": "tracking_fps_keyframe_worst_case",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
