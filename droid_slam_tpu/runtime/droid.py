"""Droid: the SLAM system facade.

TPU-native equivalent of /root/reference/droid_slam/droid.py: owns the
network parameters, the keyframe video buffer, and the pipeline stages;
`track()` runs the motion filter + frontend per input frame;
`terminate()` runs the global backend twice (7 then 12 steps) and fills
non-keyframe poses.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .backend import DroidBackend
from .config import DroidConfig
from .frontend import DroidFrontend
from .motion_filter import MotionFilter
from .trajectory_filler import PoseTrajectoryFiller
from .video import VideoState


class Droid:
    """SLAM system facade.

    Two tracking engines share all math and state layout:
      * ``fused=True`` (default): the zero-sync on-device tracking step
        (runtime/fused.py) — the host streams frames into the async dispatch
        queue and never blocks; state is read back once at `terminate`.
      * ``fused=False``: the host-driven runtime mirroring the reference's
        per-stage structure (motion filter / factor graph / frontend objects)
        — more introspectable, ~3 blocking device round-trips per frame.
    """

    def __init__(
        self,
        config: DroidConfig,
        params=None,
        weights: Optional[str] = None,
        fused: bool = True,
        ba_mesh=None,  # Mesh with a 'ba' axis → distributed global BA
        visualize: bool = False,  # spawn the live map visualizer (droid.py:37-40)
        vis_refresh_hz: float = 2.0,
    ):
        self.config = config
        if params is None:
            if weights is not None:
                if weights.endswith(".pth"):
                    from ..models.weights import load_reference_checkpoint

                    params = load_reference_checkpoint(weights)
                else:
                    from ..train.checkpoints import load_params

                    params = load_params(weights)
            else:
                # random init (useful for smoke tests; real runs need weights)
                from ..models.droid_net import init_params

                params = init_params(jax.random.PRNGKey(0))
        self.params = params
        update_params = {"params": params["params"]["update"]}
        self.fused = fused

        self.video = VideoState(config)
        if fused:
            from . import fused as fused_mod

            self._fused_state = fused_mod.init_state(config)
            self._track_step = fused_mod.build_track_step(params, config)
        else:
            self.filterx = MotionFilter(params, self.video, thresh=config.filter_thresh)
            self.frontend = DroidFrontend(update_params, self.video, config)
        self.backend = DroidBackend(update_params, self.video, config, mesh=ba_mesh)
        self.traj_filler = PoseTrajectoryFiller(params, self.video, config)

        self.visualizer = None
        if visualize:
            from ..utils.visualization import VisualizerThread

            self.visualizer = VisualizerThread(
                self, refresh_hz=vis_refresh_hz, open_window=True
            )

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """Per-frame tracking: motion filter + frontend (droid.py:62-73)."""
        if self.fused:
            import jax.numpy as jnp

            from .video import _depth_to_disp_sens

            img = jnp.asarray(image)
            if img.ndim == 3:
                img = img[None]
            h, w = self.config.feat_size
            if depth is not None:
                sens = _depth_to_disp_sens(jnp.asarray(depth), h, w)
            else:
                sens = jnp.zeros((h, w), jnp.float32)
            self._fused_state = self._track_step(
                self._fused_state,
                jnp.float32(tstamp),
                img,
                jnp.asarray(intrinsics, jnp.float32),
                sens,
            )
            return
        self.filterx.track(tstamp, image, depth, intrinsics)
        self.frontend()

    def sync(self):
        """Block until all dispatched tracking work has completed on device.

        In fused mode `track` is fully asynchronous (frames pipeline through
        the dispatch queue); timing or state reads must fence on the live
        fused state, not the stale host-side video copy."""
        import jax

        if self.fused:
            jax.block_until_ready(self._fused_state.poses)
        else:
            jax.block_until_ready(self.video.poses)

    def _sync_fused_state(self, view_only: bool = False):
        """One blocking read: materialise the fused device state into the
        host-driven VideoState for the backend / trajectory filler.

        Buffers are COPIED, not aliased: the backend/filler kernels donate
        the VideoState arrays in place, and an alias of the live fused state
        would be deleted by that donation — a second terminate (or the
        visualizer polling during one) would then read dead buffers
        (INVALID_ARGUMENT from the runtime).

        ``view_only`` copies just what the visualizer's point cloud needs
        (poses/disps/images/tstamp/intrinsics) and skips fmaps/nets/inps —
        hundreds of MB at 512-buffer scale that a refresh tick should not
        tax tracking with."""
        import jax.numpy as jnp

        st = self._fused_state
        v = self.video
        v.counter = int(st.counter)
        if v.counter >= st.poses.shape[0] and not view_only:
            import warnings

            warnings.warn(
                f"keyframe buffer saturated ({v.counter}/{st.poses.shape[0]}): "
                "later keyframes were dropped; rerun with a larger "
                "DroidConfig.buffer (reference demo.py:93 uses 512-1024)",
                RuntimeWarning,
            )
        v.tstamp = jnp.copy(st.tstamp)
        v.images = jnp.copy(st.images)
        v.poses = jnp.copy(st.poses)
        v.disps = jnp.copy(st.disps)
        v.intrinsics = jnp.copy(st.intrinsics)
        if not view_only:
            v.disps_sens = jnp.copy(st.disps_sens)
            v.fmaps = jnp.copy(st.fmaps)
            v.nets = jnp.copy(st.nets)
            v.inps = jnp.copy(st.inps)
        if self.config.upsample:
            v.disps_up = jnp.copy(st.disps_up)
        v.dirty[: v.counter] = True

    def warm_terminate(self, expected_keyframes: Optional[int] = None) -> None:
        """Precompile the terminate path for an expected keyframe count.

        The backend's program shapes quantize on the keyframe count (edge
        store = pow2ceil(16·t), BA window = 32-multiples, Schur pairs =
        pow2 buckets), so the FIRST terminate of a session pays minutes of
        compiles — or seconds of persistent-cache loads — over the axon
        tunnel (measured 16-43 s; CLAUDE.md). Calling this during an idle
        moment (e.g. right after tracking warmup, or from a background
        thread) runs both global-BA passes on a THROWAWAY buffer-shaped
        dummy state with the same quantized shapes, so the real terminate
        finds every program warm in-process. Live state is never touched.

        ``expected_keyframes`` defaults to the buffer capacity. If the
        session ends in a different quantization bucket (edge/pair-pad
        power of two or BA-window 32-multiple), only the mismatched
        programs compile at terminate — never worse than not warming.
        """
        import jax
        import jax.numpy as jnp

        cfg = self.config
        t = cfg.buffer - 2 if expected_keyframes is None else int(expected_keyframes)
        # clamp to what a real session can reach (counter <= buffer):
        # warming an unreachable bucket pays minutes of compiles for
        # programs the real terminate can never use
        t = min(max(t, 2), cfg.buffer - 2)
        v = VideoState(cfg)
        v.counter = t
        # tiny pose jitter so proximity distances are finite and generic;
        # edge selection then fills the same 16·t budget a real long
        # session does
        rng = np.random.default_rng(0)
        from ..ops import lie

        tw = jnp.asarray(
            np.cumsum(0.01 * rng.standard_normal((cfg.buffer, 6)), 0),
            jnp.float32,
        )
        v.poses = lie.retr(v.poses, tw)
        h, w = cfg.feat_size
        v.intrinsics = jnp.broadcast_to(
            jnp.asarray([1.2 * w, 1.2 * w, w / 2, h / 2], jnp.float32),
            (cfg.buffer, 4),
        )
        backend = DroidBackend(self.backend.params, v, cfg,
                               mesh=self.backend.mesh)
        backend(2)  # same programs as the 7- and 12-step passes
        # warm the trajectory-filler family too: encoder + 2M-edge graph +
        # 6 motion-only updates at the fixed fill batch. These were the
        # dominant remaining cold-terminate programs (BENCH_r04: 28.5 s
        # cold with only the backend warmed); the filler now pads partial
        # batches, so ONE family covers any stream length.
        batch = min(16, cfg.buffer - t)
        if batch >= 1:
            import jax.numpy as jnp_

            v.tstamp = jnp_.arange(cfg.buffer, dtype=jnp_.float32)
            H, W = cfg.image_size
            intr_full = np.asarray(
                [1.2 * W, 1.2 * W, W / 2, H / 2], np.float32
            )
            dummy = np.zeros((H, W, 3), np.uint8)
            stream = [(k + 0.5, dummy, intr_full) for k in range(batch)]
            PoseTrajectoryFiller(self.params, v, cfg)(iter(stream))
        np.asarray(lie.inv(v.poses))  # pose-inv program + full fence

    def terminate(self, stream=None) -> np.ndarray:
        """Global BA + trajectory fill; returns camera-to-world poses [T, 7]
        (droid.py:75-89)."""
        # stop the visualizer BEFORE global BA: in fused mode its poll calls
        # _sync_fused_state(), which would overwrite video.poses/disps with
        # the stale pre-terminate fused state between backend steps and
        # silently revert the optimization
        if self.visualizer is not None:
            self.visualizer.close()

        if self.fused:
            self._sync_fused_state()
        else:
            del self.frontend

        self.backend(7)
        self.backend(12)

        # one synchronous refresh so visualizer consumers (sink / .latest)
        # see the backend-OPTIMIZED map, not the last tracking-time poll
        if self.visualizer is not None:
            self.visualizer.final_update()

        if stream is not None:
            return self.traj_filler(stream)

        from ..ops import lie

        # invert the FULL padded buffer and slice on the host: a [t, 7]
        # program would recompile for every distinct keyframe count (each
        # fresh compile is ~5 s over the axon tunnel — measured as the
        # single largest cold-terminate stage); the padded rows are identity
        # quaternions whose inverse costs nothing
        t = self.video.counter
        return np.asarray(lie.inv(self.video.poses))[:t]
