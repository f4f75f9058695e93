"""Per-frame front-end: ORB extraction + stereo matching as one device program.

Replaces the reference Frame construction (src/Frame.cpp:98-135: two
extraction threads + ComputeStereoMatches + grid assignment) with a single
jitted launch over the stereo pair. The 64x48 feature grid
(reference Frame.hpp:20-21) has no equivalent here: the matchers do dense
masked candidate search, which on TPU is cheaper than bucketing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import camera as camera_mod
from ..ops import matchers, orb


class FrameFeatures(NamedTuple):
    """Device pytree: left-eye features + stereo depth. Capacity N."""

    uv: jax.Array  # [N,2] level-0 coords
    octave: jax.Array  # [N]
    angle: jax.Array  # [N]
    response: jax.Array  # [N]
    desc: jax.Array  # [N,8] uint32
    valid: jax.Array  # [N]
    u_right: jax.Array  # [N] -1 if no stereo match
    depth: jax.Array  # [N] -1 if no stereo match


@dataclass
class Frontend:
    config: SlamConfig

    def __post_init__(self):
        c = self.config
        self.orb_params = orb.OrbParams(
            n_features=c.orb.n_features,
            n_levels=c.orb.n_levels,
            scale_factor=c.orb.scale_factor,
            ini_th=float(c.orb.ini_th_fast),
            min_th=float(c.orb.min_th_fast),
        )
        self.camera = camera_mod.make_camera(
            c.camera.fx, c.camera.fy, c.camera.cx, c.camera.cy,
            bf=c.camera.bf, width=c.camera.width, height=c.camera.height,
        )
        self.scale_factors = jnp.asarray(
            orb.scale_factors(self.orb_params), jnp.float32
        )
        self.level_sigma2 = np.asarray(orb.level_sigma2(self.orb_params))
        self.inv_level_sigma2 = jnp.asarray(1.0 / self.level_sigma2, jnp.float32)
        bf = float(c.camera.bf)
        baseline = float(c.baseline)
        params = self.orb_params
        sf = self.scale_factors

        # keypoint undistortion (reference Frame::UndistortKeyPoints,
        # Frame.cpp:471-503): active when the YAML carries distortion
        # (k1 != 0 — raw monocular cameras); a no-op for rectified stereo.
        cc = c.camera
        self.has_distortion = any(
            abs(x) > 0 for x in (cc.k1, cc.k2, cc.p1, cc.p2, cc.k3)
        )

        def _undistort(uv):
            if not self.has_distortion:
                return uv
            from ..ops import undistort as und

            return und.undistort_points(
                uv, cc.fx, cc.fy, cc.cx, cc.cy,
                cc.k1, cc.k2, cc.p1, cc.p2, cc.k3,
            )

        def features_body(images):
            """Traceable frontend body (ORB + stereo matching); composes
            into larger fused programs (the tracker's one-sync-per-frame
            step) as well as the standalone `_process` jit below."""
            f = orb.extract(images, params)
            sm = matchers.stereo_match(
                f.uv[0], f.octave[0], f.desc[0], f.valid[0],
                f.uv[1], f.octave[1], f.desc[1], f.valid[1],
                sf, bf=bf, min_z=baseline,
            )
            return FrameFeatures(
                uv=_undistort(f.uv[0]), octave=f.octave[0], angle=f.angle[0],
                response=f.response[0], desc=f.desc[0], valid=f.valid[0],
                u_right=sm.u_right, depth=sm.depth,
            )

        self.features_body = features_body
        self._process = jax.jit(features_body)

        @jax.jit
        def _process_mono(image):
            f = orb.extract(image[None], params)
            n = f.uv.shape[1]
            no_stereo = jnp.full((n,), -1.0, jnp.float32)
            return FrameFeatures(
                uv=_undistort(f.uv[0]), octave=f.octave[0], angle=f.angle[0],
                response=f.response[0], desc=f.desc[0], valid=f.valid[0],
                u_right=no_stereo, depth=no_stereo,
            )

        self._process_mono = _process_mono

    def process(self, im_left: np.ndarray, im_right: np.ndarray) -> FrameFeatures:
        images = jnp.stack(
            [jnp.asarray(im_left, jnp.float32), jnp.asarray(im_right, jnp.float32)]
        )
        return self._process(images)

    def measure_stage_split(self, im_left, im_right, reps: int = 20):
        """Measured ORB-extraction vs stereo-matching cost split.

        The per-frame pipeline deliberately fuses extraction + stereo
        matching into one device program (the reference times them as two
        stages, Frame.cpp:112-132); for line-comparable timing reports
        this measures the extraction-only program and the fused program
        under identical sync discipline and attributes the difference to
        stereo matching. Returns (orb_seconds[reps], full_seconds[reps])."""
        import time

        import jax

        from ..ops import orb as orb_mod

        params = self.orb_params
        images = jnp.stack(
            [jnp.asarray(im_left, jnp.float32), jnp.asarray(im_right, jnp.float32)]
        )
        extract = jax.jit(lambda im: orb_mod.extract(im, params))
        f = extract(images)
        _ = float(jnp.sum(f.response))  # warm + value-fetch sync
        out = self._process(images)
        _ = float(jnp.sum(out.depth))
        t_orb, t_full = [], []
        for _i in range(reps):
            t0 = time.perf_counter()
            f = extract(images)
            _ = float(jnp.sum(f.response))
            t_orb.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            out = self._process(images)
            _ = float(jnp.sum(out.depth))
            t_full.append(time.perf_counter() - t0)
        return t_orb, t_full

    def process_mono(self, image: np.ndarray) -> FrameFeatures:
        return self._process_mono(jnp.asarray(image, jnp.float32))


class FrameHost:
    """Host-side (numpy) snapshot of a processed frame, for map admin.

    Host arrays are fetched LAZILY: the per-frame tracking hot path runs
    as one fused device program and never reads them (each synchronous
    device->host transfer over the TPU tunnel costs a full ~30 ms round
    trip), while keyframe creation / mapping / relocalization touch any
    field and trigger ONE batched transfer of all of them.
    """

    _HOST_FIELDS = (
        "uv", "octave", "angle", "response", "desc", "valid",
        "u_right", "depth",
    )

    def __init__(
        self,
        features: FrameFeatures,
        timestamp: float,
        frame_id: int,
        eager: bool = True,
    ):
        self.timestamp = timestamp
        self.frame_id = frame_id
        # device-resident copy: downstream matchers/optimizers take these
        # directly, avoiding host->device re-uploads of per-frame features
        self._dev = features
        if eager:
            self._fetch_host()
        n = features.valid.shape[0]
        self.point_ids = np.full(n, -1, np.int64)  # matched map point per kp
        self.outlier = np.zeros(n, bool)
        self.Tcw: Optional[np.ndarray] = None  # [4,4] float32
        # localization-only mode: per-kp "visual odometry" 3D points that
        # are not in the map (reference mlpTemporalPoints, Tracking.cpp:648)
        self.temp_points = {}

    def _fetch_host(self):
        # ONE batched device->host transfer: per-leaf np.asarray would pay
        # a full tunnel round trip per field (~8x the latency)
        self.attach_host(jax.device_get(self._dev))

    def attach_host(self, f: FrameFeatures):
        """Install already-fetched host arrays (the pipelined tracker
        fetches features together with the step outputs in one transfer)."""
        self.uv = f.uv
        self.octave = f.octave
        self.angle = f.angle
        self.response = f.response
        self.desc = f.desc
        self.valid = f.valid
        self.u_right = f.u_right
        self.depth = f.depth

    def __getattr__(self, name):
        # only reached when normal attribute lookup fails: first host
        # access on a lazily-constructed frame triggers the batched fetch
        if name in FrameHost._HOST_FIELDS and "_dev" in self.__dict__:
            self._fetch_host()
            return self.__dict__[name]
        raise AttributeError(
            f"{type(self).__name__!r} object has no attribute {name!r}"
        )

    @property
    def n_keypoints(self) -> int:
        return int(self.valid.sum())

    @property
    def dev(self) -> FrameFeatures:
        """Device-resident features; re-uploaded lazily for frames restored
        from a checkpoint (which carry numpy arrays only)."""
        if getattr(self, "_dev", None) is None:
            self._dev = FrameFeatures(
                uv=jnp.asarray(self.uv), octave=jnp.asarray(self.octave),
                angle=jnp.asarray(self.angle), response=jnp.asarray(self.response),
                desc=jnp.asarray(self.desc), valid=jnp.asarray(self.valid),
                u_right=jnp.asarray(self.u_right), depth=jnp.asarray(self.depth),
            )
        return self._dev
