"""Visualization: Viewer / FrameDrawer / MapDrawer.

The reference runs a live Pangolin GUI thread with three components
(src/Viewer.cpp:32-113 menu + render loop; src/FrameDrawer.cpp annotated
current frame with state text; src/MapDrawer.cpp map points, keyframe
frusta, covisibility graph + spanning tree + loop edges, current camera).
This environment is headless, so the equivalents render to arrays/files
with the same content:

  * ``FrameDrawer.update(tracker, image)`` snapshots the current frame
    (FrameDrawer::Update, FrameDrawer.cpp) and ``draw_frame()`` returns
    the annotated RGB image — tracked map points boxed green, VO points
    blue, untracked gray, plus the status bar text (SLAM/LOCALIZATION
    mode, LOST, match counts — FrameDrawer::DrawTextInfo analog).
  * ``MapDrawer`` draws map points (DrawMapPoints), keyframe frusta and
    the graph — covisibility(>=100) + spanning tree + loop edges
    (DrawKeyFrames/DrawGraph) — and the current camera
    (DrawCurrentCamera / SetCurrentCameraPose) into a matplotlib figure.
  * ``Viewer`` orchestrates both at ~frame rate with the menu toggles as
    booleans (follow camera / show points / show keyframes / show graph
    — Viewer.cpp:46-52) and throttled snapshot output.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_GREEN = (0, 255, 0)
_BLUE = (80, 160, 255)
_GRAY = (90, 90, 90)


class FrameDrawer:
    """Annotated current-frame rendering (reference src/FrameDrawer.cpp)."""

    def __init__(self, system):
        self.system = system
        self.image: Optional[np.ndarray] = None
        self.frame = None
        self.state = None
        self.n_tracked = 0
        self.n_tracked_vo = 0

    def update(self, image: Optional[np.ndarray] = None):
        """Snapshot tracker state (FrameDrawer::Update): copies the current
        image + keypoint/match info so drawing never races tracking."""
        tr = self.system.tracker
        self.frame = tr.last_frame
        self.state = tr.state
        if image is not None:
            self.image = np.asarray(image)
        if self.frame is not None:
            lf = self.frame
            ok = lf.valid & (lf.point_ids >= 0) & ~lf.outlier
            self.n_tracked = int(ok.sum())
            self.n_tracked_vo = len(getattr(lf, "temp_points", {}) or {})

    def status_text(self) -> str:
        """State line (FrameDrawer::DrawTextInfo, FrameDrawer.cpp)."""
        from .tracking import TrackingState

        m = self.system.map
        if self.state is None or self.state == TrackingState.NO_IMAGES_YET:
            return "WAITING FOR IMAGES"
        if self.state == TrackingState.NOT_INITIALIZED:
            return "TRYING TO INITIALIZE"
        if self.state == TrackingState.LOST:
            return "TRACK LOST. TRYING TO RELOCALIZE"
        mode = (
            "LOCALIZATION"
            if getattr(self.system.tracker, "only_tracking", False)
            else "SLAM MODE"
        )
        txt = (
            f"{mode} | KFs: {m.n_keyframes()}, MPs: {len(m.pt_valid)}, "
            f"Matches: {self.n_tracked}"
        )
        if self.n_tracked_vo:
            txt += f", + VO matches: {self.n_tracked_vo}"
        return txt

    def draw_frame(self) -> Optional[np.ndarray]:
        """RGB uint8 image with tracked features marked (DrawFrame)."""
        lf = self.frame
        if lf is None:
            return None
        H = self.system.config.camera.height
        W = self.system.config.camera.width
        if self.image is not None and self.image.shape[:2] == (H, W):
            base = np.clip(self.image, 0, 255).astype(np.uint8)
            img = np.repeat(base[:, :, None], 3, axis=2)
        else:
            img = np.full((H, W, 3), 40, np.uint8)
        for i in np.nonzero(lf.valid)[0]:
            u, v = int(lf.uv[i, 0]), int(lf.uv[i, 1])
            if not (0 <= u < W and 0 <= v < H):
                continue
            if lf.point_ids[i] >= 0 and not lf.outlier[i]:
                color = _GREEN  # map-point match (reference green boxes)
            elif i in getattr(lf, "temp_points", {}):
                color = _BLUE  # visual-odometry point (localization mode)
            else:
                color = _GRAY
            img[max(v - 1, 0) : v + 2, max(u - 1, 0) : u + 2] = color
        self._put_text(img, self.status_text())
        return img

    @staticmethod
    def _put_text(img: np.ndarray, text: str):
        try:
            import cv2

            cv2.rectangle(img, (0, img.shape[0] - 18), (img.shape[1], img.shape[0]),
                          (0, 0, 0), -1)
            cv2.putText(img, text, (4, img.shape[0] - 5),
                        cv2.FONT_HERSHEY_PLAIN, 0.9, (255, 255, 255), 1)
        except Exception:
            img[-18:, :] = 0  # status bar placeholder without cv2


class MapDrawer:
    """Map rendering (reference src/MapDrawer.cpp): points, keyframe
    frusta, covisibility graph / spanning tree / loop edges, current
    camera. Draws into matplotlib axes; ``save`` writes the figure."""

    def __init__(self, system, covis_min_weight: int = 100):
        self.system = system
        self.covis_min_weight = covis_min_weight
        self._Tcw: Optional[np.ndarray] = None

    def set_current_camera_pose(self, Tcw: np.ndarray):
        """SetCurrentCameraPose (MapDrawer.cpp)."""
        self._Tcw = None if Tcw is None else np.asarray(Tcw)

    # ---- element renderers ------------------------------------------

    def draw_map_points(self, ax):
        """DrawMapPoints: all points gray, reference (local) points red."""
        m = self.system.map
        if not len(m.pt_valid):
            return
        P = m.pt_pos[m.pt_ids()]
        ax.scatter(P[:, 0], P[:, 2], s=1, c="#999999", label="map points")
        ref = getattr(m, "reference_points", None)
        if ref is not None and len(ref):
            ids = np.asarray(ref, np.int64)
            R = m.pt_pos[ids[m.valid_mask(ids)]]
            if len(R):
                ax.scatter(R[:, 0], R[:, 2], s=1.5, c="#cc2222")

    def draw_keyframes(self, ax, graph: bool = True):
        """DrawKeyFrames + DrawGraph: frusta as dots/heading ticks; edges:
        covisibility(>=covis_min_weight) green, spanning tree dark green,
        loop edges magenta."""
        m = self.system.map
        centers = {k: m.kf_center(k) for k in m.kf_valid}
        if centers:
            C = np.stack([centers[k] for k in sorted(centers)])
            ax.plot(C[:, 0], C[:, 2], "b.", ms=4, label="keyframes")
            # heading tick = a tiny frustum stand-in (optical axis direction)
            for k, c in centers.items():
                Rwc = m.kf_pose[k][:3, :3].T
                z = Rwc @ np.array([0.0, 0.0, 1.0])
                ax.plot([c[0], c[0] + 0.15 * z[0]], [c[2], c[2] + 0.15 * z[2]],
                        "b-", lw=0.5)
        if not graph:
            return
        for k in m.kf_valid:
            ck = centers[k]
            for nb, w in m.covis.get(k, {}).items():
                if nb > k and nb in centers and w >= self.covis_min_weight:
                    cn = centers[nb]
                    ax.plot([ck[0], cn[0]], [ck[2], cn[2]], "g-", lw=0.3)
            parent = m.parent.get(k)
            if parent is not None and parent in centers:
                cp = centers[parent]
                ax.plot([ck[0], cp[0]], [ck[2], cp[2]], "-", c="#006600", lw=0.5)
            for le in m.loop_edges.get(k, ()):  # loop edges stand out
                if le > k and le in centers:
                    cl = centers[le]
                    ax.plot([ck[0], cl[0]], [ck[2], cl[2]], "m-", lw=0.9)

    def draw_current_camera(self, ax):
        """DrawCurrentCamera: green marker at the latest pose."""
        if self._Tcw is None:
            return
        c = -self._Tcw[:3, :3].T @ self._Tcw[:3, 3]
        ax.plot([c[0]], [c[2]], "g^", ms=8, label="current camera")

    def draw_trajectory(self, ax):
        traj = [e.Tcw for e in self.system.tracker.trajectory if e.Tcw is not None]
        if traj:
            C = np.stack([-T[:3, :3].T @ T[:3, 3] for T in traj])
            ax.plot(C[:, 0], C[:, 2], "r-", lw=0.6, label="trajectory")

    # ---- figure assembly --------------------------------------------

    def _figure(self, show_points=True, show_keyframes=True,
                show_graph=True, follow=False, follow_radius=8.0):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        if show_points:
            self.draw_map_points(ax)
        if show_keyframes:
            self.draw_keyframes(ax, graph=show_graph)
        self.draw_trajectory(ax)
        self.draw_current_camera(ax)
        ax.set_aspect("equal")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.legend(loc="upper right", fontsize=8)
        if follow and self._Tcw is not None:
            # menuFollowCamera analog (reference Viewer.cpp:46,73-81:
            # s_cam.Follow(Twc)): viewport locked onto the current camera
            c = -self._Tcw[:3, :3].T @ self._Tcw[:3, 3]
            ax.set_xlim(c[0] - follow_radius, c[0] + follow_radius)
            ax.set_ylim(c[2] - follow_radius, c[2] + follow_radius)
        return fig

    def render_array(self, **kw) -> np.ndarray:
        """Render the map view to an RGB array (the live viewer's frame
        buffer — the headless analog of the Pangolin framebuffer)."""
        import matplotlib.pyplot as plt

        fig = self._figure(**kw)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return buf

    def save(self, path: str, show_points=True, show_keyframes=True,
             show_graph=True):
        import matplotlib.pyplot as plt

        fig = self._figure(show_points, show_keyframes, show_graph)
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)


class Viewer:
    """Headless viewer loop (reference src/Viewer.cpp): drives both
    drawers once per frame and writes throttled map snapshots. The
    Pangolin menu toggles (Viewer.cpp:46-52) are plain attributes."""

    def __init__(self, system, every_n: int = 30, out_dir: Optional[str] = None):
        self.system = system
        self.every_n = every_n
        self.out_dir = out_dir
        self.frame_drawer = FrameDrawer(system)
        self.map_drawer = MapDrawer(system)
        # menu toggles (menuFollowCamera/menuShowPoints/... analogs,
        # reference Viewer.cpp:46-52). Consumed by every render; the
        # setters below may be called from ANY thread while the live loop
        # runs — the same contract as Pangolin menu clicks.
        self.follow_camera = False
        self.show_points = True
        self.show_keyframes = True
        self.show_graph = True
        self._count = 0
        import threading as _threading

        self._menu_lock = _threading.Lock()
        self._pending_cmds = []

    # ---- runtime menu controls (reference Viewer.cpp:46-52,60-113) ----

    def set_follow_camera(self, on: bool):
        """menuFollowCamera: lock the map viewport onto the camera."""
        self.follow_camera = bool(on)

    def set_show(self, points=None, keyframes=None, graph=None):
        """menuShowPoints / menuShowKeyFrames / menuShowGraph."""
        if points is not None:
            self.show_points = bool(points)
        if keyframes is not None:
            self.show_keyframes = bool(keyframes)
        if graph is not None:
            self.show_graph = bool(graph)

    def set_localization_mode(self, on: bool):
        """menuLocalizationMode (Viewer.cpp:87-97): queued and applied by
        the viewer loop — the reference likewise calls Activate/
        DeactivateLocalizationMode from its render thread."""
        with self._menu_lock:
            self._pending_cmds.append(("localization", bool(on)))

    def request_reset(self):
        """menuReset (Viewer.cpp:99-108): full system reset from the UI."""
        with self._menu_lock:
            self._pending_cmds.append(("reset",))

    def poll_menu(self):
        """Apply queued menu commands (called by the live loop each
        iteration; callable directly in unthreaded use)."""
        with self._menu_lock:
            cmds, self._pending_cmds = self._pending_cmds, []
        for cmd in cmds:
            if cmd[0] == "localization":
                if cmd[1]:
                    self.system.activate_localization_mode()
                else:
                    self.system.deactivate_localization_mode()
            elif cmd[0] == "reset":
                self.system.reset()

    def update(self, image: Optional[np.ndarray] = None):
        self._count += 1
        self.frame_drawer.update(image)
        lf = self.system.tracker.last_frame
        if lf is not None and lf.Tcw is not None:
            self.map_drawer.set_current_camera_pose(lf.Tcw)
        if self.out_dir is not None and self._count % self.every_n == 0:
            self.save(f"{self.out_dir}/map_{self._count:06d}.png")

    def draw_frame(self) -> Optional[np.ndarray]:
        if self.frame_drawer.frame is None:
            self.frame_drawer.update()
        return self.frame_drawer.draw_frame()

    def save(self, path: str):
        self.map_drawer.save(
            path,
            show_points=self.show_points,
            show_keyframes=self.show_keyframes,
            show_graph=self.show_graph,
        )

    # ---- live thread (reference Viewer::Run, Viewer.cpp:32-113) ------

    def run_live(self, fps: float = 5.0):
        """Start the live rendering thread: at ~fps it snapshots the
        tracker state under the map lock and renders both views into
        in-memory frame buffers (`latest_frame` annotated camera image,
        `latest_map` map view) — the headless analog of the reference's
        Pangolin window loop. With `out_dir` set, the latest buffers are
        also written as live_frame.png / live_map.png (atomic rename).
        Idempotent; `stop_live()` joins the thread."""
        import threading
        import time as _time

        if getattr(self, "_live_thread", None) is not None:
            return
        self.latest_frame: Optional[np.ndarray] = None
        self.latest_map: Optional[np.ndarray] = None
        self.n_live_renders = 0
        self.live_error = None
        self._live_stop = threading.Event()

        def _loop():
            period = 1.0 / max(fps, 1e-3)
            while not self._live_stop.is_set():
                t0 = _time.monotonic()
                try:
                    # menu commands first, OUTSIDE the map lock (reference
                    # Viewer::Run polls its menus each iteration and calls
                    # into System, Viewer.cpp:60-113)
                    self.poll_menu()
                    with self.system.map.lock:
                        self.frame_drawer.update()
                        lf = self.system.tracker.last_frame
                        if lf is not None and lf.Tcw is not None:
                            self.map_drawer.set_current_camera_pose(lf.Tcw)
                        frame_img = self.frame_drawer.draw_frame()
                        map_img = self.map_drawer.render_array(
                            show_points=self.show_points,
                            show_keyframes=self.show_keyframes,
                            show_graph=self.show_graph,
                            follow=self.follow_camera,
                        )
                    self.latest_frame = frame_img
                    self.latest_map = map_img
                    self.n_live_renders += 1
                    if self.out_dir is not None:
                        self._write_live(frame_img, map_img)
                except Exception as e:  # keep rendering failures out of SLAM
                    self.live_error = e
                self._live_stop.wait(
                    max(period - (_time.monotonic() - t0), 0.01)
                )

        self._live_thread = threading.Thread(
            target=_loop, name="viewer", daemon=True
        )
        self._live_thread.start()

    def _write_live(self, frame_img, map_img):
        import os

        import matplotlib.image as mpimg

        os.makedirs(self.out_dir, exist_ok=True)
        for name, img in (("live_frame", frame_img), ("live_map", map_img)):
            if img is None:
                continue
            tmp = os.path.join(self.out_dir, f".{name}.tmp.png")
            mpimg.imsave(tmp, img.astype(np.uint8))
            os.replace(tmp, os.path.join(self.out_dir, f"{name}.png"))

    def stop_live(self):
        th = getattr(self, "_live_thread", None)
        if th is None:
            return
        self._live_stop.set()
        th.join(timeout=30.0)
        self._live_thread = None
