"""Map/trajectory visualization — the reference's Pangolin viewer analog.

The reference runs a live Pangolin GUI thread (src/Viewer.cpp,
MapDrawer.cpp, FrameDrawer.cpp: map points, keyframe frusta, covisibility
graph, annotated current frame). This environment is headless, so the
equivalent is snapshot rendering to files with the same content: call
`update()` per frame (cheap, throttled) and `save(path)` to write the
current map + trajectory figure; `draw_frame()` produces the annotated
current-frame image (tracked keypoints boxed, state text) as an array.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class Viewer:
    def __init__(self, system, every_n: int = 30, out_dir: Optional[str] = None):
        self.system = system
        self.every_n = every_n
        self.out_dir = out_dir
        self._count = 0

    def update(self):
        self._count += 1
        if self.out_dir is not None and self._count % self.every_n == 0:
            self.save(f"{self.out_dir}/map_{self._count:06d}.png")

    # ------------------------------------------------------------------

    def draw_frame(self) -> Optional[np.ndarray]:
        """Annotated current-frame visualization (FrameDrawer::DrawFrame):
        returns an RGB uint8 array with tracked features marked."""
        tr = self.system.tracker
        lf = tr.last_frame
        if lf is None:
            return None
        H = self.system.config.camera.height
        W = self.system.config.camera.width
        img = np.zeros((H, W, 3), np.uint8)
        img[..., :] = 40
        for i in np.nonzero(lf.valid)[0]:
            u, v = int(lf.uv[i, 0]), int(lf.uv[i, 1])
            if not (0 <= u < W and 0 <= v < H):
                continue
            color = (0, 255, 0) if lf.point_ids[i] >= 0 else (90, 90, 90)
            img[max(v - 1, 0) : v + 2, max(u - 1, 0) : u + 2] = color
        return img

    def save(self, path: str):
        """Top-down map + trajectory plot (MapDrawer::DrawMapPoints/KeyFrames)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        m = self.system.map
        fig, ax = plt.subplots(figsize=(8, 8))
        if m.pt_valid:
            P = np.stack([m.pt_pos[p] for p in m.pt_valid])
            ax.scatter(P[:, 0], P[:, 2], s=1, c="#999999", label="map points")
        centers = []
        for k in sorted(m.kf_valid):
            centers.append(m.kf_center(k))
        if centers:
            C = np.stack(centers)
            ax.plot(C[:, 0], C[:, 2], "b.-", ms=4, lw=0.8, label="keyframes")
        # covisibility graph edges
        for k in m.kf_valid:
            ck = m.kf_center(k)
            for nb, w in m.covis.get(k, {}).items():
                if nb > k and nb in m.kf_valid and w >= 100:
                    cn = m.kf_center(nb)
                    ax.plot([ck[0], cn[0]], [ck[2], cn[2]], "g-", lw=0.3)
        traj = [e.Tcw for e in self.system.tracker.trajectory if e.Tcw is not None]
        if traj:
            C = np.stack([-T[:3, :3].T @ T[:3, 3] for T in traj])
            ax.plot(C[:, 0], C[:, 2], "r-", lw=0.6, label="trajectory")
        ax.set_aspect("equal")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.legend(loc="upper right", fontsize=8)
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
