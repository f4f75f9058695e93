#!/usr/bin/env python
"""Diagnostic replica of bench.py with toggles, for bisecting the r3
end-to-end regression (VERDICT r3 task 1): per-frame state log, reloc
gate trace, and GT-annotated loop-candidate trace.

    python tools/diag_bench.py --cpu --pipelined 1 --fixed 1 --laps 1.1 \
        --frames 240 --threaded 1 --vocab-depth 4

Prints one line per frame-state transition and a summary; writes
DIAG_RELOC.json / DIAG_LOOP.json with the gate traces.
"""

import argparse
import json
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pipelined", type=int, default=1)
    ap.add_argument("--fixed", type=int, default=1)
    ap.add_argument("--threaded", type=int, default=1)
    ap.add_argument("--laps", type=float, default=1.1)
    ap.add_argument("--frames", type=int, default=240, help="frames per lap")
    ap.add_argument("--vocab-depth", type=int, default=4)
    ap.add_argument("--vocab-k", type=int, default=8)
    ap.add_argument("--cached-vocab", type=int, default=1,
                    help="load assets/vocab_circuit.npz when present")
    ap.add_argument("--blackout", type=int, default=-1,
                    help="feed 3 noise frames at this index (induced "
                         "loss; measures relocalization recovery)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="world photometric noise sigma (bench uses 2.5)")
    ap.add_argument("--exposure", type=float, default=0.0,
                    help="world exposure-drift amplitude (bench uses 0.1)")
    ap.add_argument("--out-prefix", type=str, default="DIAG")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    import numpy as np

    from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
    from orbslam2_tpu.datasets.synthetic import SyntheticWorld
    from orbslam2_tpu.evaluation.ate import ate_rmse
    from orbslam2_tpu.slam.frontend import Frontend
    from orbslam2_tpu.slam.shapes import ShapePolicy
    from orbslam2_tpu.slam.system import System
    from orbslam2_tpu.vocab import train

    world = SyntheticWorld(
        n_points=2000, seed=21, baseline=0.2, vertical_extent=6.0,
        cylinder_radius=11.0, near_fraction=0.15,
        noise_sigma=args.noise, exposure_drift=args.exposure,
    )
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            bf=world.bf, width=world.width, height=world.height, fps=20.0,
        ),
        orb=OrbConfig(n_features=1200),
        shapes=ShapePolicy(fixed=bool(args.fixed)),
        pipelined_tracking=bool(args.pipelined),
    )

    fe = Frontend(cfg)
    vocab_path = os.path.join(REPO, "assets", "vocab_circuit.npz")
    if args.cached_vocab and os.path.exists(vocab_path):
        from orbslam2_tpu.vocab import bow as bow_mod

        voc = bow_mod.load_npz(vocab_path)
    else:
        descs, docs = [], []
        for d, T in enumerate(world.trajectory_circuit(16)):
            imL, _ = world.render_stereo(T)
            f = fe.process(imL, imL)
            v = np.asarray(f.valid)
            dd = np.asarray(f.desc)[v][:600]
            descs.append(np.ascontiguousarray(dd).view(np.uint8))
            docs.append(np.full(len(dd), d))
        voc = train.train_vocabulary(
            np.concatenate(descs), k=args.vocab_k, depth=args.vocab_depth,
            doc_ids=np.concatenate(docs),
        )
    print(f"# vocab: {voc.n_words} words", flush=True)

    lap = world.trajectory_circuit(args.frames)
    extra = int(round(args.frames * (args.laps - 1.0)))
    poses_gt = lap + lap[:extra]
    n_frames = len(poses_gt)
    # render cache: the painter-algorithm rendering of 264 frames costs
    # ~8 min on this 2-core host; the frames are deterministic in
    # (world seed, frame count) so cache them on disk across diag runs
    cache_f = os.path.join(
        REPO, ".render_cache",
        f"circuit_s21_{args.frames}_{args.laps:.2f}_{args.noise:g}_{args.exposure:g}.npz",
    )
    if os.path.exists(cache_f):
        z = np.load(cache_f)
        # materialize each member ONCE: NpzFile.__getitem__ re-reads the
        # whole array per access, so z["L"][i] in a loop would allocate
        # n_frames full copies (~100 GB — OOM-killed two diag runs)
        L, R = z["L"], z["R"]
        frames = list(zip(L, R))
    else:
        frames = [world.render_stereo(T) for T in poses_gt]
        os.makedirs(os.path.dirname(cache_f), exist_ok=True)
        np.savez(
            cache_f,
            L=np.stack([f[0] for f in frames]),
            R=np.stack([f[1] for f in frames]),
        )
    if args.blackout >= 0:
        rng = np.random.default_rng(0)
        noise = rng.uniform(0, 255, frames[0][0].shape).astype(np.float32)
        for j in range(args.blackout, min(args.blackout + 3, n_frames)):
            frames[j] = (noise, noise)
    gt_xyz_all = np.stack([(-T[:3, :3].T @ T[:3, 3]) for T in poses_gt])

    import faulthandler

    faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)
    sys_ = System(voc, cfg, threaded=bool(args.threaded))
    t0 = time.perf_counter()
    print("# precompile...", flush=True)
    sys_.precompile()
    print(f"# precompile done {time.perf_counter()-t0:.1f}s", flush=True)
    for i in range(30):
        imL, imR = frames[i]
        sys_.track_stereo(imL, imR, i / 20.0)
        print(f"# warmup frame {i}", flush=True)
    sys_.wait_idle(timeout=900)
    faulthandler.cancel_dump_traceback_later()
    print(f"# warmup {time.perf_counter()-t0:.1f}s", flush=True)
    sys_.reset()

    last_state = None
    t0 = time.perf_counter()
    for i, (imL, imR) in enumerate(frames):
        sys_.track_stereo(imL, imR, i / 20.0)
        st = sys_.tracker.state.name
        if st != last_state:
            print(
                f"frame {i:4d}: {last_state} -> {st} "
                f"inliers={sys_.tracker.n_inliers} "
                f"kfs={sys_.map.n_keyframes()}",
                flush=True,
            )
            if st == "LOST":
                for row in sys_.tracker.fused_stats[-12:]:
                    print(f"    fused(frame,m1,k1,k2,inl)={row}", flush=True)
            last_state = st
        if i % 40 == 0:
            print(
                f"frame {i:4d}: state={st} inliers={sys_.tracker.n_inliers} "
                f"kfs={sys_.map.n_keyframes()} pts={len(sys_.map.pt_valid)} "
                f"{(time.perf_counter()-t0):.1f}s",
                flush=True,
            )
    dt = time.perf_counter() - t0
    sys_.wait_idle(timeout=900)

    traj = sys_.tracker.trajectory
    solved = [
        (g, e.Tcw) for g, e in zip(poses_gt, traj)
        if e.Tcw is not None and not e.lost
    ]
    gt_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for T, _ in solved])
    est_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for _, T in solved])
    rmse = ate_rmse(est_xyz, gt_xyz)
    from orbslam2_tpu.slam import trajectory as traj_mod

    off = [
        (g, e.Tcr.astype(np.float64)
         @ traj_mod._resolve_reference(sys_.map, e.ref_kf))
        for g, e in zip(poses_gt, traj)
        if e.Tcw is not None and not e.lost
    ]
    rmse_off = ate_rmse(
        np.stack([(-T[:3, :3].T @ T[:3, 3]) for _, T in off]),
        np.stack([(-T[:3, :3].T @ T[:3, 3]) for T, _ in off]),
    )
    n_loops = sys_.loop_closer.n_loops_closed if sys_.loop_closer else 0

    # annotate loop rejections with GT seam distance (kf timestamps -> gt)
    def kf_gt_pos(kf):
        f = sys_.map.kf_frame.get(kf)
        if f is None:
            return None
        idx = int(round(f.timestamp * 20.0))
        if 0 <= idx < n_frames:
            return gt_xyz_all[idx]
        return None

    loop_rej = []
    for r in (sys_.loop_closer.rejections if sys_.loop_closer else []):
        r = dict(r)
        a, b = kf_gt_pos(r.get("kf")), kf_gt_pos(r.get("cand"))
        if a is not None and b is not None:
            r["gt_dist"] = round(float(np.linalg.norm(a - b)), 2)
        loop_rej.append(r)

    with open(os.path.join(REPO, f"{args.out_prefix}_LOOP.json"), "w") as f:
        json.dump({"loops_closed": n_loops, "rejections": loop_rej[-200:]},
                  f, indent=1, default=int)
    rtrace = sys_.relocalizer.trace if sys_.relocalizer else []
    with open(os.path.join(REPO, f"{args.out_prefix}_RELOC.json"), "w") as f:
        json.dump(rtrace[-100:], f, indent=1, default=int)

    print(
        f"\nRESULT tracked={len(solved)}/{n_frames} ate={rmse:.3f}m "
        f"ate_off={rmse_off:.3f}m "
        f"loops={n_loops} kfs={sys_.map.n_keyframes()} "
        f"reloc_attempts={len(rtrace)} fps={n_frames/dt:.2f} wall={dt:.1f}s"
    )
    print(f"kf_triggers: {sys_.tracker.kf_trigger_counts}")
    for e in sys_.tracker.events[-40:]:
        print(f"  event: {e}")
    if args.blackout >= 0:
        # induced-loss recovery artifact (VERDICT r4 task 3): how many
        # frames from the end of the blackout until tracking is OK again
        lost_flags = [bool(e.lost) for e in traj]
        end = args.blackout + 3
        rec = next(
            (i for i in range(end, n_frames) if not lost_flags[i]), None
        )
        summary = {
            "blackout_at": args.blackout,
            "frames_to_recover": (None if rec is None else rec - end),
            "reloc_attempts": len(rtrace),
            "post_recovery_lost": int(sum(lost_flags[rec:]) if rec else -1),
            "trace_tail": rtrace[-10:],
            "events_tail": sys_.tracker.events[-15:],
        }
        with open(os.path.join(REPO, "RELOC_RECOVERY.json"), "w") as f:
            json.dump(summary, f, indent=1, default=int)
        print(f"recovery: {summary['frames_to_recover']} frames after "
              f"blackout, {len(rtrace)} attempts, "
              f"post-recovery lost={summary['post_recovery_lost']}")
    print(sys_.shutdown(), file=sys.stderr)


if __name__ == "__main__":
    main()
