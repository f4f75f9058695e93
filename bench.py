#!/usr/bin/env python
"""Headline benchmark: END-TO-END stereo SLAM frames/s on one chip.

The reference's real-time budget is the 20 fps EuRoC inter-frame gap
(reference Examples/Stereo/stereo_euroc.cc:176-183, EuRoC.yaml:22): its
driver must finish rectification + the FULL TrackStereo (ORB extraction,
stereo matching, pose prediction, local-map tracking, keyframe decision,
with mapping/loop threads running) inside 50 ms/frame. We measure the
same thing: `System.track_stereo` over a 591-frame synthetic figure-8 at
EuRoC scale (752x480 stereo, 1200 ORB features, 8 levels) with local
mapping AND loop closing enabled on the threaded pipeline — the sequence
closes TWO distinct loops (essential graph + global BA in the wall time).

Compile discipline: the shape policy is FIXED (one shape per device
program), the rare-event programs are precompiled, the warmup frames
compile the per-frame programs on the SAME System (then the pipeline is
reset), and jax.monitoring counts any compile landing inside the timed
window — the target is zero.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is end-to-end fps over the reference's 20 fps budget.
Side artifacts: LOOP_TRACE.json (per-candidate Sim3 gate counts),
PARITY_TPU.json (TPU-vs-CPU frontend descriptor agreement). The
per-stage timing breakdown (reference System.cpp:244-258 analog), the
p50/p95 frame latency, and the frontend-only throughput go to stderr.
"""

import json
import os
import sys
import time

# single-threaded BLAS: with three busy python threads on a small host,
# OpenBLAS's spin-wait barriers turn ~10 ms float64 matmuls into SECONDS
# (r3 postmortem: one loop-fusion pass went 220 s -> 1.4 s with this).
# Must be set before numpy loads.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def frontend_throughput(world, frontend, n=240):
    """Secondary metric: device-pipelined frontend-only frames/s (the
    round-1 headline). Dispatches are pipelined; sync is a VALUE fetch of
    the final dispatch (in-order stream => all N complete)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    frames = []
    for T in world.trajectory(4, step=0.3):
        imL, imR = world.render_stereo(T)
        frames.append(jnp.asarray(np.stack([imL, imR]), jnp.float32))

    process = frontend._process

    @jax.jit
    def reduce_last(depth):
        return jnp.sum(depth)

    out = process(frames[0])
    _ = float(reduce_last(out.depth))  # warm + sync
    t0 = time.perf_counter()
    last = None
    for i in range(n):
        last = process(frames[i % len(frames)])
    _ = float(reduce_last(last.depth))
    return n / (time.perf_counter() - t0)


def write_frontend_parity(frontend, imL, imR):
    """TPU-vs-host frontend parity artifact (guards the Mosaic patch-DMA
    kernel in ops/patches.py against silent miscompiles): compare the
    jitted frontend's descriptors against the interpret/jnp fallback on
    the same frame; write PARITY_TPU.json."""
    import jax
    import numpy as np

    out = {"device": jax.devices()[0].platform}
    try:
        f_dev = jax.device_get(frontend.process(imL, imR))
        if jax.default_backend() == "tpu":
            from orbslam2_tpu.ops import patches

            patches.FORCE_FALLBACK = True
            try:
                frontend_ref = type(frontend)(frontend.config)
                f_ref = jax.device_get(frontend_ref.process(imL, imR))
            finally:
                patches.FORCE_FALLBACK = False
            both = f_dev.valid & f_ref.valid
            same_bits = np.unpackbits(
                np.bitwise_xor(
                    f_dev.desc[both], f_ref.desc[both]
                ).view(np.uint8), axis=-1
            ).sum()
            total_bits = int(both.sum()) * 256
            out.update(
                n_kp_dev=int(f_dev.valid.sum()),
                n_kp_ref=int(f_ref.valid.sum()),
                n_common=int(both.sum()),
                bit_error_rate=(
                    float(same_bits) / total_bits if total_bits else 0.0
                ),
                ok=bool(total_bits and same_bits / total_bits < 0.01),
            )
        else:
            out.update(
                n_kp_dev=int(f_dev.valid.sum()), ok=True,
                note="non-TPU backend; pallas fallback is the reference path",
            )
    except Exception as e:  # pragma: no cover
        out.update(ok=False, error=str(e))
    with open(os.path.join(REPO, "PARITY_TPU.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    # persist EVERY compile (default skips sub-1s entries): the loop-event
    # programs must be warm on the next run even when individually cheap
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import numpy as np

    from orbslam2_tpu.config import CameraConfig, OrbConfig, SlamConfig
    from orbslam2_tpu.datasets.synthetic import SyntheticWorld
    from orbslam2_tpu.evaluation.ate import ate_rmse
    from orbslam2_tpu.slam.shapes import ShapePolicy
    from orbslam2_tpu.slam.system import System
    from orbslam2_tpu.vocab import train

    # count compiles; the timed window must observe ZERO. The monitoring
    # listener gives durations; the pxla debug logger gives the PROGRAM
    # NAMES ("Compiling jit(<name>) ..."), so a mid-run compile is
    # attributable to the exact device program that was cold.
    import logging
    import re as re_mod

    compile_events = []
    compile_names = []
    jax.monitoring.register_event_duration_secs_listener(
        lambda name, secs, **kw: compile_events.append(
            (name, secs, time.perf_counter())
        )
        if "backend_compile" in name
        else None
    )

    class _CompileNameHandler(logging.Handler):
        def emit(self, rec):
            m = re_mod.search(r"Compiling (\S+) ", rec.getMessage())
            if m:
                compile_names.append((time.perf_counter(), m.group(1)))

    _pxla_log = logging.getLogger("jax._src.interpreters.pxla")
    _pxla_log.addHandler(_CompileNameHandler())
    _pxla_log.setLevel(logging.DEBUG)
    _pxla_log.propagate = False  # keep the DEBUG records off stderr

    # EuRoC-scale circuit world: 752x480 stereo, loop closure at the end.
    # Photometric realism (sensor noise + exposure drift) exercises the
    # FAST 20->7 fallback and descriptor-stability paths real imagery
    # does (VERDICT r4 task 7).
    world = SyntheticWorld(
        n_points=2000, seed=21, baseline=0.2, vertical_extent=6.0,
        cylinder_radius=11.0, near_fraction=0.15,
        noise_sigma=1.5, exposure_drift=0.05,
    )
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
            bf=world.bf, width=world.width, height=world.height, fps=20.0,
        ),
        orb=OrbConfig(n_features=1200),
        # ONE shape per device program: zero recompiles after warmup
        shapes=ShapePolicy(fixed=True),
        # r4 bisect (tools/diag_bench.py): pipelined_tracking was THE r3
        # regression — with it ON the run lost lock at ~frame 40 and
        # oscillated OK/LOST for the rest (tracked 133/264, ATE 0.53 m);
        # with it OFF the same scenario tracks 264/264 at ATE 0.136 m AND
        # runs slightly faster (4.40 vs 4.24 fps: the chip is mapping-
        # bound, so hiding the tracker's round trip bought nothing).
        # Robustness first (VERDICT r3 task 1): synchronous fused step.
        # BENCH_PIPELINED=1 enables the latency-hiding mode for A/B
        # experiments (tools/diag_bench.py drives both).
        pipelined_tracking=bool(int(os.environ.get("BENCH_PIPELINED", "0"))),
    )

    # production-style vocabulary: load the pre-built cached tree (the
    # reference likewise loads a pre-trained ORBvoc.txt at startup,
    # System.cpp:38-39; tools/build_vocab.py is the offline training
    # step — k=10 depth=4, ~10k words). Fallback: train a small one.
    from orbslam2_tpu.slam.frontend import Frontend
    from orbslam2_tpu.vocab import bow as bow_mod

    fe = Frontend(cfg)
    # generic production vocabulary: k=10 L=5 (~78k words) trained on six
    # OTHER synthetic worlds (tools/build_vocab.py --generic) — the analog
    # of the reference's pre-trained ORBvoc.txt (System.cpp:38-39). The
    # 48-view circuit vocabulary scored far places ~as high as adjacent
    # ones (r5 measured ratio 1.26 vs 1.54), leaking ~90 junk Sim3
    # attempts per run (~20 s of chip time)
    vocab_path = os.path.join(REPO, "assets", "vocab_generic.npz")
    if not os.path.exists(vocab_path):  # pragma: no cover
        vocab_path = os.path.join(REPO, "assets", "vocab_circuit.npz")
    if os.path.exists(vocab_path):
        voc = bow_mod.load_npz(vocab_path)
        print(f"# vocab: {voc.n_words} words (cached)", file=sys.stderr)
    else:  # pragma: no cover - assets/ is committed
        descs, docs = [], []
        for d, T in enumerate(world.trajectory_circuit(16)):
            imL, _ = world.render_stereo(T)
            f = fe.process(imL, imL)
            v = np.asarray(f.valid)
            dd = np.asarray(f.desc)[v][:600]
            descs.append(np.ascontiguousarray(dd).view(np.uint8))
            docs.append(np.full(len(dd), d))
        voc = train.train_vocabulary(
            np.concatenate(descs), k=8, depth=4, doc_ids=np.concatenate(docs)
        )

    # Figure-8, TWO genuinely distinct loop closures (VERDICT r4 task 5):
    # lap the A-circle twice (drift accumulates, the seam revisit closes
    # loop #1 around frame ~265), hand over at the tangency point to the
    # B-circle (position+heading continuous), lap it fully plus a margin
    # (B's seam revisit closes loop #2 around frame ~545). After closure
    # #1 merges the A laps, A revisits are covisible — correctly no
    # further A event — while B's seam is an independent opportunity.
    poses_gt, seq_meta = world.trajectory_figure8()
    n_frames = len(poses_gt)
    # dataset "IO": the host-side sprite renderer takes ~5 s/frame on this
    # small host (~20 min/run, all outside the timed window) — cache the
    # rendered sequence on disk keyed by the world/sequence parameters.
    # uint8 (the tracker quantizes uploads to uint8 anyway).
    cache_dir = os.path.join(REPO, ".render_cache")
    os.makedirs(cache_dir, exist_ok=True)
    seq_key = f"bench_s{world.seed}_n{world.n_points}_f{n_frames}_v3"
    seq_path = os.path.join(cache_dir, seq_key + ".npz")
    if os.path.exists(seq_path):
        z = np.load(seq_path)
        stack = z["frames"]  # [F, 2, H, W] uint8
        frames = [(stack[i, 0], stack[i, 1]) for i in range(n_frames)]
    else:
        frames = [world.render_stereo(T) for T in poses_gt]
        stack = np.stack([
            np.stack([
                np.clip(np.rint(a), 0, 255).astype(np.uint8),
                np.clip(np.rint(b), 0, 255).astype(np.uint8),
            ]) for a, b in frames
        ])
        np.savez_compressed(seq_path, frames=stack)
        frames = [(stack[i, 0], stack[i, 1]) for i in range(n_frames)]

    parity = write_frontend_parity(fe, *frames[0])

    # extractor statistics on a representative frame (features per level,
    # FAST 20->7 fallback share — reference ORBextractor.cpp:702-766)
    f0 = jax.device_get(fe.process(*frames[0]))
    v0 = f0.valid
    lvl_counts = np.bincount(f0.octave[v0], minlength=cfg.orb.n_levels)
    fallback_rate = float((f0.response[v0] <= cfg.orb.ini_th_fast).sum()) / max(
        int(v0.sum()), 1
    )
    print(
        f"# extractor: kps={int(v0.sum())} per_level={lvl_counts.tolist()} "
        f"fast_fallback_rate={fallback_rate:.2f}",
        file=sys.stderr,
    )

    # ONE System for warmup + timed run: warmup frames compile the
    # per-frame programs (the fixed shape policy pins their buckets), the
    # precompile covers the rare-event programs, then the pipeline is
    # reset so the timed 240-frame circuit starts from scratch with every
    # program warm (the reference has no JIT; steady state is the metric)
    sys_ = System(voc, cfg, threaded=True)
    t0 = time.perf_counter()
    sys_.precompile()
    t_pre = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(30):
        imL, imR = frames[i]
        sys_.track_stereo(imL, imR, i / 20.0)
    # the warmup drain absorbs the mapping/loop programs' first compiles
    sys_.wait_idle(timeout=900)
    t_warm = time.perf_counter() - t0
    sys_.reset()
    from orbslam2_tpu.slam.timing import StageTimers

    sys_.timers = StageTimers()
    sys_.tracker.timers = sys_.timers
    sys_.local_mapper.timers = sys_.timers
    if sys_.loop_closer is not None:
        sys_.loop_closer.timers = sys_.timers

    n_compiles_warmup = len(compile_events)
    est = []
    # NOTE: in pipelined mode lat[i] measures frame i's dispatch plus
    # frame i-1's apply (a one-frame lag); the timed window below ends
    # only after flush_pipeline drains the final frame's device round
    # trip, so fps charges every frame's work (ADVICE r3).
    lat = np.zeros(n_frames)
    t0 = time.perf_counter()
    for i, (imL, imR) in enumerate(frames):
        f0 = time.perf_counter()
        est.append(sys_.track_stereo(imL, imR, i / 20.0))
        lat[i] = time.perf_counter() - f0
    sys_.tracker.flush_pipeline()
    dt = time.perf_counter() - t0
    sys_.wait_idle(timeout=900)
    fps = n_frames / dt
    n_compiles_timed = len(compile_events) - n_compiles_warmup
    # snapshot NOW: shutdown diagnostics below (measure_stage_split,
    # frontend_throughput) compile their own programs after the window
    timed_compile_events = list(compile_events[n_compiles_warmup:])
    timed_compile_names = list(compile_names)

    n_loops = sys_.loop_closer.n_loops_closed if sys_.loop_closer else 0
    # ATE over the SOLVED per-frame poses (the trajectory; in pipelined
    # mode track_stereo returns the motion-model prediction while the
    # trajectory records each frame's optimized pose at apply time —
    # reference System.cpp:134-135 online-pose semantics)
    traj = sys_.tracker.trajectory
    solved = [
        (g, e.Tcw) for g, e in zip(poses_gt, traj)
        if e.Tcw is not None and not e.lost
    ]
    pairs = solved
    gt_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for T, _ in pairs])
    est_xyz = np.stack([(-T[:3, :3].T @ T[:3, 3]) for _, T in pairs])
    rmse = ate_rmse(est_xyz, gt_xyz)
    # OFFLINE trajectory ATE: per-frame pose reconstructed relative to the
    # CURRENT (loop-corrected, GBA-adjusted) keyframe poses — the
    # reference's second evaluation axis (SaveOfflineTrajectoryTUM,
    # System.cpp:296-362; result/OfflineCameraTrajectory_*). The online
    # trajectory cannot benefit retroactively from a loop closure; this
    # one shows the corrected map's accuracy.
    from orbslam2_tpu.slam import trajectory as traj_mod

    off = [
        (g, e.Tcr.astype(np.float64)
         @ traj_mod._resolve_reference(sys_.map, e.ref_kf))
        for g, e in zip(poses_gt, traj)
        if e.Tcw is not None and not e.lost
    ]
    off_est = np.stack([(-T[:3, :3].T @ T[:3, 3]) for _, T in off])
    off_gt = np.stack([(-T[:3, :3].T @ T[:3, 3]) for T, _ in off])
    rmse_off = ate_rmse(off_est, off_gt)
    # keyframe-pose ATE after all corrections (EG + GBA): the direct
    # measure of whether global BA converged — the offline trajectory can
    # only be as good as the keyframe poses it is reconstructed from
    kf_pairs = []
    for k in sys_.map.kf_valid:
        f = sys_.map.kf_frame.get(k)
        if f is None:
            continue
        idx = int(round(f.timestamp * 20.0))
        if 0 <= idx < n_frames:
            kf_pairs.append((poses_gt[idx], sys_.map.kf_pose[k]))
    rmse_kf = float("nan")
    if len(kf_pairs) >= 3:
        kf_gt = np.stack([(-T[:3, :3].T @ T[:3, 3]) for T, _ in kf_pairs])
        kf_est = np.stack([
            (-T[:3, :3].astype(np.float64).T @ T[:3, 3]) for _, T in kf_pairs
        ])
        rmse_kf = ate_rmse(kf_est, kf_gt)
    print(f"# keyframe ATE (post EG+GBA): {rmse_kf:.3f} m over "
          f"{len(kf_pairs)} KFs", file=sys.stderr)
    # per-segment online ATE: the online trajectory cannot benefit from a
    # closure retroactively, so the A-circle (pre/post loop #1) and the
    # B-circle (drifts until loop #2 near its end) read separately
    seg_pairs = [
        (i, g, e.Tcw) for i, (g, e) in enumerate(zip(poses_gt, traj))
        if e.Tcw is not None and not e.lost
    ]
    ho = seq_meta["handover"]
    for name, sel in (
        ("A-laps", [p for p in seg_pairs if p[0] < ho]),
        ("B-lap", [p for p in seg_pairs if p[0] >= ho]),
    ):
        if len(sel) >= 3:
            g_ = np.stack([(-T[:3, :3].T @ T[:3, 3]) for _, T, _ in sel])
            e_ = np.stack([(-T[:3, :3].T @ T[:3, 3]) for _, _, T in sel])
            print(
                f"# online ATE[{name}]: {ate_rmse(e_, g_):.3f} m "
                f"({len(sel)} frames)",
                file=sys.stderr,
            )

    # loop-closure gate trace artifact (why candidates were rejected),
    # annotated with the GT distance between the two keyframes' true
    # camera centers (VERDICT r3: decides "wrong candidate" vs "right
    # candidate, weak matches" from data)
    gt_xyz_all = np.stack([(-T[:3, :3].T @ T[:3, 3]) for T in poses_gt])

    def kf_gt_pos(kf):
        f = sys_.map.kf_frame.get(kf)
        if f is None:
            return None
        idx = int(round(f.timestamp * 20.0))
        return gt_xyz_all[idx] if 0 <= idx < n_frames else None

    if sys_.loop_closer is not None:
        rej = []
        for r in sys_.loop_closer.rejections[-200:]:
            r = dict(r)
            a, b = kf_gt_pos(r.get("kf")), kf_gt_pos(r.get("cand"))
            if a is not None and b is not None:
                r["gt_dist"] = round(float(np.linalg.norm(a - b)), 2)
            rej.append(r)
        n_gate_pass = sum(
            1 for r in sys_.loop_closer.rejections
            if r.get("n_bow", 0) >= 20 or r.get("stage") not in (
                "bow_matches", "kf_culled")
        )
        with open(os.path.join(REPO, "LOOP_TRACE.json"), "w") as f:
            json.dump(
                {"loops_closed": n_loops, "bow_gate_passes": n_gate_pass,
                 "rejections": rej},
                f, indent=1, default=int,
            )
        print(
            f"# loop gates: closed={n_loops} bow_gate_passes={n_gate_pass} "
            f"sim3_attempts={len(sys_.loop_closer.rejections) + n_loops}",
            file=sys.stderr,
        )
    if sys_.relocalizer is not None:
        with open(os.path.join(REPO, "RELOC_TRACE.json"), "w") as f:
            json.dump(
                sys_.relocalizer.trace[-100:], f, indent=1, default=int
            )
    report = sys_.shutdown(measure_frontend_split=True)

    baseline_fps = 20.0  # reference real-time budget (EuRoC camera rate)
    # context for humans reading logs (stderr keeps stdout to one line)
    print(
        f"# device={jax.devices()[0].platform} tracked={len(pairs)}/{n_frames} "
        f"loops_closed={n_loops} ate_rmse={rmse:.3f}m "
        f"ate_offline={rmse_off:.3f}m "
        f"kfs={sys_.map.n_keyframes()} pts={len(sys_.map.pt_valid)} "
        f"wall={dt:.2f}s",
        file=sys.stderr,
    )
    # which NeedNewKeyFrame condition drove each insertion (the KF rate
    # controls the whole mapping-side device load — diagnose over-insertion)
    print(
        f"# kf_triggers={dict(sys_.tracker.kf_trigger_counts)}",
        file=sys.stderr,
    )
    # close-point tracking health: need_close = tracked_close<100 &
    # non_tracked_close>70 (reference Tracking.cpp:852-857); the per-frame
    # distribution says whether close support is chronically thin
    fs = np.asarray([r for r in sys_.tracker.fused_stats if len(r) >= 7])
    if fs.size:
        tc, nc = fs[:, 5], fs[:, 6]
        print(
            f"# close pts/frame: tracked p10/p50/p90="
            f"{np.percentile(tc, 10):.0f}/{np.percentile(tc, 50):.0f}/"
            f"{np.percentile(tc, 90):.0f} free p50={np.percentile(nc, 50):.0f} "
            f"need_close_frames={int(((tc < 100) & (nc > 70)).sum())}/{len(fs)}",
            file=sys.stderr,
        )
    cw = sys_.loop_closer.correction_windows if sys_.loop_closer else []
    i_max = int(np.argmax(lat))
    print(
        f"# frame latency ms: p50={np.percentile(lat, 50)*1e3:.1f} "
        f"p90={np.percentile(lat, 90)*1e3:.1f} "
        f"p95={np.percentile(lat, 95)*1e3:.1f} "
        f"max={lat.max()*1e3:.1f} (frame {i_max}; loop corrections at "
        f"frames ~{[int(round((a - t0) * fps)) for a, b in cw]})",
        file=sys.stderr,
    )
    # worst-frame attribution: lock wait (assemble/apply) vs device step
    fb = sys_.tracker.frame_breakdown
    if fb:
        arr = np.asarray(fb[-n_frames:])
        tot = arr.sum(axis=1)
        j = int(np.argmax(tot))
        a_, s_, p_ = arr[j] * 1e3
        print(
            f"# worst fused frame: assemble={a_:.0f}ms step={s_:.0f}ms "
            f"apply={p_:.0f}ms; medians "
            f"assemble={np.median(arr[:,0])*1e3:.1f} "
            f"step={np.median(arr[:,1])*1e3:.1f} "
            f"apply={np.median(arr[:,2])*1e3:.1f}",
            file=sys.stderr,
        )
    print(
        f"# compiles: warmup={n_compiles_warmup} timed_window={n_compiles_timed} "
        f"(target 0) precompile={t_pre:.1f}s warmup={t_warm:.1f}s "
        f"parity_ok={parity.get('ok')}",
        file=sys.stderr,
    )
    if n_compiles_timed:
        # separate loop-correction-window events (first-use loads of the
        # rare-event correction/GBA programs land when the loop fires —
        # the reference likewise pays its CorrectLoop cost there) from
        # STEADY-STATE events, which are the actual discipline violation
        timed = timed_compile_events
        cw = sys_.loop_closer.correction_windows if sys_.loop_closer else []
        in_loop = [
            e for e in timed
            if any(a <= e[2] <= b + 60.0 for a, b in cw)
        ]
        steady = [e for e in timed if e not in in_loop]
        total_s = sum(e[1] for e in timed)
        slow = sorted(timed, key=lambda e: -e[1])[:5]
        print(
            f"# timed-window compiles: {total_s:.1f}s total "
            f"({len(in_loop)} during loop correction, {len(steady)} "
            f"steady-state); slowest: "
            + ", ".join(f"{e[1]:.1f}s@t+{e[2]-t0:.0f}s" for e in slow),
            file=sys.stderr,
        )
        # attribute each timed-window compile to its program name (the
        # name log and the duration log tick the same clock; nearest-
        # timestamp join). Capped: names only, deduplicated.
        named = []
        for e in timed:
            near = [x for x in timed_compile_names if x[0] <= e[2] + 0.5]
            named.append(near[-1][1] if near else "?")
        from collections import Counter

        print(
            f"# timed-window compile names: "
            + ", ".join(
                f"{n}x{c}" for n, c in Counter(named).most_common(12)
            ),
            file=sys.stderr,
        )
    fps_frontend = frontend_throughput(world, fe)
    print(
        f"# secondary stereo_frontend_fps_per_chip={fps_frontend:.1f} "
        f"(vs_baseline {fps_frontend / baseline_fps:.2f})",
        file=sys.stderr,
    )
    # timing report capped to the top stages by total time (the r4 driver
    # artifact truncated the tail window past ~40 stderr lines and lost
    # the headline; the report is context, not the deliverable)
    hdr, *stage_lines = report.splitlines()
    total_us = {}
    for ln in stage_lines:
        name = ln.strip().rsplit(":", 1)[0]
        mean, _ = sys_.timers.mean_stddev(name)
        total_us[ln] = mean * len(sys_.timers.samples.get(name, ()))
    top = sorted(stage_lines, key=lambda ln: -total_us.get(ln, 0.0))[:24]
    print("\n".join([hdr] + [ln for ln in stage_lines if ln in set(top)]),
          file=sys.stderr)
    sys.stderr.flush()
    # tracked / ATE / loops ride in the HEADLINE JSON so a throughput win
    # can never again silently regress accuracy (VERDICT r3 weak #1).
    # Printed as the VERY LAST line of the run (VERDICT r4 task 1: the
    # driver's tail window must always contain it).
    print(
        json.dumps(
            {
                "metric": "stereo_slam_e2e_fps_per_chip",
                "value": round(fps, 2),
                "unit": (
                    "frames/s end-to-end (752x480 stereo, 1200 ORB, "
                    f"mapping+loop closing, {n_frames}-frame circuit)"
                ),
                "vs_baseline": round(fps / baseline_fps, 3),
                "tracked": f"{len(pairs)}/{n_frames}",
                "ate_rmse_m": round(float(rmse), 3),
                "ate_offline_m": round(float(rmse_off), 3),
                "loops_closed": int(n_loops),
                "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
                "max_ms": round(float(lat.max()) * 1e3, 1),
                "compiles_timed": int(n_compiles_timed),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
