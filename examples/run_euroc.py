#!/usr/bin/env python
"""EuRoC / TUM-VI sequence driver — the reference's example executables.

Replaces /root/reference/Examples/Monocular/mono_euroc.cc:33-228 (and the
stereo / *-inertial variants): loads one or MORE sequences, plays them
through a single SlamSystem session — across-sequence transitions exercise
the timestamp-jump map spawn exactly like the reference's multi-sequence
`ChangeDataset` runs (mono_euroc.cc:173-183) — saves the TUM-format
trajectory, and reports ATE against ground truth when the sequence ships
it.

Usage:
  python examples/run_euroc.py --sensor mono-inertial \
      --settings EuRoC.yaml SEQ1/mav0 [SEQ2/mav0 ...] \
      [--out traj.txt] [--pace] [--max-frames N]

With --pace, frames are delivered no faster than the camera rate (the
reference sleeps to the next image timestamp, mono_euroc.cc:188-204);
without it the sequence plays as fast as the pipeline tracks.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam3_study_kr_tpu.evaluation import ate_rmse
from orb_slam3_study_kr_tpu.io.datasets import load_euroc
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig


def build_system(args):
    if args.settings:
        from dataclasses import replace

        from orb_slam3_study_kr_tpu.io.settings import Settings
        st = Settings(args.settings)
        tracker = st.tracker_config()
        sys_kw = dict(tracker=tracker, sensor=args.sensor)
        rectifier = None
        if args.sensor.startswith("stereo"):
            # Plumb the calibrated rig (Stereo.T_c1_c2 / Camera2.*) through;
            # without this a TUM-VI YAML would silently run with identity
            # extrinsics and the left lens for the right camera.
            rig = st.stereo()
            if rig is None:
                raise SystemExit(
                    f"{args.settings}: no stereo calibration "
                    "(Camera.bf / Stereo.T_c1_c2) for a stereo sensor")
            raw_rig = (tracker.camera_model == "pinhole"
                       and rig.get("R_rl") is not None
                       and rig.get("cam2") is not None
                       and any(abs(d) > 1e-12 for d in tracker.dist))
            if raw_rig:
                # Non-rectified distorted pinhole rig (raw EuRoC pairs):
                # precompute rectification maps (Settings.cc
                # precomputeRectificationMaps role) and feed the session
                # the rectified geometry.
                from orb_slam3_study_kr_tpu.io.rectify import stereo_rectify
                params_l = (tracker.fx, tracker.fy, tracker.cx, tracker.cy,
                            *(tuple(tracker.dist) + (0.0,) * 5)[:5])
                fx2, fy2, cx2, cy2, *dist2 = rig["cam2"]
                params_r = (fx2, fy2, cx2, cy2,
                            *(tuple(dist2) + (0.0,) * 5)[:5])
                rectifier = stereo_rectify(
                    params_l, params_r, rig["R_rl"], rig["t_rl"],
                    tracker.width, tracker.height)
                f = float(rectifier.K_new[0, 0])
                tracker = replace(
                    tracker, fx=f, fy=f, cx=tracker.width / 2.0,
                    cy=tracker.height / 2.0, dist=(0.0,) * 5,
                    bf=float(rectifier.bf))
                sys_kw["tracker"] = tracker
                sys_kw["baseline"] = float(rectifier.baseline)
            else:
                sys_kw.update(
                    stereo_R_rl=tuple(map(tuple, np.asarray(rig["R_rl"]))),
                    stereo_t_rl=tuple(np.asarray(rig["t_rl"])),
                    baseline=float(rig["baseline"]),
                )
                if rig.get("cam2") is not None:
                    fx2, fy2, cx2, cy2, *dist2 = rig["cam2"]
                    sys_kw["tracker_right"] = replace(
                        tracker, fx=fx2, fy=fy2, cx=cx2, cy=cy2,
                        dist=tuple(dist2))
        if args.sensor.endswith("-inertial"):
            calib = st.imu_calib()
            R_bc = np.asarray(calib.R_bc, np.float64)
            if rectifier is not None:
                # The tracker now lives in the RECTIFIED left camera, so the
                # body<-camera rotation must absorb the rectifying rotation
                # (Settings.cc:521-526, Tbc_ = Tbc_ * T_r1_u1.inverse()):
                # p_b = R_bc R_rect_l^T p_rect; translation is unchanged
                # because rectification rotates about the camera center.
                R_bc = R_bc @ rectifier.R_rect_l.T
            sys_kw.update(
                imu_noise_gyro=float(calib.noise_gyro),
                imu_noise_acc=float(calib.noise_acc),
                imu_walk_gyro=float(calib.walk_gyro),
                imu_walk_acc=float(calib.walk_acc),
                imu_freq=float(calib.freq),
                imu_R_bc=tuple(map(tuple, R_bc)),
                imu_t_bc=tuple(np.asarray(calib.t_bc)),
            )
        cfg = SystemConfig(**sys_kw)
    else:
        rectifier = None
        # EuRoC cam0 defaults (EuRoC.yaml).
        cfg = SystemConfig(
            sensor=args.sensor,
            tracker=TrackerConfig(
                width=752, height=480, fx=458.654, fy=457.296,
                cx=367.215, cy=248.375,
                dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05,
                      0.0),
                fps=20.0),
        )
    if args.vocabulary:
        cfg.vocabulary_path = args.vocabulary
    slam = SlamSystem(cfg)
    slam.rectifier = rectifier
    return slam


def run_sequence(slam, seq, args, inertial):
    """Play one sequence; returns the number of frames delivered."""
    n = len(seq) if args.max_frames <= 0 else min(len(seq), args.max_frames)
    t_prev = None
    imu_dt = 1.0 / float(slam.cfg.imu_freq or 200.0)
    # One-image lookahead (mono paths): decode frame i+1 and prefetch its
    # device upload before tracking frame i, so the H2D transfer overlaps
    # the tracker's device round trip (SlamSystem.upload_image).  Stereo
    # keeps per-frame host reads: the rectifier remaps on host after the
    # read, so a raw prefetch would be discarded.
    stereo = args.sensor.startswith("stereo")
    pending = None
    for i in range(n):
        ts = float(seq.cam0_ts[i])
        if pending is not None:
            img = pending
        else:
            img = seq.image(i)
            if not stereo:
                img = slam.upload_image(img)
        pending = None
        if not stereo and i + 1 < n:
            pending = slam.upload_image(seq.image(i + 1))
        imu = None
        if inertial and seq.imu_ts is not None:
            t0 = t_prev if t_prev is not None else ts - imu_dt
            its, gyro, acc = seq.imu_between(t0, ts)
            dts = np.diff(np.concatenate([[t0], its]))
            imu = np.concatenate(
                [dts[:, None], acc, gyro], axis=1).astype(np.float32)
        wall0 = time.perf_counter()
        if args.sensor.startswith("stereo") and seq.cam1_files:
            img_r = seq.image(i, cam=1)
            rect = getattr(slam, "rectifier", None)
            if rect is not None:
                img = rect.remap_left(img)
                img_r = rect.remap_right(img_r)
            slam.track_stereo(img, img_r, ts, imu=imu)
        else:
            slam.track_monocular(img, ts, imu=imu)
        if args.pace and i + 1 < n:
            dt_data = float(seq.cam0_ts[i + 1]) - ts
            sleep = dt_data - (time.perf_counter() - wall0)
            if sleep > 0:
                time.sleep(sleep)
        t_prev = ts
    return n


EUROC_MH = ["MH_01_easy", "MH_02_easy", "MH_03_medium",
            "MH_04_difficult", "MH_05_difficult"]
# Reference-published RMS ATE bounds [m] to beat (ORB-SLAM3 paper table,
# arXiv 2007.11898 — monocular / stereo EuRoC MH; BASELINE.md acceptance).
PARITY_BOUNDS = {
    "mono": {"MH_01_easy": 0.016, "MH_02_easy": 0.027,
             "MH_03_medium": 0.028, "MH_04_difficult": 0.138,
             "MH_05_difficult": 0.072},
    "stereo": {"MH_01_easy": 0.029, "MH_02_easy": 0.019,
               "MH_03_medium": 0.024, "MH_04_difficult": 0.085,
               "MH_05_difficult": 0.052},
}


def run_parity(args):
    """BASELINE.md acceptance harness: run every EuRoC MH sequence found
    under --parity root (each as its own session, like the reference's
    per-sequence example runs), align with evaluate_ate_scale semantics,
    and print the parity table against the published reference bounds.
    Runs the moment real data is mounted; no dataset ships in this image."""
    root = args.parity
    bounds = PARITY_BOUNDS.get(args.sensor, {})
    rows = []
    for seq_name in EUROC_MH:
        seq_root = os.path.join(root, seq_name, "mav0")
        if not os.path.isdir(seq_root):
            rows.append((seq_name, None, bounds.get(seq_name), "missing"))
            continue
        slam = build_system(args)
        seq = load_euroc(seq_root)
        t0 = time.perf_counter()
        n = run_sequence(slam, seq, args, args.sensor.endswith("-inertial"))
        wall = time.perf_counter() - t0
        if hasattr(slam, "flush"):
            slam.flush()
        rmse = None
        if seq.gt_ts is not None:
            traj = slam.trajectory()
            rmse, nm, _ = ate_rmse(traj[:, 0], traj[:, 1:4],
                                   seq.gt_ts, seq.gt_pos,
                                   with_scale=args.sensor == "mono")
        rows.append((seq_name, rmse, bounds.get(seq_name),
                     f"{n / max(wall, 1e-9):.1f} f/s"))
    print(f"\nEuRoC {args.sensor} parity (RMS ATE, m — "
          f"evaluate_ate_scale semantics):")
    print(f"{'sequence':18s} {'ours':>8s} {'reference':>10s}  status")
    n_pass = n_run = 0
    for name, rmse, bound, note in rows:
        ours = "-" if rmse is None else f"{rmse:.3f}"
        ref = "-" if bound is None else f"{bound:.3f}"
        status = note
        if rmse is not None and bound is not None:
            n_run += 1
            ok = rmse <= bound * 1.2      # parity = within 20% of published
            n_pass += ok
            status = "PASS" if ok else "FAIL"
        print(f"{name:18s} {ours:>8s} {ref:>10s}  {status}")
    if n_run:
        print(f"{n_pass}/{n_run} sequences at parity")
    return 0 if n_run == 0 or n_pass == n_run else 1


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sequences", nargs="*",
                    help="one or more <sequence>/mav0 directories; several "
                         "sequences run through ONE session (ChangeDataset)")
    ap.add_argument("--sensor", default="mono",
                    choices=["mono", "mono-inertial", "stereo",
                             "stereo-inertial"])
    ap.add_argument("--settings", default=None, help="calibration YAML")
    ap.add_argument("--vocabulary", default=None,
                    help="ORBvoc text file or cached .npz")
    ap.add_argument("--out", default="trajectory_tum.txt")
    ap.add_argument("--pace", action="store_true",
                    help="deliver frames at dataset rate")
    ap.add_argument("--max-frames", type=int, default=-1)
    ap.add_argument("--parity", default=None, metavar="EUROC_ROOT",
                    help="BASELINE acceptance mode: run every MH sequence "
                         "under this root (each its own session) and print "
                         "the ATE table vs the reference's published bounds")
    args = ap.parse_args(argv)

    if args.parity:
        return run_parity(args)
    if not args.sequences:
        ap.error("sequences required (or --parity EUROC_ROOT)")

    slam = build_system(args)
    inertial = args.sensor.endswith("-inertial")

    total, wall = 0, 0.0
    gt_all = []
    for si, root in enumerate(args.sequences):
        seq = load_euroc(root)
        print(f"[{si + 1}/{len(args.sequences)}] {root}: "
              f"{len(seq)} frames", flush=True)
        t0 = time.perf_counter()
        total += run_sequence(slam, seq, args, inertial)
        wall += time.perf_counter() - t0
        if seq.gt_ts is not None:
            gt_all.append((seq.gt_ts, seq.gt_pos))
        # The next sequence's first timestamp triggers the timestamp-jump
        # guard inside the session (Tracking.cc:1837-1865) — the reference's
        # ChangeDataset path.

    slam.save_trajectory_tum(args.out)
    print(f"tracked {total} frames in {wall:.1f}s "
          f"({total / max(wall, 1e-9):.1f} f/s), "
          f"maps={len(slam.atlas.maps)}, state={slam.state.name}")
    print(f"trajectory -> {args.out}")

    if gt_all:
        # Each map has its own gauge (and, for mono, its own scale) after a
        # timestamp-jump spawn — align + report ATE per contiguous map
        # segment, then pool the residuals for a combined RMSE.
        rows, map_ids = slam.trajectory(with_map_ids=True)
        gt_ts = np.concatenate([g[0] for g in gt_all])
        gt_pos = np.concatenate([g[1] for g in gt_all])
        with_scale = args.sensor == "mono"
        sq_sum, n_sum = 0.0, 0
        for mid in np.unique(map_ids):
            sel = map_ids == mid
            if sel.sum() < 3:
                continue
            rmse, nm, _ = ate_rmse(rows[sel, 0], rows[sel, 1:4],
                                   gt_ts, gt_pos, with_scale=with_scale)
            if nm == 0:
                continue
            print(f"  map {mid}: ATE RMSE {rmse:.4f} m over {nm} frames"
                  f"{' (scale-aligned)' if with_scale else ''}")
            sq_sum += rmse * rmse * nm
            n_sum += nm
        if n_sum:
            print(f"ATE RMSE {np.sqrt(sq_sum / n_sum):.4f} m over {n_sum} "
                  f"matched frames (per-map alignment)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
