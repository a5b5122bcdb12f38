"""Online SLAM / visual odometry CLI (reference `slam.py` headless mode):
video / webcam / image-folder in -> trajectory npz (+ memory pickle,
optional rerender), FPS logging."""

from __future__ import annotations

import argparse
import os
import time


def get_args_parser():
    p = argparse.ArgumentParser("must3r slam")
    p.add_argument("--chkpt", default=None)
    p.add_argument("--preset", default="512", choices=["224", "512", "tiny"])
    p.add_argument("--input", nargs="+", required=True,
                   help="video file(s), 'cam:N', or image folder(s)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--subsamp", type=int, default=2)
    p.add_argument("--keyframe_overlap_thr", type=float, default=0.05)
    p.add_argument("--min_conf_keyframe", type=float, default=1.5)
    p.add_argument("--overlap_percentile", type=float, default=85.0)
    p.add_argument("--num_init_frames", type=int, default=1)
    p.add_argument("--max_keyframes", type=int, default=256)
    p.add_argument("--rerender", action="store_true")
    p.add_argument("--save_memory", action="store_true")
    p.add_argument("--load_memory", default=None)
    p.add_argument("--filtering_mode", default=None,
                   help="e.g. laplacian or laplacian-conf")
    p.add_argument("--amp", default="bf16", choices=["bf16", "fp32", "bfloat16", "float32"])
    p.add_argument("--kv_quant", default=None, choices=["fp8", "int8"],
                   help="8-bit token memory (per-token scales): ~2x "
                        "keyframe capacity per chip")
    p.add_argument("--live", action="store_true", default=False,
                   help="serve a live map viewer, updated per keyframe "
                        "(the open3d GUI/viser role)")
    p.add_argument("--live_port", type=int, default=8643)
    p.add_argument("--web", action="store_true", default=False,
                   help="full browser GUI: live map + frame/depth/conf "
                        "panels + pause + follow-cam (the reference "
                        "Open3D GUI, slam/slam.py:246-564)")
    p.add_argument("--web_every", type=int, default=2,
                   help="publish the image panels every Nth frame")
    p.add_argument("--web_hold", type=float, default=0.0,
                   help="keep the GUI/viewer up N seconds after finishing")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--gt_poses", default=None,
                   help="GT trajectory for ATE/RPE: .npz (poses/timestamps)"
                        " or TUM format (t tx ty tz qx qy qz qw)")
    return p


def load_gt_trajectory(path):
    """Returns (poses [N, 4, 4] c2w, timestamps [N])."""
    import numpy as np

    if path.endswith(".npz"):
        d = np.load(path, allow_pickle=True)
        return d["poses"], d.get("timestamps",
                                 np.arange(len(d["poses"])))
    poses, ts = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            t, tx, ty, tz, qx, qy, qz, qw = vals[:8]
            n = (qx * qx + qy * qy + qz * qz + qw * qw) ** 0.5
            qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
            r = np.asarray([
                [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
                 2 * (qx * qz + qy * qw)],
                [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
                 2 * (qy * qz - qx * qw)],
                [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
                 1 - 2 * (qx * qx + qy * qy)]])
            p = np.eye(4)
            p[:3, :3] = r
            p[:3, 3] = [tx, ty, tz]
            poses.append(p)
            ts.append(t)
    return np.asarray(poses), np.asarray(ts)


def main(argv=None):
    import jax.numpy as jnp

    args = get_args_parser().parse_args(argv)
    from must3r_tpu.cli.common import (enable_compile_cache,
                                       load_or_init_model)
    enable_compile_cache()
    from must3r_tpu.slam import Must3rSLAM, SlamConfig
    from must3r_tpu.slam.data import AutoMultiLoader

    os.makedirs(args.output_dir, exist_ok=True)
    params, enc_cfg, dec_cfg = load_or_init_model(args.chkpt, args.preset,
                                                  img_size=args.res)
    cfg = SlamConfig(res=args.res,
                     keyframe_overlap_thr=args.keyframe_overlap_thr,
                     min_conf_keyframe=args.min_conf_keyframe,
                     overlap_percentile=args.overlap_percentile,
                     num_init_frames=args.num_init_frames,
                     max_keyframes=args.max_keyframes,
                     rerender=args.rerender, kv_quant=args.kv_quant)
    dtype = jnp.bfloat16 if args.amp == "bf16" else jnp.float32
    viewer = None
    gui = None
    if args.web:
        from must3r_tpu.slam.webgui import SlamWebGUI

        cfg.keep_memory = True
        gui = SlamWebGUI(port=args.live_port, panel_every=args.web_every)
        viewer = gui
    elif args.live:
        from must3r_tpu.demo.live import LiveViewer

        cfg.keep_memory = True          # get_map needs keyframe pointmaps
        viewer = LiveViewer(port=args.live_port)
    slam = Must3rSLAM(params, enc_cfg, dec_cfg, cfg, dtype=dtype)
    if args.load_memory:
        slam.load_memory(args.load_memory)

    loader = AutoMultiLoader(args.input, subsamp=args.subsamp)
    t0 = time.time()
    n = 0
    # one-frame lookahead: the next frame's encoder dispatches before the
    # current frame's blocking fetch (speculative pipelining -- the encode
    # overlaps the host's KD-tree/keyframe work; slam/model.py __call__)
    it = iter(loader)
    cur = next(it, None)
    while cur is not None:
        if gui is not None:
            while gui.paused:           # browser pause button
                time.sleep(0.05)
        nxt = next(it, None)
        frame, fid, cam = cur
        out = slam(frame, fid, cam, return_maps=gui is not None,
                   next_frame=nxt[0] if nxt is not None else None,
                   next_frame_id=nxt[1] if nxt is not None else None)
        cur = nxt
        n += 1
        if gui is not None:
            fps = n / max(time.time() - t0, 1e-9)
            gui.publish_frame(frame, out,
                              stats=f"frame {fid} | {fps:.1f} fps | "
                                    f"{slam.num_mem_frames} kf | overlap "
                                    f"{out['overlap_score']:.3f}")
        if viewer is not None and out.get("iskeyframe"):
            import numpy as np

            pts, cols = slam.get_map(args.min_conf_keyframe)
            cams = np.stack(slam.all_poses)[:, :3, 3] \
                if slam.all_poses else None
            viewer.set_views(pts, cols, cams)
        if n % 60 == 0:
            fps = n / (time.time() - t0)
            print(f"frame {fid}: fps={fps:.2f} keyframes="
                  f"{slam.num_mem_frames} overlap={out['overlap_score']:.3f}")
        if args.max_frames and n >= args.max_frames:
            break
    loader.release()
    elapsed = time.time() - t0
    fps = n / max(elapsed, 1e-9)
    print(f"processed {n} frames in {elapsed:.1f}s ({fps:.2f} fps), "
          f"{slam.num_mem_frames} keyframes")

    if args.rerender:
        slam.rerender_all_frames()
    slam.write_all_poses(os.path.join(args.output_dir, "all_poses.npz"),
                         filtering_mode=args.filtering_mode,
                         fps=fps, nframes=n)
    if args.save_memory:
        slam.save_memory(os.path.join(args.output_dir, "memory.pkl"))

    if args.gt_poses:
        import json

        import numpy as np

        from must3r_tpu.slam.metrics import evaluate_trajectory

        gt, gt_ts = load_gt_trajectory(args.gt_poses)
        pred = np.stack(slam.all_poses)
        pred_ts = np.asarray(slam.all_timestamps)
        report = evaluate_trajectory(pred, gt, pred_ts, gt_ts)
        print("trajectory eval:", report)
        with open(os.path.join(args.output_dir, "ate_report.json"),
                  "w") as f:
            json.dump(report, f, indent=2)

    if viewer is not None:
        if args.web_hold > 0:
            print(f"viewer at {viewer.url} for {args.web_hold:g}s")
            time.sleep(args.web_hold)
        viewer.close()


if __name__ == "__main__":
    main()
