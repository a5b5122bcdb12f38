"""Headless reconstruction CLI (reference `get_reconstruction.py` +
headless `demo.py`): images in -> GLB/PLY at several confidence
thresholds + pickled SceneState out."""

from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("must3r reconstruct")
    p.add_argument("--chkpt", default=None,
                   help="checkpoint dir (native) or .pth (reference)")
    p.add_argument("--preset", default="512", choices=["224", "512", "tiny"])
    p.add_argument("--input", default=None,
                   help="image folder or list file (omit with --web)")
    p.add_argument("--output_dir", default=None)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--num_mem_images", type=int, default=20)
    p.add_argument("--init_num_images", type=int, default=2)
    p.add_argument("--retrieval", default=None,
                   help="retrieval checkpoint (.pth) for keyframe selection")
    p.add_argument("--mode", default="retrieval",
                   choices=["retrieval", "linseq", "vidslam", "vidseq"],
                   help="reference demo execution modes (gradio.py:354-358)")
    p.add_argument("--is_sequence", action="store_true",
                   help="alias for --mode linseq")
    p.add_argument("--local_context_size", type=int, default=25)
    p.add_argument("--keyframe_interval", type=int, default=3)
    p.add_argument("--keyframe_overlap_thr", type=float, default=0.15)
    p.add_argument("--min_conf_keyframe", type=float, default=1.5)
    p.add_argument("--num_refinements_iterations", type=int, default=0)
    p.add_argument("--max_bs", type=int, default=8)
    p.add_argument("--conf_thrs", type=float, nargs="+",
                   default=[1.5, 3.0, 5.0])
    p.add_argument("--amp", default="bf16", choices=["bf16", "fp32", "bfloat16", "float32"])
    p.add_argument("--kv_quant", default=None, choices=["fp8", "int8"],
                   help="8-bit token memory (per-token scales): ~2x "
                        "image capacity per chip")
    p.add_argument("--live", action="store_true", default=False,
                   help="serve a live viewer that streams the growing "
                        "pointcloud during reconstruction (viser role, "
                        "reference demo/viser.py:211-266)")
    p.add_argument("--live_port", type=int, default=8642)
    p.add_argument("--live_hold", type=float, default=0.0,
                   help="keep the viewer up N seconds after finishing")
    p.add_argument("--web", action="store_true", default=False,
                   help="serve the interactive web demo (upload images in "
                        "the browser, run, explore, download GLB/PLY -- "
                        "the reference gradio app's workflow, "
                        "demo/gradio.py:354-513) instead of batch mode")
    p.add_argument("--web_port", type=int, default=8643)
    p.add_argument("--web_hold", type=float, default=None,
                   help="serve for N seconds then exit (default: forever)")
    return p


def main(argv=None):
    args = get_args_parser().parse_args(argv)
    from must3r_tpu.cli.common import (enable_compile_cache,
                                       load_or_init_model, make_core)
    enable_compile_cache()
    from must3r_tpu.demo import must3r_inference, scene_to_glb, scene_to_ply
    from must3r_tpu.tools.viz import scene_to_html
    from must3r_tpu.tools.image import list_images, load_images

    params, retrieval_head = None, None
    if args.web:
        params, enc_cfg, dec_cfg = load_or_init_model(
            args.chkpt, args.preset, img_size=args.image_size)
        core = make_core(params, enc_cfg, dec_cfg, args.amp,
                         kv_quant=args.kv_quant)
        if args.retrieval:
            from must3r_tpu.retrieval.model import \
                convert_torch_retrieval_checkpoint
            retrieval_head = convert_torch_retrieval_checkpoint(
                args.retrieval)
        from must3r_tpu.demo.webapp import WebDemo

        app = WebDemo(core, image_size=args.image_size, port=args.web_port,
                      retrieval_head=retrieval_head)
        try:
            if args.web_hold is not None:
                time.sleep(args.web_hold)
            else:
                while True:
                    time.sleep(3600)
        except KeyboardInterrupt:
            pass
        app.close()
        return

    if not args.input or not args.output_dir:
        raise SystemExit("--input and --output_dir are required "
                         "(or use --web)")
    os.makedirs(args.output_dir, exist_ok=True)
    if os.path.isdir(args.input):
        paths = list_images(args.input)
    else:
        with open(args.input) as f:
            paths = [ln.strip() for ln in f
                     if ln.strip() and not ln.startswith("#")]
    print(f"found {len(paths)} images")

    params, enc_cfg, dec_cfg = load_or_init_model(
        args.chkpt, args.preset, img_size=args.image_size)
    core = make_core(params, enc_cfg, dec_cfg, args.amp,
                     kv_quant=args.kv_quant)

    retrieval_head = None
    if args.retrieval:
        from must3r_tpu.retrieval.model import convert_torch_retrieval_checkpoint
        retrieval_head = convert_torch_retrieval_checkpoint(args.retrieval)

    views = load_images(paths, args.image_size, verbose=True)
    # single-bucket constraint for the fused path: group by stored shape
    shapes = {v["img"].shape for v in views}
    assert len(shapes) == 1, (
        f"mixed aspect buckets {shapes}: run per-bucket (multi-AR routing "
        "is handled by the library API, see engine.inference)")

    mode = "linseq" if args.is_sequence else args.mode
    if mode in ("vidslam", "vidseq"):
        from must3r_tpu.demo import must3r_inference_video

        scene = must3r_inference_video(
            core, views, init_num_images=args.init_num_images,
            local_context_size=args.local_context_size,
            num_refinements_iterations=args.num_refinements_iterations,
            mode="slam" if mode == "vidslam" else "interval",
            keyframe_interval=args.keyframe_interval,
            keyframe_overlap_thr=args.keyframe_overlap_thr,
            min_conf_keyframe=args.min_conf_keyframe,
            encode_bs=args.max_bs, verbose=True)
    else:
        viewer = None
        on_update = None
        if args.live:
            from must3r_tpu.demo.live import LiveViewer

            viewer = LiveViewer(port=args.live_port)
            imgs_v = np.stack([v["img"] for v in views])
            on_update = viewer.update_callback(imgs=imgs_v)
        scene = must3r_inference(
            core, views, num_mem_images=args.num_mem_images,
            init_num_images=args.init_num_images,
            is_sequence=(mode == "linseq"), retrieval_head=retrieval_head,
            num_refinements_iterations=args.num_refinements_iterations,
            encode_bs=args.max_bs, render_bs=args.max_bs, verbose=True,
            on_update=on_update)
        if viewer is not None:
            # switch the viewer to interactive post-hoc mode: the page's
            # conf-threshold slider / keyframes-only toggle re-filter the
            # finished SceneState without re-inference
            viewer.serve_scene(scene)
            if args.live_hold > 0:
                print(f"viewer at {viewer.url} for {args.live_hold:g}s "
                      "(interactive re-thresholding)")
                time.sleep(args.live_hold)
            viewer.close()

    with open(os.path.join(args.output_dir, "scene.pkl"), "wb") as f:
        pickle.dump(scene, f)
    scene_to_html(scene, os.path.join(args.output_dir, "scene.html"),
                  conf_thr=args.conf_thrs[0])
    for thr in args.conf_thrs:
        glb = os.path.join(args.output_dir, f"scene_conf{thr:g}.glb")
        ply = os.path.join(args.output_dir, f"scene_conf{thr:g}.ply")
        scene_to_glb(scene, glb, conf_thr=thr)
        scene_to_ply(scene, ply, conf_thr=thr)
        print(f"wrote {glb} and {ply}")


if __name__ == "__main__":
    main()
