"""Benchmarks for the five BASELINE.json configs.

Prints ONE JSON line per config — {"metric", "value", "unit",
"vs_baseline"} — with the headline metric (offline 512x384 10-view
views/s, the round-1 metric) printed LAST so drivers that parse only the
final line keep series continuity.

Configs (BASELINE.json "configs" list):
  1. two_view_224      MUSt3R_224 offline 2-view reconstruction
  2. offline_512       MUSt3R_512 offline 10-view reconstruction (headline)
  3. retrieval_50      ASMK retrieval keyframe selection on an unordered
                       50-image collection (encode -> local feats -> ASMK
                       similarity -> FPS + greedy ordering)
  4. online_vo         per-frame streaming decode (slam.py equivalent):
                       encode + tentative memory update + head + pose,
                       device-pipelined rate
  5. train_step        multi-view causal training step, 20 views, bf16,
                       token dropout (flagship towers @224, the reference
                       224 recipe shape: reference README.md:242)

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
Where a defensible estimate of the CUDA+xformers reference on one A100
exists it is used and documented inline; otherwise vs_baseline is null.

Run a single config with `python bench.py <name>`.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: each program compiles once per machine;
# subsequent bench invocations start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_must3r"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Round-1 baseline estimate: ~25 views/s for the reference offline
# pipeline (A100, 512x384, ViT-L encode + ViT-B decode + render,
# ~0.7 TFLOP/view end-to-end). 224x224 has 196 vs 768 tokens/view
# (~3.9x fewer FLOPs) -> ~98 views/s estimated reference rate.
BASELINE_OFFLINE_512 = 25.0
BASELINE_OFFLINE_224 = 98.0
# Reference slam.py per frame: ViT-L encode + decoder update + head +
# CPU Procrustes/KD-tree bookkeeping; ~0.1s/frame is a generous estimate
# for an A100 (the repo publishes none) -> 10 fps.
BASELINE_VO_FPS = 10.0


# --compile-only mode: build + compile the scanned measurement program
# (populating the persistent cache), emit nothing, exit. Used by the
# parent bench process to bound first-compile time (see _offline).
_COMPILE_ONLY = False
_CURRENT_BENCH = None


def _precompile_in_subprocess():
    """Compile the current config's scanned program in a child process
    bounded by BENCH_COMPILE_TIMEOUT seconds. On success the program is
    in the persistent cache and the caller's own compile is a fast cache
    hit; on timeout/failure we raise so the caller degrades to the
    host-loop measurement instead of hanging the whole capture."""
    import subprocess
    timeout = float(os.environ.get("BENCH_COMPILE_TIMEOUT", "1200"))
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), _CURRENT_BENCH,
         "--compile-only"],
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=timeout, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"precompile failed: {r.stderr[-500:]}")


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 3),
        "unit": unit,
        "vs_baseline": (round(float(value) / vs_baseline, 3)
                        if vs_baseline else None),
    }), flush=True)


def _offline(configs, n_views, h, w, metric, baseline, n_scenes=1,
             emit_device_rate=False):
    from must3r_tpu.engine import InferenceCore, make_fused_offline
    from must3r_tpu.models import init_decoder, init_encoder

    enc_cfg, dec_cfg = configs
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    core = InferenceCore(init_encoder(k1, enc_cfg), init_decoder(k2, dec_cfg),
                         enc_cfg, dec_cfg, dtype=jnp.bfloat16)
    fused = make_fused_offline(core, n_views, (h, w), compute_cam=True,
                               n_scenes=n_scenes)

    shape = (n_views, h, w, 3) if n_scenes == 1 \
        else (n_scenes, n_views, h, w, 3)
    imgs = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)

    # ---- primary measurement: back-to-back serving inside ONE program.
    # The reps loop rides a lax.scan over `reps` independent input
    # collections, each fully reconstructed on device, reduced to a
    # checksum carried through the scan (so nothing is dead code and
    # nothing is loop-invariant). One dispatch + one scalar fetch per
    # timed trial: the measurement reads pure device throughput — the
    # steady-state serving rate a local TPU-VM host would observe —
    # regardless of the tunnel's per-dispatch RTT (probed separately as
    # tunnel_rtt_ms_median; at reps>=16 the single RTT in the timed
    # region is <6% even on the smallest config). Round-3/4 history: the
    # old host-side pipelined loop read 46-167 views/s for the SAME code
    # depending on tunnel health (docs/PERF.md), because axon serializes
    # dispatch confirmation; the scanned program removes that axis.
    small = n_views * h * w * n_scenes <= 2 * 224 * 224 * 8
    reps = 32 if small else 8
    enc_p, dec_p, pos, portrait = fused.fixed_args()
    stack = jax.random.normal(jax.random.PRNGKey(2), (reps,) + shape,
                              jnp.float32)
    if n_scenes == 1:
        stack = stack[:, None]              # pipeline expects [S, V, ...]

    def body(c, im):
        out = fused.pipeline(enc_p, dec_p, im, pos, portrait)
        return c + sum(jnp.sum(v.astype(jnp.float32))
                       for v in out.values()), None

    @jax.jit
    def scanned(st):
        c, _ = jax.lax.scan(body, jnp.float32(0), st)
        return c

    # The scanned program is large; the remote compile service behind the
    # axon tunnel has been observed to drop the connection mid-compile
    # ("Broken pipe" after ~30 min) when its health is poor. Two guards:
    #   (a) the first compile happens in a SUBPROCESS bounded by
    #       BENCH_COMPILE_TIMEOUT (default 1200 s); on success it lands in
    #       the persistent cache and the parent re-lowers in seconds. A
    #       hung compile service therefore costs a bounded slice of the
    #       capture budget, not all of it.
    #   (b) any residual compile/tunnel failure falls back to the
    #       host-side pipelined loop (reps dispatches, one fetch) —
    #       noisier through a sick tunnel, but always measurable — and is
    #       marked with a *_degraded_hostloop diagnostic line.
    degraded = False
    if _COMPILE_ONLY:
        scanned.lower(stack).compile()
        return
    try:
        _precompile_in_subprocess()
        float(scanned(stack))  # compile (cache hit) + warm

        def trial():
            t0 = time.perf_counter()
            float(scanned(stack))
            return time.perf_counter() - t0
    except Exception as e:   # remote-compile / tunnel failure
        degraded = True
        print(f"scanned-program compile failed ({type(e).__name__}: "
              f"{str(e)[:200]}); falling back to host-loop measurement",
              file=sys.stderr, flush=True)

        def hostrun():
            outs = [fused(imgs) for _ in range(reps)]
            return float(sum(jnp.sum(v.astype(jnp.float32))
                             for v in outs[-1].values()))

        hostrun()  # compile + warm (the small per-call program)

        def trial():
            t0 = time.perf_counter()
            hostrun()
            return time.perf_counter() - t0

    # chip health can still vary minute-to-minute: corroborate the best
    # trial within 10% or exhaust the budget, report the best window
    times = [trial() for _ in range(3)]
    while (len(times) < 8
           and sorted(times)[1] > 1.10 * min(times)):
        times.append(trial())
    t_best = min(times)
    rate = reps * n_scenes * n_views / t_best
    _emit(metric, rate, "views/s", baseline)
    spread = (max(times) - min(times)) / min(times)
    _emit(metric + "_trial_spread", 100 * spread, "%", None)
    if degraded:
        _emit(metric + "_degraded_hostloop", 1, "bool", None)

    if emit_device_rate:
        # host-loop diagnostic: dispatch reps reconstructions from the
        # host with one final fetch. On a local TPU-VM this matches the
        # scanned rate; through the tunnel it additionally pays dispatch
        # serialization, so the DELTA to the scanned rate isolates the
        # environment tax (recorded, not hidden).
        def hostloop(n):
            outs = [fused(imgs) for _ in range(n)]
            return float(sum(jnp.sum(v) for o in outs
                             for v in o.values()))

        hostloop(2)  # warm this dispatch path
        t0 = time.perf_counter()
        hostloop(reps)
        t_host = time.perf_counter() - t0
        _emit("hostloop_" + metric,
              reps * n_scenes * n_views / t_host, "views/s", baseline)


def bench_two_view_224():
    from must3r_tpu.config import must3r_224_configs
    _offline(must3r_224_configs(), 2, 224, 224,
             "views_per_sec_offline_224x224_2views", BASELINE_OFFLINE_224,
             emit_device_rate=True)


def bench_two_view_224_batched():
    """Bulk-serving variant: 8 independent 2-view scenes per dispatch.
    One scene leaves 224-class matmuls tiny ([392, 1024] activations,
    ~29 TF/s effective -- docs/PERF.md); batching scenes is the lever."""
    from must3r_tpu.config import must3r_224_configs
    # vs_baseline deliberately None: the published-recipe comparison is
    # the 1-scene config above; an 8-scene aggregate over the 1-scene
    # baseline would read as a fake ~8x
    _offline(must3r_224_configs(), 2, 224, 224,
             "views_per_sec_offline_224x224_2views_x8scenes",
             None, n_scenes=8)


def bench_offline_512():
    from must3r_tpu.config import must3r_512_configs
    _offline(must3r_512_configs(), 10, 384, 512,
             "views_per_sec_offline_512x384_10views", BASELINE_OFFLINE_512)


def bench_retrieval_50():
    """Keyframe selection on an unordered 50-image collection: encode all
    (ViT-L, 512x384), HOW-style local features, ASMK similarity matrix,
    FPS anchors + greedy ordering (reference demo/inference.py:139-171 +
    retrieval/processor.py:95-126)."""
    from must3r_tpu.config import must3r_512_configs
    from must3r_tpu.demo.inference import select_keyframes
    from must3r_tpu.engine import InferenceCore
    from must3r_tpu.engine.inference import view_positions
    from must3r_tpu.models import init_decoder, init_encoder
    from must3r_tpu.retrieval.asmk import train_codebook
    from must3r_tpu.retrieval.model import identity_head

    enc_cfg, dec_cfg = must3r_512_configs()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    core = InferenceCore(init_encoder(k1, enc_cfg), init_decoder(k2, dec_cfg),
                         enc_cfg, dec_cfg, dtype=jnp.bfloat16)

    n, h, w = 50, 384, 512
    imgs = jax.random.normal(jax.random.PRNGKey(1), (n, h, w, 3),
                             jnp.float32)
    pos = view_positions((h, w), enc_cfg.patch_size, batch_shape=(n,))

    # the production path reuses a pretrained codebook (reference ships
    # *_codebook.pkl); train a fresh one outside the timed region
    head = identity_head(enc_cfg.embed_dim, nfeat=100)
    x = core.encode_all(imgs, pos, max_bs=10)
    feats, _ = head.extract_local_features(x)
    codebook = train_codebook(feats, k=512)

    def run():
        x = core.encode_all(imgs, pos, max_bs=10)
        # tokens stay on device; only top-k features are fetched
        return select_keyframes(core, x, 10, head, codebook)

    run()  # warmup + compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    _emit("images_per_sec_retrieval_keyframe_50imgs", n / min(times),
          "images/s", None)


def bench_online_vo():
    """Streaming VO frame rate, device-pipelined: each frame is one fused
    program (uint8 upload -> ImgNorm -> encode -> tentative update -> head
    -> activation/focal/Procrustes/overlap inputs). Frames are dispatched
    back-to-back with the memory donated (always-commit), materializing
    once at the end — the rate a local TPU-VM host sees; a remote tunnel
    adds its own per-frame round-trip on top (docs/PERF.md)."""
    from must3r_tpu.config import must3r_512_configs
    from must3r_tpu.engine.inference import view_positions
    from must3r_tpu.models import init_decoder, init_encoder
    from must3r_tpu.slam.model import Must3rSLAM, SlamConfig

    enc_cfg, dec_cfg = must3r_512_configs()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"encoder": init_encoder(k1, enc_cfg),
              "decoder": init_decoder(k2, dec_cfg)}
    slam = Must3rSLAM(params, enc_cfg, dec_cfg,
                      SlamConfig(res=512, max_keyframes=64))

    h, w = 384, 512
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8))
    pos = jnp.asarray(np.asarray(
        view_positions((h, w), enc_cfg.patch_size, batch_shape=(1,))))
    slam._hw = (h, w)
    slam._ensure_memory((h, w))
    mem = slam.mem

    def run(mem, n):
        packed = None
        for _ in range(n):
            mem, packed, _ = slam._frame_fn(slam.params, mem, frame, pos,
                                            False, 500.0)
        jax.block_until_ready(packed)
        return mem

    mem = run(mem, 2)  # warmup + compile
    n = 20
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        mem = run(mem, n)
        times.append((time.perf_counter() - t0) / n)
    _emit("fps_online_vo_512x384", 1.0 / min(times), "frames/s",
          BASELINE_VO_FPS)


def bench_train_step():
    """Causal multi-view training step: flagship towers @224 (the
    reference 224 training recipe, README.md:242), 20 views in causal
    blocks of 5, 2 rendered views, bf16 + token dropout + remat."""
    import dataclasses

    from must3r_tpu.config import must3r_224_configs
    from must3r_tpu.engine.train import (TrainSettings, cast_frozen_params,
                                         cosine_schedule, make_optimizer,
                                         make_train_step, trainable_subset)
    from must3r_tpu.models import init_decoder, init_encoder
    from must3r_tpu.ops.patch import patchify_positions

    enc_cfg, dec_cfg = must3r_224_configs()
    dec_cfg = dataclasses.replace(dec_cfg, causal=True)
    ts = TrainSettings(mem_batches=(5, 5, 5, 5), n_render=2,
                       dropout_p=0.1, dtype="bfloat16")

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"encoder": init_encoder(k1, enc_cfg),
              "decoder": init_decoder(k2, dec_cfg)}
    opt = make_optimizer(cosine_schedule(1e-4, 10, 1000), weight_decay=0.05)
    opt_state = opt.init(trainable_subset(params, ts))
    # production Trainer path: frozen encoder tower held in the compute
    # dtype (removes the per-step fp32->bf16 param convert)
    params = cast_frozen_params(params, ts)
    step = make_train_step(enc_cfg, dec_cfg, ts, opt)

    b, v, hw = 1, 20, 224
    npatch = (hw // 16) ** 2
    npos = np.asarray(patchify_positions(hw // 16, hw // 16))
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.standard_normal((b, v, hw, hw, 3)),
                           jnp.float32),
        "pos": jnp.asarray(np.broadcast_to(npos, (b, v, npatch, 2))),
        "pts3d": jnp.asarray(rng.standard_normal((b, v, hw, hw, 3)) + 3.0,
                             jnp.float32),
        "camera_pose": jnp.asarray(np.broadcast_to(
            np.eye(4, dtype=np.float32), (b, v, 4, 4))),
        "valid_mask": jnp.ones((b, v, hw, hw), bool),
        "sky_mask": jnp.zeros((b, v, hw, hw), bool),
        "is_metric_scale": jnp.zeros((b,), bool),
        "render_ids": jnp.asarray([18, 19], jnp.int32),
    }

    key = jax.random.PRNGKey(0)
    params, opt_state, loss, _ = step(params, opt_state, batch, key)
    jax.block_until_ready(loss)  # warmup + compile
    n = 3
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt_state, loss, _ = step(params, opt_state, batch, key)
        jax.block_until_ready(loss)
        times.append((time.perf_counter() - t0) / n)
    _emit("steps_per_sec_train_224_20views", 1.0 / min(times), "steps/s",
          None)


_SP2_WORKER = r"""
import json, os, time
import jax
jax.config.update("jax_platforms", "cpu")
SP_N = int(os.environ.get("SP_N", "2"))
import jax.numpy as jnp
import numpy as np

from must3r_tpu.config import DecoderConfig, EncoderConfig
from must3r_tpu.engine import InferenceCore
from must3r_tpu.engine.inference import view_positions
from must3r_tpu.models import init_decoder, init_encoder
from must3r_tpu.parallel import make_mesh

h, w, p = 384, 512, 16
enc_cfg = EncoderConfig(img_size=(h, w), patch_size=p, embed_dim=256,
                        depth=2, num_heads=4)
dec_cfg = DecoderConfig(img_size=(h, w), enc_embed_dim=256, patch_size=p,
                        embed_dim=768, output_dim=p * p * 7, depth=2,
                        num_heads=12)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
enc_p, dec_p = init_encoder(k1, enc_cfg), init_decoder(k2, dec_cfg)
n = (h // p) * (w // p)
n_views = 8
x = jax.random.normal(jax.random.PRNGKey(1), (1, n_views, n, 256),
                      jnp.float32)
pos = view_positions((h, w), p, batch_shape=(1, n_views))

def run(core, iters=4):
    # capacity for n_views + iters: the timed loop chains updates (the
    # update donates its input memory, so it cannot be re-presented)
    mem = core.new_memory(n_views + iters, (h, w))
    mem, _ = core.update(mem, x[:, :2], pos[:, :2])
    for i in range(2, n_views):
        mem, _ = core.update(mem, x[:, i:i + 1], pos[:, i:i + 1])
    toks = core.render(mem, x[:, :2], pos[:, :2])
    float(jnp.sum(toks))                       # warmup + compile
    t0 = time.perf_counter()
    for _ in range(iters):
        mem, _ = core.update(mem, x[:, 7:8], pos[:, 7:8])
        toks = core.render(mem, x[:, :2], pos[:, :2])
    float(jnp.sum(toks))
    return (time.perf_counter() - t0) / iters

core1 = InferenceCore(enc_p, dec_p, enc_cfg, dec_cfg, dtype=jnp.float32,
                      impl="chunked")
t1 = run(core1)
mesh = make_mesh(SP_N, mp=SP_N, axis_names=("dp", "sp"))
core2 = InferenceCore(enc_p, dec_p, enc_cfg, dec_cfg, dtype=jnp.float32,
                      impl="chunked", mesh=mesh)
t2 = run(core2)
print(json.dumps({"unsharded_ms": t1 * 1e3, "sharded_ms": t2 * 1e3,
                  "overhead_x": t2 / t1}))
"""


def bench_sharded_sp2():
    """SURVEY §5.7 sequence parallelism: update+render cost with the KV
    memory sharded over a 2-way 'sp' mesh vs unsharded, on a virtual CPU
    mesh (one real chip here; the sharded path's win is HBM capacity --
    collections larger than one chip -- not single-host speed). Reported
    value = sharded/unsharded wall ratio; the blockwise-flash-per-shard +
    LSE merge keeps it near 1x (attribution: scripts/attr_sp2.py). Set
    SP_N=4 for the 4-way scaling point."""
    import subprocess
    import sys as _sys

    sp_n = int(os.environ.get("SP_N", "2"))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env.update({"JAX_PLATFORMS": "cpu", "SP_N": str(sp_n),
                "XLA_FLAGS":
                    f"--xla_force_host_platform_device_count={sp_n}"
                    # starved-rendezvous watchdogs: see tests/conftest.py
                    " --xla_cpu_collective_call_warn_stuck_timeout_seconds"
                    "=120"
                    " --xla_cpu_collective_call_terminate_timeout_seconds"
                    "=1200"})
    out = subprocess.run([_sys.executable, "-c", _SP2_WORKER],
                         cwd=os.path.dirname(os.path.abspath(__file__)),
                         env=env, capture_output=True, text=True,
                         timeout=1200)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        raise RuntimeError(f"sp2 worker failed: {out.stderr[-2000:]}")
    r = json.loads(line[-1])
    _emit(f"sharded_sp{sp_n}_overhead_vs_unsharded", r["overhead_x"], "x",
          None)


BENCHES = {
    "two_view_224": bench_two_view_224,
    "two_view_224_x8": bench_two_view_224_batched,
    "retrieval_50": bench_retrieval_50,
    "online_vo": bench_online_vo,
    "train_step": bench_train_step,
    "sharded_sp2": bench_sharded_sp2,
    "offline_512": bench_offline_512,   # headline last
}


def _probe_rtt():
    """Emit the host<->device dispatch+fetch round-trip as a diagnostic
    metric line. The chip in this environment sits behind a remote tunnel
    whose RTT (~26 ms when healthy, minute-to-minute spikes observed to
    4x that) bounds any latency-sensitive measurement on small configs; a
    local TPU-VM host would measure ~0. Recording it NEXT TO the numbers
    makes each capture's environment part of the record (VERDICT r3 next
    #1). vs_baseline: null (diagnostic, not a throughput metric)."""
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    float(f(x)[0, 0])                       # compile + warm
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(f(x)[0, 0])                   # one dispatch + one fetch
        rtts.append(time.perf_counter() - t0)
    _emit("tunnel_rtt_ms_median", 1e3 * sorted(rtts)[len(rtts) // 2],
          "ms", None)


def main():
    global _COMPILE_ONLY, _CURRENT_BENCH
    argv = sys.argv[1:]
    if "--compile-only" in argv:
        _COMPILE_ONLY = True
        argv = [a for a in argv if a != "--compile-only"]
    names = argv or list(BENCHES)
    unknown = [n for n in names if n not in BENCHES]
    if unknown:
        print(f"unknown bench name(s) {unknown}; valid: {list(BENCHES)}",
              file=sys.stderr)
        sys.exit(2)
    if not _COMPILE_ONLY and set(names) != {"sharded_sp2"}:
        # (sharded_sp2 is a cpu-subprocess config: no device here)
        try:
            _probe_rtt()
        except Exception as e:
            print(f"rtt probe failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    failed = False
    for name in names:
        _CURRENT_BENCH = name
        try:
            BENCHES[name]()
        except Exception as e:  # isolate: one failing config must not
            # silence the remaining (esp. the headline, printed last)
            failed = True
            print(f"bench {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
