"""Benchmarks for the BASELINE.json configs.

Prints ONE JSON line per metric — {"metric", "value", "unit",
"vs_baseline"} — with the headline metric (offline 512x384 10-view
views/s, the round-1 metric) printed LAST so drivers that parse only the
final line keep series continuity.

Capture design (round 5). The top-level process is a pure ORCHESTRATOR:
it never initializes the device. Every config runs in a bounded child
subprocess against one shared wall-clock budget (BENCH_TOTAL_BUDGET,
default 1800 s), in two passes:

  pass 1 (fast): every config emits a number via its cheap path — the
    host-side pipelined loop for the offline configs (marked
    *_degraded_hostloop=1), the plain measurement for the rest. The
    headline config runs FIRST so its line exists even if the capture
    is later killed.
  pass 2 (upgrade): with remaining budget, ONE bounded child compiles
    the scanned back-to-back serving programs into the persistent cache
    (before touching them from a measuring child), then each offline
    config re-emits its metric from the scanned measurement
    (*_degraded_hostloop=0).

A metric may therefore appear twice; the LAST occurrence of each metric
name is authoritative. The headline line is re-emitted at the very end.
A child that dies/times out yields a `bench_<name>_capture_failed`
diagnostic, never a hang: no unbounded compile ever runs outside a
child's timeout (the round-4 failure mode — a 1200 s-per-config
precompile on a cold cache — is structurally impossible).

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

Run a single config with `python bench.py <name>` (still orchestrated:
fast pass + scanned upgrade for that config only).
"""

import json
import os
import sys
import time

# persistent compilation cache: each program compiles once per machine;
# subsequent bench invocations start in seconds
_CACHE_DIR = os.path.expanduser("~/.cache/jax_must3r")

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

HEADLINE_METRIC = "views_per_sec_offline_512x384_10views"


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 3),
        "unit": unit,
        "vs_baseline": (round(float(value) / vs_baseline, 3)
                        if vs_baseline else None),
    }), flush=True)


# ---------------------------------------------------------------------------
# Device-side bench bodies (run only inside child processes)
# ---------------------------------------------------------------------------

def _init_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


# (enc_preset, n_views, h, w, metric, baseline, n_scenes)
_OFFLINE_CONFIGS = {
    "two_view_224": ("224", 2, 224, 224,
                     "views_per_sec_offline_224x224_2views",
                     BASELINE_OFFLINE_224, 1),
    # Bulk-serving variant: 8 independent 2-view scenes per dispatch.
    # One scene leaves 224-class matmuls tiny ([392, 1024] activations,
    # ~29 TF/s effective -- docs/PERF.md); batching scenes is the lever.
    # vs_baseline deliberately None: the published-recipe comparison is
    # the 1-scene config; an 8-scene aggregate over the 1-scene baseline
    # would read as a fake ~8x.
    "two_view_224_x8": ("224", 2, 224, 224,
                        "views_per_sec_offline_224x224_2views_x8scenes",
                        None, 8),
    "offline_512": ("512", 10, 384, 512, HEADLINE_METRIC,
                    BASELINE_OFFLINE_512, 1),
}


def _build_offline(name):
    jax = _init_jax()
    import jax.numpy as jnp

    from must3r_tpu.config import must3r_224_configs, must3r_512_configs
    from must3r_tpu.engine import InferenceCore, make_fused_offline
    from must3r_tpu.models import init_decoder, init_encoder

    preset, n_views, h, w, metric, baseline, n_scenes = _OFFLINE_CONFIGS[name]
    enc_cfg, dec_cfg = (must3r_224_configs() if preset == "224"
                        else must3r_512_configs())
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    core = InferenceCore(init_encoder(k1, enc_cfg), init_decoder(k2, dec_cfg),
                         enc_cfg, dec_cfg, dtype=jnp.bfloat16)
    fused = make_fused_offline(core, n_views, (h, w), compute_cam=True,
                               n_scenes=n_scenes)
    shape = (n_views, h, w, 3) if n_scenes == 1 \
        else (n_scenes, n_views, h, w, 3)
    imgs = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    small = n_views * h * w * n_scenes <= 2 * 224 * 224 * 8
    reps = 32 if small else 8
    return (fused, imgs, shape, reps, n_views, n_scenes, metric, baseline)


def _make_scanned(fused, shape, reps):
    """Back-to-back serving inside ONE program: a lax.scan over `reps`
    independent input collections, each fully reconstructed on device,
    reduced to a checksum carried through the scan (nothing is dead code
    or loop-invariant). One dispatch + one scalar fetch per timed trial:
    reads pure device throughput — the steady-state serving rate a local
    TPU-VM host would observe — regardless of the tunnel's per-dispatch
    RTT (probed separately as tunnel_rtt_ms_median). Round-3/4 history:
    the host-side pipelined loop read 46-167 views/s for the SAME code
    depending on tunnel health (docs/PERF.md), because axon serializes
    dispatch confirmation; the scanned program removes that axis."""
    import jax
    import jax.numpy as jnp

    enc_p, dec_p, pos, portrait = fused.fixed_args()
    stack = jax.random.normal(jax.random.PRNGKey(2), (reps,) + shape,
                              jnp.float32)
    if len(shape) == 4:
        stack = stack[:, None]              # pipeline expects [S, V, ...]

    def body(c, im):
        out = fused.pipeline(enc_p, dec_p, im, pos, portrait)
        return c + sum(jnp.sum(v.astype(jnp.float32))
                       for v in out.values()), None

    @jax.jit
    def scanned(st):
        c, _ = jax.lax.scan(body, jnp.float32(0), st)
        return c

    return scanned, stack


def _timed_trials(trial, metric, rate_of, baseline):
    """3 trials, corroborate the best within 10% or take up to 8; report
    the best window + spread (chip health varies minute-to-minute)."""
    times = [trial() for _ in range(3)]
    while len(times) < 8 and sorted(times)[1] > 1.10 * min(times):
        times.append(trial())
    _emit(metric, rate_of(min(times)), "views/s", baseline)
    spread = (max(times) - min(times)) / min(times)
    _emit(metric + "_trial_spread", 100 * spread, "%", None)


def child_offline_fast(name):
    """Host-side pipelined loop: reps dispatches, one fetch. Noisier
    through a sick tunnel than the scanned program (pays dispatch
    serialization), but small to compile and always measurable."""
    import jax.numpy as jnp
    (fused, imgs, _, reps, n_views, n_scenes,
     metric, baseline) = _build_offline(name)

    def hostrun():
        outs = [fused(imgs) for _ in range(reps)]
        return float(sum(jnp.sum(v.astype(jnp.float32))
                         for v in outs[-1].values()))

    hostrun()  # compile + warm (the small per-call program)

    def trial():
        t0 = time.perf_counter()
        hostrun()
        return time.perf_counter() - t0

    _timed_trials(trial, metric,
                  lambda t: reps * n_scenes * n_views / t, baseline)
    _emit(metric + "_degraded_hostloop", 1, "bool", None)


def child_offline_scanned(name):
    (fused, _, shape, reps, n_views, n_scenes,
     metric, baseline) = _build_offline(name)
    scanned, stack = _make_scanned(fused, shape, reps)
    float(scanned(stack))  # compile (persistent-cache hit) + warm

    def trial():
        t0 = time.perf_counter()
        float(scanned(stack))
        return time.perf_counter() - t0

    _timed_trials(trial, metric,
                  lambda t: reps * n_scenes * n_views / t, baseline)
    _emit(metric + "_degraded_hostloop", 0, "bool", None)


def child_compile_only(names):
    """Compile the scanned AND per-call programs for the given offline
    configs into the persistent cache; emit nothing. Run by the
    orchestrator BEFORE any measuring child touches the device, so
    measuring children only ever see cache hits. Non-offline names are
    rejected (they have no separate compile phase)."""
    bad = [n for n in names if n not in _OFFLINE_CONFIGS]
    if bad:
        print(f"--compile-only supports only {list(_OFFLINE_CONFIGS)}, "
              f"got {bad}", file=sys.stderr)
        sys.exit(2)
    for name in names:
        fused, imgs, shape, reps, *_ = _build_offline(name)
        scanned, stack = _make_scanned(fused, shape, reps)
        t0 = time.perf_counter()
        scanned.lower(stack).compile()
        print(f"compiled scanned[{name}] in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        import jax
        jax.block_until_ready(fused(imgs))
        print(f"compiled percall[{name}] in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)


def child_rtt():
    """Emit the host<->device dispatch+fetch round-trip as a diagnostic
    metric line. The chip in this environment sits behind a remote tunnel
    whose RTT (~26 ms when healthy, minute-to-minute spikes observed to
    4x that) bounds any latency-sensitive measurement on small configs; a
    local TPU-VM host would measure ~0. Recording it NEXT TO the numbers
    makes each capture's environment part of the record (VERDICT r3 next
    #1). vs_baseline: null (diagnostic, not a throughput metric)."""
    jax = _init_jax()
    import jax.numpy as jnp
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


def child_retrieval_50():
    """Keyframe selection on an unordered 50-image collection: encode all
    (ViT-L, 512x384), HOW-style local features, ASMK similarity matrix,
    FPS anchors + greedy ordering (reference demo/inference.py:139-171 +
    retrieval/processor.py:95-126)."""
    jax = _init_jax()
    import jax.numpy as jnp

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


def child_online_vo():
    """Streaming VO frame rate, device-pipelined: each frame is one fused
    program (uint8 upload -> ImgNorm -> encode -> tentative update -> head
    -> activation/focal/Procrustes/overlap inputs). Frames are dispatched
    back-to-back with the memory donated (always-commit), materializing
    once at the end — the rate a local TPU-VM host sees; a remote tunnel
    adds its own per-frame round-trip on top (docs/PERF.md)."""
    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np

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


def child_train_step():
    """Causal multi-view training step: flagship towers @224 (the
    reference 224 training recipe, README.md:242), 20 views in causal
    blocks of 5, 2 rendered views, bf16 + token dropout + remat."""
    import dataclasses

    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np

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


def child_sharded_sp2():
    """SURVEY §5.7 sequence parallelism: update+render cost with the KV
    memory sharded over a 2-way 'sp' mesh vs unsharded, on a virtual CPU
    mesh (one real chip here; the sharded path's win is HBM capacity --
    collections larger than one chip -- not single-host speed). Reported
    value = sharded/unsharded wall ratio; the blockwise-flash-per-shard +
    LSE merge keeps it near 1x (attribution: scripts/attr_sp2.py). Set
    SP_N=4 for the 4-way scaling point."""
    import subprocess

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
    out = subprocess.run([sys.executable, "-c", _SP2_WORKER],
                         cwd=os.path.dirname(os.path.abspath(__file__)),
                         env=env, capture_output=True, text=True,
                         timeout=1200)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        raise RuntimeError(f"sp2 worker failed: {out.stderr[-2000:]}")
    r = json.loads(line[-1])
    _emit(f"sharded_sp{sp_n}_overhead_vs_unsharded", r["overhead_x"], "x",
          None)


# bench name -> (fast-pass fn, static wall cap seconds). Fast-pass order
# below is the pass-1 execution order: headline config first, then the
# CPU-only sp2 overhead (needs no tunnel -- never let device configs
# starve it), then the rest by value-per-second.
_FAST_PLAN = [
    # 240 s: backend init alone can take >120 s through a sick tunnel
    # (both r5 validation runs lost the rtt diagnostic to a 120 s cap)
    ("rtt", child_rtt, 240),
    ("offline_512", lambda: child_offline_fast("offline_512"), 420),
    ("sharded_sp2", child_sharded_sp2, 480),
    ("two_view_224", lambda: child_offline_fast("two_view_224"), 300),
    ("two_view_224_x8", lambda: child_offline_fast("two_view_224_x8"), 300),
    ("online_vo", child_online_vo, 420),
    ("train_step", child_train_step, 600),
    ("retrieval_50", child_retrieval_50, 420),
]
_FAST_FNS = {name: fn for name, fn, _ in _FAST_PLAN}
# pass-2 scanned upgrades (offline configs only). two_view_224 first: its
# host-loop number is the RTT-bound one (tiny per-dispatch compute), so
# the scanned upgrade moves it most; the 512/x8 host-loop numbers are
# already near device rate (big per-dispatch programs amortize the RTT).
_SCANNED_ORDER = ["two_view_224", "offline_512", "two_view_224_x8"]

BENCHES = [name for name, _, _ in _FAST_PLAN if name != "rtt"]


# ---------------------------------------------------------------------------
# Orchestrator (never touches the device)
# ---------------------------------------------------------------------------

class _Budget:
    def __init__(self, total):
        self.deadline = time.monotonic() + total

    def remaining(self):
        return self.deadline - time.monotonic()

    def cap(self, static_cap, n_after, floor_each=150.0):
        """Child timeout: its static cap, shrunk so that each of the
        n_after remaining children keeps at least floor_each seconds
        (a measuring child needs ~1-2 min of backend init + warm trials
        through the tunnel before it can emit anything; a 45 s floor in
        the first r5 validation run starved retrieval/sp2 entirely)."""
        return min(static_cap, self.remaining() - floor_each * n_after)


def _run_child(argv, timeout, tag, final):
    """Run a bounded child; relay its JSON metric lines to stdout and
    everything else to stderr. Partial lines from a killed child are
    still relayed (a timed-out child's already-emitted metrics land in
    the record). Primary metrics (not *_trial_spread/*_degraded_*
    diagnostics) are recorded into `final` (last occurrence wins).
    Returns True if the child exited 0."""
    import subprocess
    cmd = [sys.executable, os.path.abspath(__file__)] + argv
    try:
        r = subprocess.run(cmd, cwd=os.path.dirname(os.path.abspath(__file__)),
                           timeout=max(1.0, timeout), capture_output=True,
                           text=True)
        out, err, rc = r.stdout, r.stderr, r.returncode
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
        err = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) \
            else (e.stderr or "")
        rc = -1
        print(f"[{tag}] timed out after {timeout:.0f}s", file=sys.stderr,
              flush=True)
    for ln in out.splitlines():
        if ln.startswith("{"):
            print(ln, flush=True)
            try:
                rec = json.loads(ln)
                m = rec.get("metric", "")
                if not m.endswith(("_trial_spread", "_degraded_hostloop")):
                    final[m] = rec
            except ValueError:
                pass
        else:
            print(f"[{tag}] {ln}", file=sys.stderr, flush=True)
    if err.strip():
        tail = err.strip().splitlines()[-8:]
        for ln in tail:
            print(f"[{tag}] {ln}", file=sys.stderr, flush=True)
    if rc != 0:
        print(f"[{tag}] child rc={rc}", file=sys.stderr, flush=True)
    return rc == 0


def orchestrate(names):
    budget = _Budget(float(os.environ.get("BENCH_TOTAL_BUDGET", "1800")))
    final = {}          # metric -> last-emitted record (insertion-ordered)

    # ---- pass 1: fast path for every requested config
    plan = [(n, cap) for n, _, cap in _FAST_PLAN
            if n == "rtt" or n in names]
    for i, (name, static_cap) in enumerate(plan):
        cap = budget.cap(static_cap, len(plan) - 1 - i)
        if cap < 60:
            _emit(f"bench_{name}_capture_skipped", 1, "bool", None)
            continue
        ok = _run_child(["--child", "fast", name], cap, f"fast:{name}",
                        final)
        if not ok and name != "rtt":
            _emit(f"bench_{name}_capture_failed", 1, "bool", None)

    # ---- pass 2: scanned upgrades for the offline configs.
    # Gated OFF by default: the remote compile service this environment
    # mandates (local AOT is blocked by a libtpu client/terminal version
    # mismatch) reliably drops the connection on the scanned program's
    # compile request -- 4 recorded attempts across rounds 4-5 all died
    # with 'Broken pipe (os error 32)' at ~25 min
    # (docs/hw_roundup_r5/scanned_compile_attempts.md). The design stays
    # one env var away (BENCH_TRY_SCANNED=1) for environments whose
    # compile path can take it; the host-loop numbers + the RTT
    # diagnostic line carry the record meanwhile.
    scan_names = [n for n in _SCANNED_ORDER if n in names] \
        if os.environ.get("BENCH_TRY_SCANNED") else []
    if scan_names and budget.remaining() > 300:
        # one compile child populates the persistent cache BEFORE any
        # measuring child touches the device (ADVICE r4: the old design
        # compiled in a subprocess while the parent held the device)
        ok = _run_child(["--compile-only"] + scan_names,
                        budget.cap(900, len(scan_names)),
                        "compile", final)
        if ok:
            for i, name in enumerate(scan_names):
                cap = budget.cap(300, len(scan_names) - 1 - i)
                if cap < 60:
                    break
                _run_child(["--child", "scanned", name], cap,
                           f"scanned:{name}", final)
        else:
            print("scanned-program prewarm failed/timed out; record keeps "
                  "the pass-1 host-loop numbers", file=sys.stderr,
                  flush=True)

    # ---- final compact record: one line per metric, headline LAST.
    # The driver keeps only the TAIL of the output plus the final parsed
    # line (BENCH_r0*.json), so the complete set of authoritative values
    # must sit at the very end, diagnostics excluded, headline closing.
    print("[final record: last occurrence of each metric is authoritative]",
          file=sys.stderr, flush=True)
    hl = final.pop(HEADLINE_METRIC, None)
    for rec in final.values():
        print(json.dumps(rec), flush=True)
    if hl is not None:
        print(json.dumps(hl), flush=True)


def main():
    argv = sys.argv[1:]
    if argv[:1] == ["--child"]:
        mode, name = argv[1], argv[2]
        if mode == "fast":
            _FAST_FNS[name]()
        elif mode == "scanned":
            child_offline_scanned(name)
        else:
            print(f"unknown child mode {mode}", file=sys.stderr)
            sys.exit(2)
        return
    if "--compile-only" in argv:
        child_compile_only([a for a in argv if a != "--compile-only"])
        return
    names = argv or list(BENCHES)
    unknown = [n for n in names if n not in BENCHES]
    if unknown:
        print(f"unknown bench name(s) {unknown}; valid: {BENCHES}",
              file=sys.stderr)
        sys.exit(2)
    orchestrate(names)


if __name__ == "__main__":
    main()
