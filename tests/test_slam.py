"""SLAM tests: native KD-tree parity, quadrant search, streaming engine."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from must3r_tpu.config import DecoderConfig, EncoderConfig, FeedbackType
from must3r_tpu.models import init_decoder, init_encoder
from must3r_tpu.slam import KDTree3, Must3rSLAM, QuadrantSearcher, SlamConfig
from must3r_tpu.slam.nns import get_searcher
from must3r_tpu.slam.tools import get_quadrant_id, laplacian_smoothing


# ---------------------------------------------------------------------------
# Native KD-tree
# ---------------------------------------------------------------------------

def test_native_kdtree_builds():
    t = KDTree3()
    assert t.native, "C++ KD-tree failed to build -- check g++ toolchain"


def test_kdtree_matches_bruteforce(rng):
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    q = rng.standard_normal((200, 3)).astype(np.float32)
    t = KDTree3()
    t.add_pts(pts)
    got = t.query(q)
    want = np.sqrt(((q[:, None] - pts[None]) ** 2).sum(-1)).min(1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_kdtree_incremental_add(rng):
    a = rng.standard_normal((100, 3)).astype(np.float32)
    b = rng.standard_normal((150, 3)).astype(np.float32) + 5.0
    q = rng.standard_normal((50, 3)).astype(np.float32) + 2.5
    t = KDTree3()
    t.add_pts(a)
    t.add_pts(b)
    allp = np.concatenate([a, b])
    want = np.sqrt(((q[:, None] - allp[None]) ** 2).sum(-1)).min(1)
    np.testing.assert_allclose(t.query(q), want, rtol=1e-5, atol=1e-6)


def test_kdtree_empty_returns_inf():
    t = KDTree3()
    assert np.isinf(t.query(np.zeros((3, 3), np.float32))).all()


def test_kdtree_native_matches_scipy(rng):
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    q = rng.standard_normal((100, 3)).astype(np.float32)
    tn = KDTree3(prefer_native=True)
    ts = KDTree3(prefer_native=False)
    tn.add_pts(pts)
    ts.add_pts(pts)
    np.testing.assert_allclose(tn.query(q), ts.query(q), rtol=1e-5,
                               atol=1e-6)


def test_quadrant_searcher_visibility(rng):
    """Points behind the camera must not satisfy queries in front of it."""
    s = QuadrantSearcher(divider=2)
    cam = np.zeros(3, np.float32)
    behind = np.tile([[0.0, 0.0, -5.0]], (10, 1)).astype(np.float32)
    s.add_pts(behind, cam_center=cam)
    front = np.tile([[0.0, 0.0, 5.0]], (4, 1)).astype(np.float32)
    d = s.query(front, cam_center=cam)
    assert np.isinf(d).all()          # unseen quadrant
    d2 = s.query(behind[:2], cam_center=cam)
    np.testing.assert_allclose(d2, 0.0, atol=1e-6)


def test_quadrant_id_ranges(rng):
    rays = rng.standard_normal((1000, 3))
    for div in (2, 4):
        qid = get_quadrant_id(rays.copy(), div)
        assert qid.min() >= 0 and qid.max() < 2 * div * div


def test_laplacian_smoothing_reduces_noise(rng):
    t = np.linspace(0, 1, 50)[:, None] * np.array([[1.0, 2.0, 0.0]])
    noisy = t + rng.standard_normal(t.shape) * 0.05
    sm = laplacian_smoothing(noisy, alpha=0.5, iterations=10)
    assert np.linalg.norm(sm - t) < np.linalg.norm(noisy - t)
    np.testing.assert_array_equal(sm[0], noisy[0])   # endpoints fixed


def test_get_searcher_specs():
    assert get_searcher("none") is None
    assert isinstance(get_searcher("kdtree-scipy"), KDTree3)
    qs = get_searcher("kdtree-scipy-quadrant_x2")
    assert isinstance(qs, QuadrantSearcher) and qs.divider == 2


# ---------------------------------------------------------------------------
# Streaming engine (tiny model)
# ---------------------------------------------------------------------------

ENC_CFG = EncoderConfig(img_size=(32, 32), patch_size=16, embed_dim=64,
                        depth=2, num_heads=2)
DEC_CFG = DecoderConfig(img_size=(32, 32), enc_embed_dim=64, patch_size=16,
                        embed_dim=32, output_dim=16 * 16 * 7, depth=2,
                        num_heads=2, feedback=FeedbackType.SINGLE_MLP)


@pytest.fixture(scope="module")
def slam_params():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return {"encoder": init_encoder(k1, ENC_CFG),
            "decoder": init_decoder(k2, DEC_CFG)}


def _frames(rng, n, h=48, w=64):
    return [(rng.random((h, w, 3)) * 255).astype(np.uint8)
            for _ in range(n)]


def test_slam_streaming_smoke(slam_params, rng):
    cfg = SlamConfig(res=32, num_init_frames=1, max_keyframes=16,
                     kf_x_subsamp=2, keyframe_overlap_thr=0.05)
    slam = Must3rSLAM(slam_params, ENC_CFG, DEC_CFG, cfg,
                      dtype=jnp.float32, impl="chunked")
    outs = [slam(f, i) for i, f in enumerate(_frames(rng, 4))]
    assert outs[0]["iskeyframe"]          # first frame always commits
    assert len(slam.all_poses) == 4
    for o in outs:
        assert np.isfinite(o["c2w"]).all()
        assert o["pts3d"].shape[-1] == 3
    # memory token count consistent with committed keyframes
    assert slam.committed_imgs == slam.num_mem_frames
    n_tok = slam._n_tokens
    assert slam.committed_len == slam.num_mem_frames * n_tok


def test_slam_rollback_keeps_memory_consistent(slam_params, rng):
    """With an impossible keyframe threshold, nothing after the first frame
    commits and memory stays at one image."""
    cfg = SlamConfig(res=32, num_init_frames=1, max_keyframes=16,
                     kf_x_subsamp=2, keyframe_overlap_thr=1e12,
                     min_conf_keyframe=1e9)
    slam = Must3rSLAM(slam_params, ENC_CFG, DEC_CFG, cfg,
                      dtype=jnp.float32, impl="chunked")
    for i, f in enumerate(_frames(rng, 3)):
        out = slam(f, i)
    assert slam.num_mem_frames == 1
    assert slam.committed_imgs == 1
    labels = np.asarray(slam.mem.labels[0])
    assert (labels[:slam._n_tokens] == 0).all()
    assert (labels[slam._n_tokens:] == -1).all()


def test_slam_trajectory_export(slam_params, rng, tmp_path):
    cfg = SlamConfig(res=32, num_init_frames=1, max_keyframes=8,
                     kf_x_subsamp=2)
    slam = Must3rSLAM(slam_params, ENC_CFG, DEC_CFG, cfg,
                      dtype=jnp.float32, impl="chunked")
    for i, f in enumerate(_frames(rng, 3)):
        slam(f, i)
    p = str(tmp_path / "traj.npz")
    slam.write_all_poses(p, filtering_mode="laplacian")
    data = np.load(p, allow_pickle=True)
    assert data["poses"].shape == (3, 4, 4)
    assert data["timestamps"].tolist() == [0, 1, 2]

    mp = str(tmp_path / "memory.pkl")
    slam.save_memory(mp)
    # session resume: load under a num_init_frames=2 config and PROCESS a
    # frame -- the re-initialization gate must not wipe the loaded map
    # (regression: all_images is empty after load, which used to look
    # like an unfinished init and reset() everything)
    cfg2 = SlamConfig(res=32, num_init_frames=2, max_keyframes=8,
                      kf_x_subsamp=2)
    slam2 = Must3rSLAM(slam_params, ENC_CFG, DEC_CFG, cfg2,
                       dtype=jnp.float32, impl="chunked")
    slam2.load_memory(mp)
    assert slam2.committed_imgs == slam.committed_imgs
    np.testing.assert_array_equal(np.asarray(slam2.mem.labels),
                                  np.asarray(slam.mem.labels))
    out = slam2(_frames(rng, 1)[0], 99, return_maps=False)
    assert np.isfinite(out["c2w"]).all()
    assert slam2.committed_imgs >= slam.committed_imgs  # map survived


def test_slam_multi_agent_focals(slam_params, rng):
    """Streams keep independent focal trackers but share one memory
    (reference MUSt3R_Agent per cam_id)."""
    cfg = SlamConfig(res=32, num_init_frames=1, max_keyframes=16,
                     kf_x_subsamp=2, keyframe_overlap_thr=0.05)
    slam = Must3rSLAM(slam_params, ENC_CFG, DEC_CFG, cfg,
                      dtype=jnp.float32, impl="chunked")
    frames = _frames(rng, 4)
    slam(frames[0], 0, cam_id=0)
    slam(frames[1], 1, cam_id=1)
    slam(frames[2], 2, cam_id=0)
    slam(frames[3], 3, cam_id=1)
    assert set(slam.agents.keys()) == {0, 1}
    assert len(slam.agents[0]["f"]) == 2
    assert len(slam.agents[1]["f"]) == 2
    focals = slam.get_true_focals()
    assert set(focals.keys()) == {0, 1}
    # shared memory accumulated frames from both streams
    assert len(slam.all_poses) == 4


def test_slam_get_map(slam_params, rng):
    cfg = SlamConfig(res=32, num_init_frames=1, max_keyframes=8,
                     kf_x_subsamp=1, keyframe_overlap_thr=0.0,
                     min_conf_keyframe=0.0, keep_memory=True)
    slam = Must3rSLAM(slam_params, ENC_CFG, DEC_CFG, cfg,
                      dtype=jnp.float32, impl="chunked")
    for i, f in enumerate(_frames(rng, 2)):
        slam(f, i)
    pts, cols = slam.get_map(conf_thr=0.0)
    assert pts.shape[1] == 3 and cols.shape[1] == 3
    assert len(pts) > 0


def test_video_long_sequence_compaction_parity(rng):
    """Scale soak (VERDICT r2 item 6, CI-sized): an 80-frame sequence
    whose capacity forces repeated compactions must produce the SAME
    pointmaps/keyframes as an uncompacted run -- compaction is
    transparent (engine/video.py:100-105 length-bound interplay)."""
    from must3r_tpu.config import DecoderConfig, EncoderConfig
    from must3r_tpu.engine import InferenceCore
    from must3r_tpu.engine.video import video_reconstruction
    from must3r_tpu.models import init_decoder, init_encoder

    hw = (64, 64)
    enc_cfg = EncoderConfig(img_size=hw, patch_size=16, embed_dim=32,
                            depth=1, num_heads=2)
    dec_cfg = DecoderConfig(img_size=hw, enc_embed_dim=32, patch_size=16,
                            embed_dim=32, output_dim=16 * 16 * 7, depth=2,
                            num_heads=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    core = InferenceCore(init_encoder(k1, enc_cfg),
                         init_decoder(k2, dec_cfg), enc_cfg, dec_cfg,
                         dtype=jnp.float32, impl="chunked")
    v = 80
    imgs = jnp.asarray(rng.standard_normal((v, *hw, 3)), jnp.float32)

    # tight capacity: 16 tokens/frame, ~27 keyframes + 25-frame window
    # live ~800 tokens vs capacity 1024 -> compacts every ~14 frames
    import must3r_tpu.engine.video as video_mod
    import must3r_tpu.memory as memory_mod

    compacts = []
    orig_compact = memory_mod.compact

    def counting_compact(mem):
        compacts.append(int(np.asarray(mem.length)))
        return orig_compact(mem)

    video_mod.compact = counting_compact
    try:
        tight = video_reconstruction(core, imgs, img_hw=hw,
                                     capacity_images=40,
                                     num_refinement_iterations=1,
                                     compute_cam=False)
    finally:
        video_mod.compact = orig_compact
    # the interesting regime: multiple mid-run compactions actually fired
    assert len(compacts) >= 3, compacts

    loose = video_reconstruction(core, imgs, img_hw=hw,
                                 capacity_images=300,
                                 num_refinement_iterations=1,
                                 compute_cam=False)
    assert tight["keyframes"] == loose["keyframes"]
    np.testing.assert_allclose(tight["pts3d"], loose["pts3d"],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(tight["conf"], loose["conf"],
                               rtol=2e-4, atol=2e-5)


def test_slam_speculative_pipelining_parity(slam_params, rng):
    """next_frame speculation (encode dispatched before the current frame's
    fetch) must not change ANY output: the encoder is memory- and
    decision-independent, so the pipelined run is bitwise-equivalent."""
    frames = _frames(rng, 5)
    outs = {}
    for spec in (False, True):
        cfg = SlamConfig(res=32, num_init_frames=2, max_keyframes=16,
                         kf_x_subsamp=2, keyframe_overlap_thr=0.05)
        slam = Must3rSLAM(slam_params, ENC_CFG, DEC_CFG, cfg,
                          dtype=jnp.float32, impl="chunked")
        res = []
        for i, f in enumerate(frames):
            nxt = frames[i + 1] if spec and i + 1 < len(frames) else None
            res.append(slam(f, i, return_maps=False,
                            next_frame=nxt,
                            next_frame_id=i + 1 if nxt is not None else None))
        outs[spec] = (res, list(slam.keyframes),
                      np.stack(slam.all_poses))
    assert outs[False][1] == outs[True][1]            # same keyframes
    np.testing.assert_allclose(outs[False][2], outs[True][2],
                               rtol=1e-6, atol=1e-6)  # same trajectory
    for a, b in zip(outs[False][0], outs[True][0]):
        assert a["iskeyframe"] == b["iskeyframe"]
        np.testing.assert_allclose(a["focal"], b["focal"], rtol=1e-6)


def test_slam_reinit_terminates_at_num_init_frames(slam_params, rng):
    """num_init_frames=2: the map re-initializes exactly once (at frame 1)
    and then GROWS -- the replayed init frames must stay in all_images
    (reference slam/model.py:491) or the engine re-inits on every frame
    and committed memory never exceeds the init pair."""
    cfg = SlamConfig(res=32, num_init_frames=2, max_keyframes=16,
                     kf_x_subsamp=2, keyframe_overlap_thr=-1.0,
                     min_conf_keyframe=0.0)   # force-accept every frame
    slam = Must3rSLAM(slam_params, ENC_CFG, DEC_CFG, cfg,
                      dtype=jnp.float32, impl="chunked")
    for i, f in enumerate(_frames(rng, 5)):
        slam(f, i, return_maps=False)
    # frames 0..4 all keyframes; the reset at frame 1 rebuilds [0, 1]
    assert slam.keyframes == [0, 1, 2, 3, 4]
    assert slam.committed_imgs == 5
    # init list stopped growing at num_init_frames (rerender off)
    assert len(slam.all_images) == 2
    # one pose per PRESENTED frame survives the re-init replay
    assert len(slam.all_poses) == 5
    assert slam.all_timestamps == [0, 1, 2, 3, 4]


def test_slam_capacity_gate_freezes_map(slam_params, rng):
    """When the keyframe memory is full, further frames are tracked
    against the frozen map (read-only render): no keyframe commits, no
    append past the buffer end (which would clamp and overwrite the last
    keyframe's tokens), and the committed map stays byte-identical."""
    import must3r_tpu.slam.model as slam_mod

    # res=32 -> 4 tokens/frame; capacity normally rounds up to 1024
    # tokens, which 40 tiny frames never fill -- pin the rounding so the
    # gate actually engages in CI
    cfg = SlamConfig(res=32, num_init_frames=1, max_keyframes=6,
                     kf_x_subsamp=2, keyframe_overlap_thr=-1.0,
                     min_conf_keyframe=0.0)   # force-accept until full
    orig_round = slam_mod.round_capacity
    slam_mod.round_capacity = lambda n, block=1024: n
    try:
        slam = Must3rSLAM(slam_params, ENC_CFG, DEC_CFG, cfg,
                          dtype=jnp.float32, impl="chunked")
        frames = _frames(rng, 40)
        outs = [slam(f, i, return_maps=False)
                for i, f in enumerate(frames)]
    finally:
        slam_mod.round_capacity = orig_round

    n_fit = slam._cap // slam._n_tokens
    assert len(slam.keyframes) == n_fit          # grew exactly to capacity
    assert slam.committed_imgs == n_fit
    assert int(np.asarray(slam.mem.length)) == slam.committed_len
    assert slam.committed_len <= slam._cap
    kv_at_full = np.asarray(slam.mem.kv)

    # all post-capacity frames: tracked, not keyframed, memory untouched
    for o in outs[n_fit:]:
        assert not o["iskeyframe"]
        assert np.isfinite(o["c2w"]).all()
    np.testing.assert_array_equal(np.asarray(slam.mem.kv), kv_at_full)
    assert len(slam.all_poses) == len(frames)


def test_slam_capacity_gate_with_quantized_cache(slam_params, rng):
    """Capacity-full frozen-map tracking over an int8-quantized memory:
    the read-only render must dequantize and stay finite, and the
    quantized buffers must stay byte-identical past capacity."""
    import must3r_tpu.slam.model as slam_mod

    cfg = SlamConfig(res=32, num_init_frames=1, max_keyframes=4,
                     kf_x_subsamp=2, keyframe_overlap_thr=-1.0,
                     min_conf_keyframe=0.0, kv_quant="int8")
    orig_round = slam_mod.round_capacity
    slam_mod.round_capacity = lambda n, block=1024: n
    try:
        slam = Must3rSLAM(slam_params, ENC_CFG, DEC_CFG, cfg,
                          dtype=jnp.float32, impl="chunked")
        outs = [slam(f, i, return_maps=False)
                for i, f in enumerate(_frames(rng, 10))]
    finally:
        slam_mod.round_capacity = orig_round

    n_fit = slam._cap // slam._n_tokens
    assert len(slam.keyframes) == n_fit
    kv_at_full = np.asarray(slam.mem.kv)
    assert kv_at_full.dtype == np.int8
    for o in outs[n_fit:]:
        assert not o["iskeyframe"]
        assert np.isfinite(o["c2w"]).all()
        assert np.isfinite(o["conf_median"])
    np.testing.assert_array_equal(np.asarray(slam.mem.kv), kv_at_full)
