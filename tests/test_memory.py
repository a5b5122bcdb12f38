"""Direct unit tests for the MemoryState edit ops (masked static-shape
equivalents of the reference's concat/boolean-index memory edits)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from must3r_tpu.memory import (
    MemoryState,
    append_tokens,
    commit_images,
    compact,
    evict_label,
    init_memory,
    refresh_label_from_segment,
    relabel,
    round_capacity,
    set_n_imgs,
    truncate,
)

L, B, H, DH, CAP = 2, 1, 2, 8, 32


def _mem():
    return init_memory(L, B, H, DH, CAP, dtype=jnp.float32)


def _tok(rng, t, fill=None):
    kv = rng.standard_normal((L, B, H, t, 2 * DH)).astype(np.float32)
    if fill is not None:
        kv[:] = fill
    return jnp.asarray(kv)


def test_append_and_counters(rng):
    mem = _mem()
    kv = _tok(rng, 8)
    labels = jnp.zeros((B, 8), jnp.int32)
    mem = append_tokens(mem, kv, labels)
    assert int(mem.length) == 8
    np.testing.assert_array_equal(np.asarray(mem.labels[0, :8]), 0)
    assert (np.asarray(mem.labels[0, 8:]) == -1).all()
    np.testing.assert_allclose(np.asarray(mem.kv[:, :, :, :8]),
                               np.asarray(kv))
    mem = commit_images(mem, 1, tokens_per_img=8)
    assert int(mem.n_imgs) == 1
    assert int(mem.protected_tokens) == 8     # inference: all protected


def test_evict_relabel_roundtrip(rng):
    mem = _mem()
    mem = append_tokens(mem, _tok(rng, 4), jnp.zeros((B, 4), jnp.int32))
    mem = append_tokens(mem, _tok(rng, 4), jnp.ones((B, 4), jnp.int32))
    mem = evict_label(mem, 0)
    lab = np.asarray(mem.labels[0])
    assert (lab[:4] == -1).all() and (lab[4:8] == 1).all()
    mem = relabel(mem, 1, 7)
    assert (np.asarray(mem.labels[0, 4:8]) == 7).all()


def test_compact_packs_live_tokens(rng):
    mem = _mem()
    kv0 = _tok(rng, 4, fill=1.0)
    kv1 = _tok(rng, 4, fill=2.0)
    kv2 = _tok(rng, 4, fill=3.0)
    mem = append_tokens(mem, kv0, jnp.full((B, 4), 0, jnp.int32))
    mem = append_tokens(mem, kv1, jnp.full((B, 4), 1, jnp.int32))
    mem = append_tokens(mem, kv2, jnp.full((B, 4), 2, jnp.int32))
    mem = evict_label(mem, 1)
    mem = compact(mem)
    assert int(mem.length) == 8
    lab = np.asarray(mem.labels[0])
    np.testing.assert_array_equal(lab[:8], [0] * 4 + [2] * 4)
    assert (lab[8:] == -1).all()
    # values moved with their labels, order preserved
    np.testing.assert_allclose(np.asarray(mem.kv[0, 0, 0, :4, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(mem.kv[0, 0, 0, 4:8, 0]), 3.0)


def test_truncate_rollback(rng):
    mem = _mem()
    mem = append_tokens(mem, _tok(rng, 4), jnp.zeros((B, 4), jnp.int32))
    mem = commit_images(mem, 1, 4)
    mem = append_tokens(mem, _tok(rng, 4), jnp.ones((B, 4), jnp.int32))
    mem = commit_images(mem, 1, 4)
    mem = truncate(mem, 4, n_imgs=1)
    assert int(mem.length) == 4
    assert int(mem.n_imgs) == 1
    assert (np.asarray(mem.labels[0, 4:]) == -1).all()
    assert int(mem.protected_tokens) == 4


def test_refresh_label_from_segment(rng):
    mem = _mem()
    mem = append_tokens(mem, _tok(rng, 4, fill=1.0),
                        jnp.full((B, 4), 0, jnp.int32))
    mem = append_tokens(mem, _tok(rng, 4, fill=2.0),
                        jnp.full((B, 4), 1, jnp.int32))
    mem = append_tokens(mem, _tok(rng, 4, fill=9.0),
                        jnp.full((B, 4), 2, jnp.int32))
    # refresh label 1 from the segment at [8, 12)
    out = refresh_label_from_segment(mem, 1, 8, 4)
    np.testing.assert_allclose(np.asarray(out.kv[0, 0, 0, 4:8, 0]), 9.0)
    # label 0 (ref image) is never updated
    out0 = refresh_label_from_segment(mem, 0, 8, 4)
    np.testing.assert_allclose(np.asarray(out0.kv[0, 0, 0, :4, 0]), 1.0)


def test_set_n_imgs():
    mem = _mem()
    mem = set_n_imgs(mem, 5)
    assert int(mem.n_imgs) == 5


def test_round_capacity():
    assert round_capacity(1) == 1024
    assert round_capacity(1024) == 1024
    assert round_capacity(1025) == 2048
    assert round_capacity(100, 16) == 112


def test_label_ops_batched_divergent_offsets(rng):
    """B=2 where image 5's contiguous run sits at a DIFFERENT offset per
    batch element (possible after per-element eviction histories): the
    label ops must locate and edit each element's own segment."""
    from must3r_tpu.memory import update_label_tokens

    b = 2
    mem = init_memory(L, b, H, DH, CAP, dtype=jnp.float32)
    kv = np.zeros((L, b, H, CAP, 2 * DH), np.float32)
    labels = np.full((b, CAP), -1, np.int32)
    # element 0: label 5 at [0, 4); element 1: label 5 at [4, 8)
    labels[0, 0:4] = 5
    labels[0, 4:8] = 1
    labels[1, 0:4] = 1
    labels[1, 4:8] = 5
    kv[:, 0, :, 0:8] = 1.0
    kv[:, 1, :, 0:8] = 1.0
    mem = MemoryState(kv=jnp.asarray(kv), labels=jnp.asarray(labels),
                      length=jnp.int32(8), n_imgs=jnp.int32(2),
                      protected_imgs=jnp.int32(0),
                      protected_tokens=jnp.int32(0))

    new = jnp.full((L, b, H, 4, 2 * DH), 9.0, jnp.float32)
    out = update_label_tokens(mem, 5, new, None)
    got = np.asarray(out.kv[0, :, 0, :, 0])
    np.testing.assert_allclose(got[0, 0:4], 9.0)   # elem 0 segment
    np.testing.assert_allclose(got[0, 4:8], 1.0)   # elem 0 other image
    np.testing.assert_allclose(got[1, 0:4], 1.0)   # elem 1 other image
    np.testing.assert_allclose(got[1, 4:8], 9.0)   # elem 1 segment

    # missing label: no-op on every element
    out2 = update_label_tokens(mem, 77, new, None)
    np.testing.assert_allclose(np.asarray(out2.kv), np.asarray(mem.kv))


def test_compact_batched_divergent_holes(rng):
    """compact() packs each batch element independently."""
    b = 2
    mem = init_memory(L, b, H, DH, CAP, dtype=jnp.float32)
    kv = np.zeros((L, b, H, CAP, 2 * DH), np.float32)
    labels = np.full((b, CAP), -1, np.int32)
    # element 0: hole at [0, 4); element 1: hole at [4, 8)
    labels[0, 4:8] = 2
    kv[:, 0, :, 4:8] = 3.0
    labels[1, 0:4] = 2
    kv[:, 1, :, 0:4] = 3.0
    labels[1, 8:12] = 4
    kv[:, 1, :, 8:12] = 5.0
    mem = MemoryState(kv=jnp.asarray(kv), labels=jnp.asarray(labels),
                      length=jnp.int32(12), n_imgs=jnp.int32(3),
                      protected_imgs=jnp.int32(0),
                      protected_tokens=jnp.int32(0))
    out = compact(mem)
    assert int(out.length) == 8        # max live count over the batch
    lab = np.asarray(out.labels)
    np.testing.assert_array_equal(lab[0, :4], 2)
    assert (lab[0, 4:] == -1).all()
    np.testing.assert_array_equal(lab[1, :4], 2)
    np.testing.assert_array_equal(lab[1, 4:8], 4)
    np.testing.assert_allclose(np.asarray(out.kv[0, 0, 0, :4, 0]), 3.0)
    np.testing.assert_allclose(np.asarray(out.kv[0, 1, 0, 4:8, 0]), 5.0)
