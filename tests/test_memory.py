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


def test_memory_ops_random_composition_vs_model(rng):
    """Model-based test: a random sequence of append/evict/relabel/
    refresh/compact must keep the MemoryState's live (label, token) list
    identical to a plain-python reference model (slot order == append
    order of survivors; compact is stable)."""
    import jax.numpy as jnp

    from must3r_tpu.memory import (append_tokens, compact, evict_label,
                                   init_memory, refresh_label_from_segment,
                                   relabel)

    L, H, Dh, CAP = 2, 1, 4, 64
    mem = init_memory(L, 1, H, Dh, CAP, dtype=jnp.float32)
    model = []            # ordered list of [label, value]
    next_label = 0
    next_value = 1.0

    def live_from_mem(m):
        lab = np.asarray(m.labels[0])
        n = int(np.asarray(m.length))
        kv = np.asarray(m.kv)            # [L, 1, H, S, 2Dh]
        out = []
        for p in range(n):
            if lab[p] >= 0:
                vals = kv[:, 0, :, p, :]
                assert (vals == vals.flat[0]).all()   # constant fill
                out.append([int(lab[p]), float(vals.flat[0])])
        return out

    def model_len():
        return len(model)

    for step in range(60):
        op = rng.integers(0, 5)
        labels_live = sorted({lab for lab, _ in model})
        if op == 0 or not labels_live:                     # append 1-2 toks
            t = int(rng.integers(1, 3))
            if model_len() + t > CAP - 8:
                mem = compact(mem)
                # compact drops nothing live; model unchanged
            new_kv = np.stack([np.full((1, H, t, 2 * Dh),
                                       next_value + j, np.float32)
                               for j in range(L)]).reshape(L, 1, H, t,
                                                           2 * Dh)
            # distinct constant PER TOKEN, shared across layers
            for j in range(t):
                new_kv[:, :, :, j, :] = next_value + j
            lab = np.full((1, t), next_label, np.int32)
            mem = append_tokens(mem, jnp.asarray(new_kv), jnp.asarray(lab))
            for j in range(t):
                model.append([next_label, next_value + j])
            next_label += 1
            next_value += t
        elif op == 1:                                      # evict
            target = int(rng.choice(labels_live))
            mem = evict_label(mem, target)
            model = [e for e in model if e[0] != target]
        elif op == 2:                                      # relabel
            target = int(rng.choice(labels_live))
            mem = relabel(mem, target, next_label)
            for e in model:
                if e[0] == target:
                    e[0] = next_label
            next_label += 1
        elif op == 3:                                      # compact
            mem = compact(mem)
        else:                                              # refresh in place
            target = int(rng.choice(labels_live))
            cnt = sum(1 for e in model if e[0] == target)
            seg0 = int(np.asarray(mem.length))
            if seg0 + cnt > CAP:
                mem = compact(mem)
                seg0 = int(np.asarray(mem.length))
            new_kv = np.empty((L, 1, H, cnt, 2 * Dh), np.float32)
            for j in range(cnt):
                new_kv[:, :, :, j, :] = next_value + j
            tmp = np.full((1, cnt), next_label, np.int32)
            mem = append_tokens(mem, jnp.asarray(new_kv), jnp.asarray(tmp))
            mem = refresh_label_from_segment(mem, target, seg0, cnt)
            mem = evict_label(mem, next_label)
            k = 0
            for e in model:
                if e[0] == target:
                    e[1] = next_value + k
                    k += 1
            next_label += 1
            next_value += cnt

        got = live_from_mem(mem)
        assert got == model, f"step {step} op {op}: {got} != {model}"
