"""Fused-page decode kernel vs oracle (bf16 and int8-with-packed-scales)."""

import jax
import jax.numpy as jnp
import numpy as np

from tiny_flash_attention_tpu.ops import reference as R
from tiny_flash_attention_tpu.ops.paged_fused import (
    fused_paged_decode_attention, pack_paged_cache, quantize_kv_page_int8,
    _pack_scale_rows)
from tiny_flash_attention_tpu.utils import assert_close

from tests.test_paged import build_paged_cache, oracle_decode


def test_scale_row_packing_roundtrip():
    s = jnp.arange(128, dtype=jnp.float32) * 0.37 + 0.01
    packed = _pack_scale_rows(s, 128)  # (4, 128) int8
    unpacked = jax.lax.bitcast_convert_type(
        jnp.swapaxes(packed, -1, -2), jnp.float32)
    assert np.allclose(np.asarray(unpacked), np.asarray(s))


def test_scale_row_packing_roundtrip_general_geometry():
    """ps < d pads lanes; ps a multiple of d uses one 4-row group per d
    tokens — byte j of token i at [4*(i//d) + j, i % d]."""
    for ps, d in [(64, 128), (256, 128)]:
        s = jnp.arange(ps, dtype=jnp.float32) * 0.11 + 0.5
        packed = _pack_scale_rows(s, d)
        assert packed.shape == (4 * max(1, ps // d), d)
        got = np.zeros(ps, np.float32)
        pb = np.asarray(packed).astype(np.int8)
        for i in range(ps):
            raw = bytes(int(pb[4 * (i // d) + j, i % d]) & 0xFF
                        for j in range(4))
            got[i] = np.frombuffer(raw, np.float32)[0]
        assert np.allclose(got, np.asarray(s))


def test_fused_bf16_decode():
    batch, hkv, hq, d, pps = 2, 2, 8, 128, 4
    lengths = [300, 512]
    k_full, v_full, k_pages, v_pages, page_indices = build_paged_cache(
        jax.random.key(0), batch, hkv, lengths, d, pps, dtype=jnp.bfloat16,
        page=128)
    fused = pack_paged_cache(k_pages, v_pages, "bf16")
    q = jax.random.normal(jax.random.key(1), (batch, hq, d), jnp.bfloat16)
    out, lse = fused_paged_decode_attention(
        q, fused, jnp.asarray(lengths, jnp.int32), page_indices,
        page_size=128, pages_per_block=2)
    k_rep = jnp.repeat(k_full, hq // hkv, axis=1).astype(jnp.float32)
    v_rep = jnp.repeat(v_full, hq // hkv, axis=1).astype(jnp.float32)
    want = oracle_decode(q.astype(jnp.float32), k_rep, v_rep, lengths)
    assert_close(out, want, atol=2e-2)
    assert not bool(jnp.isnan(lse).any())


def test_fused_int8_decode():
    batch, hkv, hq, d, pps = 2, 2, 8, 128, 4
    lengths = [290, 512]
    k_full, v_full, k_pages, v_pages, page_indices = build_paged_cache(
        jax.random.key(2), batch, hkv, lengths, d, pps, page=128)
    fused = pack_paged_cache(k_pages, v_pages, "int8")
    assert fused.shape == (hkv, k_pages.shape[1], 2 * 128 + 8, d)
    q = jax.random.normal(jax.random.key(3), (batch, hq, d), jnp.float32)
    out, _ = fused_paged_decode_attention(
        q, fused, jnp.asarray(lengths, jnp.int32), page_indices,
        page_size=128, pages_per_block=2)
    # kernel-exact oracle: dequantize each page identically to the packer
    kq = jax.vmap(jax.vmap(lambda kp, vp: quantize_kv_page_int8(kp, vp)))(
        k_pages, v_pages)
    ps = 128
    kvals = kq[:, :, :ps].astype(jnp.float32)
    vvals = kq[:, :, ps:2 * ps].astype(jnp.float32)
    kscale = jax.lax.bitcast_convert_type(
        jnp.swapaxes(kq[:, :, 2 * ps:2 * ps + 4], -1, -2), jnp.float32)
    vscale = jax.lax.bitcast_convert_type(
        jnp.swapaxes(kq[:, :, 2 * ps + 4:2 * ps + 8], -1, -2), jnp.float32)
    kd = kvals * kscale[..., None]
    vd = vvals * vscale[..., None]
    k_gather = jnp.stack([
        jnp.concatenate([kd[:, page_indices[b, pi]] for pi in range(pps)],
                        axis=1) for b in range(batch)])
    v_gather = jnp.stack([
        jnp.concatenate([vd[:, page_indices[b, pi]] for pi in range(pps)],
                        axis=1) for b in range(batch)])
    k_rep = jnp.repeat(k_gather, hq // hkv, axis=1)
    v_rep = jnp.repeat(v_gather, hq // hkv, axis=1)
    want = oracle_decode(q, k_rep, v_rep, lengths)
    assert_close(out, want, atol=1e-4, name="fused int8 kernel-exact")


def test_fused_decode_window():
    """Windowed decode matches full decode restricted to the last W tokens
    (blocks before the window are skipped entirely)."""
    rng = np.random.default_rng(5)
    batch, hkv, hq, d, page, pps = 3, 2, 4, 128, 128, 8
    num_pages = batch * pps + 3
    k_pages = jnp.asarray(rng.standard_normal(
        (hkv, num_pages, page, d)), jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal(
        (hkv, num_pages, page, d)), jnp.float32)
    page_indices = jnp.asarray(
        rng.permutation(num_pages)[:batch * pps].reshape(batch, pps)
        .astype(np.int32))
    lengths = jnp.asarray([1000, 555, 257], jnp.int32)
    q = jnp.asarray(rng.standard_normal((batch, hq, d)), jnp.float32)
    fused = pack_paged_cache(k_pages, v_pages, "bf16")
    W = 200

    got, _ = fused_paged_decode_attention(
        q.astype(jnp.bfloat16), fused, lengths, page_indices,
        page_size=page, pages_per_block=2, window=W)

    # oracle: gather each sequence's last-W window and attend densely
    for b in range(batch):
        L = int(lengths[b])
        rows = []
        for pos in range(max(0, L - W), L):
            pid = int(page_indices[b, pos // page])
            rows.append((pid, pos % page))
        kk = jnp.stack([k_pages[:, p, r] for p, r in rows], axis=1)
        vv = jnp.stack([v_pages[:, p, r] for p, r in rows], axis=1)
        kk = jnp.repeat(kk, hq // hkv, axis=0)
        vv = jnp.repeat(vv, hq // hkv, axis=0)
        s = jnp.einsum("hd,hkd->hk", q[b], kk) / np.sqrt(d)
        p_ = jax.nn.softmax(s, axis=-1)
        want = jnp.einsum("hk,hkd->hd", p_, vv)
        np.testing.assert_allclose(
            np.asarray(got[b], np.float32), np.asarray(want), rtol=0,
            atol=2e-2)


def test_fused_int8_decode_general_page_geometry():
    """The widened int8 page format (VERDICT r2 item 9): page_size below
    head_dim (64-token pages x d=128) and a multiple of it (256 x 128)
    decode correctly against the dequantized-cache oracle."""
    import pytest

    for ps in (64, 256):
        batch, hkv, hq, d, pps = 2, 2, 4, 128, 4
        lengths = [ps + 7, 2 * ps]
        k_full, v_full, k_pages, v_pages, page_indices = build_paged_cache(
            jax.random.key(11), batch, hkv, lengths, d, pps, page=ps)
        fused = pack_paged_cache(k_pages, v_pages, "int8")
        sr = 4 * max(1, ps // d)
        assert fused.shape[2] == 2 * ps + 2 * sr
        q = jax.random.normal(jax.random.key(12), (batch, hq, d),
                              jnp.float32)
        out, _ = fused_paged_decode_attention(
            q, fused, jnp.asarray(lengths, jnp.int32), page_indices,
            page_size=ps, pages_per_block=2)
        # oracle on the dequantized pages (per-token int8 noise folded in)
        kq = jax.vmap(jax.vmap(quantize_kv_page_int8))(k_pages, v_pages)
        kvals = kq[:, :, :ps].astype(jnp.float32)
        vvals = kq[:, :, ps:2 * ps].astype(jnp.float32)

        def unpack(rows_):   # (hkv, np, sr, d) -> (hkv, np, ps)
            gs = [jax.lax.bitcast_convert_type(
                jnp.swapaxes(rows_[:, :, 4 * g:4 * (g + 1)], -1, -2),
                jnp.float32) for g in range(sr // 4)]
            sc = gs[0] if len(gs) == 1 else jnp.concatenate(gs, axis=2)
            return sc[:, :, :ps]

        kd = kvals * unpack(kq[:, :, 2 * ps:2 * ps + sr])[..., None]
        vd = vvals * unpack(kq[:, :, 2 * ps + sr:2 * ps + 2 * sr])[..., None]
        k_gather = jnp.stack([
            jnp.concatenate([kd[:, page_indices[b, pi]]
                             for pi in range(pps)], axis=1)
            for b in range(batch)])
        v_gather = jnp.stack([
            jnp.concatenate([vd[:, page_indices[b, pi]]
                             for pi in range(pps)], axis=1)
            for b in range(batch)])
        k_rep = jnp.repeat(k_gather, hq // hkv, axis=1)
        v_rep = jnp.repeat(v_gather, hq // hkv, axis=1)
        want = oracle_decode(q, k_rep, v_rep, lengths)
        assert_close(out, want, atol=1e-4, name=f"fused int8 ps={ps}")

    # the one rejected geometry: ps > d with ps % d != 0
    with pytest.raises(AssertionError):
        from tiny_flash_attention_tpu.ops.paged_fused import (
            scale_rows_per_side)
        scale_rows_per_side(192, 128)


def test_engine_int8_small_pages():
    """End-to-end engine decode with 64-token int8 pages x d=128 (the
    config the old format rejected) matches the bf16-page engine's greedy
    tokens."""
    from tests.test_model import CFG, make_params
    from tiny_flash_attention_tpu.models.engine import (
        InferenceEngine, Request)

    params = make_params()
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(0, 256, size=n)) for n in (9, 70)]

    def run(fmt):
        eng = InferenceEngine(CFG, params, num_pages=64, page_size=64,
                              max_seqs=2, pages_per_seq=8, kv_format=fmt)
        reqs = [Request(p, max_new_tokens=5) for p in prompts]
        eng.add_requests(reqs)
        eng.steps(4)
        return [eng.requests[r.slot].generated for r in reqs]

    # int8 KV noise may flip a greedy token in principle; in this tiny
    # model it does not — exact match doubles as a packing regression test
    assert run("int8") == run("bf16")


def test_fused_page_append_matches_scatter():
    """The Pallas in-place append (DMA per row/scale-group) lands tokens
    bit-identically to the XLA scatter decomposition, across bf16 and the
    int8 geometries (ps == d, ps < d, ps a multiple of d)."""
    from tiny_flash_attention_tpu.ops.paged_fused import (
        fused_page_append, scale_rows_per_side)
    from tiny_flash_attention_tpu.models.inference import _append_rows_scatter

    B, hkv, npages = 3, 2, 8
    for fmt, ps, d in [("bf16", 128, 128), ("int8", 128, 128),
                       ("int8", 64, 128), ("int8", 256, 128)]:
        prows = 2 * ps + (2 * scale_rows_per_side(ps, d)
                          if fmt == "int8" else 0)
        dtype = jnp.int8 if fmt == "int8" else jnp.bfloat16
        key = jax.random.key(ps + (0 if fmt == "bf16" else 1))
        k1, k2, k3 = jax.random.split(key, 3)
        pages = jax.random.randint(
            k1, (hkv, npages, prows, d), -5, 5).astype(dtype)
        k_new = jax.random.normal(k2, (B, hkv, d), jnp.float32)
        v_new = jax.random.normal(k3, (B, hkv, d), jnp.float32)
        page_ids = jnp.asarray([0, 3, 7], jnp.int32)
        rows = jnp.asarray([0, ps // 2, ps - 1], jnp.int32)

        got = np.asarray(fused_page_append(pages, k_new, v_new, page_ids,
                                           rows, page_size=ps))
        want = np.asarray(_append_rows_scatter(pages, k_new, v_new, page_ids,
                                               rows, page_size=ps, fmt=fmt))
        if fmt == "bf16":
            np.testing.assert_array_equal(got, want)
            continue
        # int8: payload rows bit-exact; scale bytes may differ by 1 ulp of
        # the f32 scale (the two paths' amax/127 lower through different
        # XLA fusions), so compare the scales DECODED, not byte-wise
        np.testing.assert_array_equal(got[:, :, :2 * ps], want[:, :, :2 * ps])
        def dec(x):
            b = jnp.swapaxes(jnp.asarray(x[:, :, 2 * ps:]), -1, -2)
            b = b.reshape(*b.shape[:-1], b.shape[-1] // 4, 4)
            return jax.lax.bitcast_convert_type(b, jnp.float32)
        sc_got, sc_want = dec(got), dec(want)
        np.testing.assert_allclose(np.asarray(sc_got), np.asarray(sc_want),
                                   rtol=1e-6), (fmt, ps)
