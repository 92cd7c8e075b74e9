"""Paged KV-cache manager: host-side page allocator + jitted device writes.

Design (mirrors production paged-attention systems, re-shaped for TPU):
  * pages are stored per layer as fused-format arrays (see ops/paged_fused:
    one DMA fetches K+V payload and packed scales) — a list of per-layer
    arrays, NOT one stacked array, so the decode loop never dynamic-slices
    (= copies) a whole cache layer
  * the allocator (free list, slot assignment) runs on the HOST — admission
    control is host-side in serving systems anyway; only the hot paths
    (prefill write, per-step token append) are jitted
  * int8 pages quantize on write with per-token scales, bit-packed into the
    page's scale rows exactly as ops/paged_fused.pack expects

The reference's only persistent artifact is the LSE tensor (SURVEY.md sec. 5
checkpoint row); "KV-cache save/restore counts as the inference analog" —
this module is that subsystem.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tiny_flash_attention_tpu.ops.quant import INT8_MAX


@dataclasses.dataclass
class PagedKVCache:
    """Mutable host-side view of the paged cache. Device arrays inside are
    replaced functionally by the jitted helpers; the wrapper mutates its own
    references (host orchestration layer, not traced)."""
    pages: List[jax.Array]          # per layer: (hkv, num_pages, rows, d)
    page_table: np.ndarray          # (max_seqs, pages_per_seq) int32, host
    lengths: np.ndarray             # (max_seqs,) int32, host
    free_pages: list                # host free list of page ids
    page_size: int
    fmt: str                        # "bf16" | "int8"
    alloc_counts: np.ndarray = None  # (max_seqs,) pages held per slot
    # Data-parallel serving partitions BOTH slots and pages into n_groups
    # contiguous blocks (group g owns slots [g*S/n, (g+1)*S/n) and page ids
    # [g*P/n, (g+1)*P/n)): each data-parallel device group holds only its
    # own page-pool shard, so a slot's pages must co-locate with it. 1 =
    # the ordinary global pool.
    n_groups: int = 1

    # --- construction ---------------------------------------------------

    @classmethod
    def create(cls, *, n_layers: int, n_kv_heads: int, num_pages: int,
               page_size: int, d_head: int, max_seqs: int,
               pages_per_seq: int, fmt: str = "bf16",
               dtype=jnp.bfloat16, n_groups: int = 1) -> "PagedKVCache":
        if fmt == "int8":
            from tiny_flash_attention_tpu.ops.paged_fused import (
                scale_rows_per_side)
            rows = 2 * page_size + 2 * scale_rows_per_side(page_size,
                                                           d_head)
            pdtype = jnp.int8
        else:
            rows, pdtype = 2 * page_size, dtype
        assert num_pages % n_groups == 0 and max_seqs % n_groups == 0, (
            num_pages, max_seqs, n_groups)
        pages = [jnp.zeros((n_kv_heads, num_pages, rows, d_head), pdtype)
                 for _ in range(n_layers)]
        return cls(
            pages=pages,
            page_table=np.zeros((max_seqs, pages_per_seq), np.int32),
            lengths=np.zeros((max_seqs,), np.int32),
            free_pages=list(range(num_pages - 1, -1, -1)),
            page_size=page_size,
            fmt=fmt,
            alloc_counts=np.zeros((max_seqs,), np.int32),
            n_groups=n_groups,
        )

    @property
    def max_seqs(self) -> int:
        return self.page_table.shape[0]

    @property
    def pages_per_seq(self) -> int:
        return self.page_table.shape[1]

    # --- host-side allocator ---------------------------------------------

    def group_of_slot(self, slot: int) -> int:
        return slot // (self.max_seqs // self.n_groups)

    def _group_free(self, group: int) -> List[int]:
        """Indices into free_pages of ids belonging to `group`'s range."""
        if self.n_groups == 1:
            return list(range(len(self.free_pages)))
        per = self.pages[0].shape[1] // self.n_groups
        lo, hi = group * per, (group + 1) * per
        return [i for i, p in enumerate(self.free_pages) if lo <= p < hi]

    def _pop_page(self, group: int) -> int:
        if self.n_groups == 1:
            assert self.free_pages, "cache out of pages"
            return self.free_pages.pop()
        idx = self._group_free(group)
        assert idx, f"cache out of pages in data group {group}"
        return self.free_pages.pop(idx[-1])

    def alloc_slot(self, n_tokens_upper_bound: int) -> int:
        """Reserves a free sequence slot + enough pages for the bound.

        The slot is marked reserved immediately (lengths = -1, overwritten
        by the first real write) so several allocations in a row — batched
        admission — get distinct slots. With n_groups > 1, picks the first
        free slot whose data group still has enough pages (slots and pages
        co-locate per group).
        """
        free_slots = np.where(self.lengths == 0)[0]
        assert free_slots.size, "no free sequence slots"
        n_pages = -(-n_tokens_upper_bound // self.page_size)
        assert n_pages <= self.pages_per_seq, (n_pages, self.pages_per_seq)
        slot = None
        for cand in free_slots:
            if len(self._group_free(self.group_of_slot(int(cand)))) \
                    >= n_pages:
                slot = int(cand)
                break
        assert slot is not None, "cache out of pages (in every data group)"
        g = self.group_of_slot(slot)
        for i in range(n_pages):
            self.page_table[slot, i] = self._pop_page(g)
        self.alloc_counts[slot] = n_pages
        self.lengths[slot] = -1   # reserved; any real length overwrites
        return slot

    def grow_slot(self, slot: int, n_tokens: int) -> None:
        """Ensures the slot holds pages covering n_tokens (tracked via
        alloc_counts — page id 0 is a valid id)."""
        need = -(-n_tokens // self.page_size)
        cur = int(self.alloc_counts[slot])
        g = self.group_of_slot(slot)
        for i in range(cur, need):
            self.page_table[slot, i] = self._pop_page(g)
            self.alloc_counts[slot] += 1

    def free_slot(self, slot: int) -> None:
        # free what was ALLOCATED, not what the length implies: windowed
        # (ring) slots reserve the full table width regardless of length,
        # and lengths may exceed capacity after wrapping
        n_pages = int(self.alloc_counts[slot])
        for i in range(n_pages):
            self.free_pages.append(int(self.page_table[slot, i]))
            self.page_table[slot, i] = 0
        self.alloc_counts[slot] = 0
        self.lengths[slot] = 0

    # --- jitted device writes ---------------------------------------------

    def write_prefill(self, slot: int, k_layers: jax.Array,
                      v_layers: jax.Array) -> None:
        """Writes a prompt's KV into the slot's pages.

        k_layers, v_layers: (n_layers, hkv, L, d); L padded to page_size
        multiples by the caller (garbage rows beyond the true length are
        fine — lengths masking hides them).
        """
        L = k_layers.shape[2]
        assert L % self.page_size == 0, L
        n_pages = L // self.page_size
        page_ids = jnp.asarray(self.page_table[slot, :n_pages])
        for li in range(len(self.pages)):
            self.pages[li] = _write_prefill_layer(
                self.pages[li], k_layers[li], v_layers[li], page_ids,
                page_size=self.page_size, fmt=self.fmt)

    def append_tokens(self, slots: np.ndarray, k_new: jax.Array,
                      v_new: jax.Array) -> None:
        """Appends one token per active slot (the decode-step write).

        slots: (B,) host ints; k_new/v_new: (n_layers, hkv, B, d). Uses the
        CURRENT lengths as write positions (a freshly reserved slot's -1
        counts as 0), then advances them.
        """
        pos_host = np.maximum(self.lengths[slots], 0)
        positions = jnp.asarray(pos_host, jnp.int32)
        # logical page wraps modulo the table width: with a sliding window
        # the table is a RING over a fixed page set (identity when the
        # sequence fits the table, i.e. all non-windowed configs)
        pages = jnp.asarray(self.page_table[
            slots, (pos_host // self.page_size) % self.pages_per_seq])
        rows = positions % self.page_size
        for li in range(len(self.pages)):
            self.pages[li] = _append_layer(
                self.pages[li], k_new[li], v_new[li], pages, rows,
                page_size=self.page_size, fmt=self.fmt)
        self.lengths[slots] = pos_host + 1

    def device_views(self):
        """(page_table, lengths) as device arrays for the decode kernel."""
        return jnp.asarray(self.page_table), jnp.asarray(self.lengths)

    # --- checkpoint / resume ----------------------------------------------
    # The reference persists nothing but the LSE (SURVEY.md section 5); the
    # inference analog of checkpoint/resume is saving the whole serving
    # state — pages, page table, lengths, allocator — so in-flight
    # sequences survive a process restart.

    def save(self, path: str) -> None:
        """Serializes the full cache state to an .npz file.

        Page payloads are stored as uint8 views (npz cannot represent
        bfloat16/fp8) with the real dtype name alongside.
        """
        arrays = {f"pages_{i}": np.ascontiguousarray(np.asarray(p))
                  .view(np.uint8) for i, p in enumerate(self.pages)}
        np.savez(
            path,
            page_table=self.page_table,
            lengths=self.lengths,
            alloc_counts=self.alloc_counts,
            free_pages=np.asarray(self.free_pages, np.int32),
            meta=np.asarray([self.page_size, len(self.pages),
                             self.n_groups], np.int32),
            fmt=np.asarray(self.fmt),
            pages_dtype=np.asarray(str(np.asarray(self.pages[0]).dtype)),
            **arrays,
        )

    @classmethod
    def load(cls, path: str) -> "PagedKVCache":
        """Restores a cache saved with `save` (pages land on device)."""
        z = np.load(path, allow_pickle=False)
        meta = [int(x) for x in z["meta"]]
        page_size, n_layers = meta[0], meta[1]
        n_groups = meta[2] if len(meta) > 2 else 1
        pdtype = np.dtype(str(z["pages_dtype"]))
        return cls(
            pages=[jnp.asarray(z[f"pages_{i}"].view(pdtype))
                   for i in range(n_layers)],
            page_table=z["page_table"].copy(),
            lengths=z["lengths"].copy(),
            free_pages=list(z["free_pages"]),
            page_size=page_size,
            fmt=str(z["fmt"]),
            alloc_counts=z["alloc_counts"].copy(),
            n_groups=n_groups,
        )


# --- jitted helpers -----------------------------------------------------------


def _quant_rows(x):
    """(..., d) -> (int8 payload, f32 scale (...,))"""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / INT8_MAX)
    vals = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return vals, scale[..., 0]


@functools.partial(jax.jit, static_argnames=("page_size", "fmt"),
                   donate_argnums=(0,))
def _write_prefill_layer(pages, k, v, page_ids, *, page_size, fmt):
    """pages (hkv, np, rows, d); k/v (hkv, L, d); page_ids (n_pages,)."""
    hkv, L, d = k.shape
    n = L // page_size
    kp = k.reshape(hkv, n, page_size, d)
    vp = v.reshape(hkv, n, page_size, d)
    if fmt == "int8":
        from tiny_flash_attention_tpu.ops.paged_fused import (
            _pack_scale_rows)
        kq, ks = _quant_rows(kp)
        vq, vs = _quant_rows(vp)
        fused = jnp.concatenate(
            [kq, vq, _pack_scale_rows(ks, d), _pack_scale_rows(vs, d)],
            axis=-2)
    else:
        fused = jnp.concatenate([kp, vp], axis=-2).astype(pages.dtype)
    # scatter pages: (hkv, n, rows, d) into pages[:, page_ids]
    return pages.at[:, page_ids].set(fused)


@functools.partial(jax.jit, static_argnames=("page_size", "fmt"),
                   donate_argnums=(0,))
def _append_layer(pages, k_new, v_new, page_ids, rows, *, page_size, fmt):
    """pages (hkv, np, prows, d); k_new/v_new (hkv, B, d); page_ids/rows (B,)."""
    ps = page_size

    if fmt == "int8":
        d = pages.shape[-1]
        sr = 4 * max(1, ps // d)   # scale rows per side (paged_fused doc)
        kq, ks = _quant_rows(k_new)           # (hkv, B, d), (hkv, B)
        vq, vs = _quant_rows(v_new)
        ksb = jax.lax.bitcast_convert_type(ks, jnp.int8)   # (hkv, B, 4)
        vsb = jax.lax.bitcast_convert_type(vs, jnp.int8)
        # payload rows
        pages = pages.at[:, page_ids, rows, :].set(kq)
        pages = pages.at[:, page_ids, ps + rows, :].set(vq)
        # scale bytes: byte j of token row r at [2ps + 4*(r//d) + j, r%d]
        # (K side; V offset by sr) — the paged_fused packed-scale layout
        srow = 4 * (rows // d)
        lane = rows % d
        for j in range(4):
            pages = pages.at[:, page_ids, 2 * ps + srow + j, lane].set(
                ksb[..., j])
            pages = pages.at[:, page_ids, 2 * ps + sr + srow + j, lane].set(
                vsb[..., j])
        return pages
    pages = pages.at[:, page_ids, rows, :].set(k_new.astype(pages.dtype))
    pages = pages.at[:, page_ids, ps + rows, :].set(v_new.astype(pages.dtype))
    return pages
