"""Continuous-batching inference engine.

Host-side orchestration over the jitted prefill/decode paths: requests are
admitted into free cache slots as they arrive, every decode step advances ALL
slots in one fixed-shape kernel launch (inactive slots run against a reserved
scratch page and are ignored), and finished sequences free their pages
immediately. This is the north-star "continuous-batching decode loop"
(BASELINE.json) — the reference has no serving layer at all.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tiny_flash_attention_tpu.models import transformer as T
from tiny_flash_attention_tpu.models.kv_cache import PagedKVCache
from tiny_flash_attention_tpu.models.inference import (
    prefill_forward_batched, decode_step, sample_tokens)


@dataclasses.dataclass
class Request:
    prompt: List[int]
    max_new_tokens: int
    temperature: float = 0.0
    eos_token: Optional[int] = None
    # filled by the engine
    slot: int = -1
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


class InferenceEngine:
    def __init__(self, cfg: T.ModelConfig, params: dict, *,
                 num_pages: int = 512, page_size: int = 128,
                 max_seqs: int = 8, pages_per_seq: int = 32,
                 kv_format: str = "bf16", seed: int = 0):
        self.cfg = cfg
        self.params = params
        self.cache = PagedKVCache.create(
            n_layers=cfg.n_layers, n_kv_heads=cfg.n_kv_heads,
            num_pages=num_pages, page_size=page_size, d_head=cfg.d_head,
            max_seqs=max_seqs, pages_per_seq=pages_per_seq, fmt=kv_format,
            dtype=cfg.dtype)
        # page 0 is the scratch page inactive slots read/write; never allocate
        self.cache.free_pages = [p for p in self.cache.free_pages if p != 0]
        self.page_size = page_size
        self.kv_format = kv_format
        self.requests: Dict[int, Request] = {}
        self.last_token = np.zeros((max_seqs,), np.int32)
        self.temps = np.zeros((max_seqs,), np.float32)
        self.key = jax.random.key(seed)

    # --- admission -------------------------------------------------------

    def add_request(self, req: Request) -> int:
        return self.add_requests([req])[0]

    def add_requests(self, reqs: List[Request]) -> List[int]:
        """Admits several requests with ONE batched prefill dispatch.

        Prompts pad to the longest request's page-multiple bucket; right
        padding is harmless under the causal mask and cache writes slice by
        true length.
        """
        ps = self.page_size
        windowed = self.cfg.attn_window is not None
        if windowed:
            # ring cache: a fixed full-width page set per slot holds the
            # last window of tokens for unbounded generation
            assert self.cfg.attn_window + 2 * ps <= \
                self.cache.pages_per_seq * ps, (
                    "ring capacity pages_per_seq*page_size must cover "
                    "window + 2 pages")
            for req in reqs:
                assert len(req.prompt) <= self.cache.pages_per_seq * ps, (
                    f"prompt ({len(req.prompt)} tokens) exceeds ring "
                    f"capacity {self.cache.pages_per_seq * ps}")
        slots = []
        for req in reqs:
            upper = (self.cache.pages_per_seq * ps if windowed
                     else len(req.prompt) + req.max_new_tokens)
            slot = self.cache.alloc_slot(upper)
            req.slot = slot
            self.requests[slot] = req
            slots.append(slot)

        L_max = max(len(r.prompt) for r in reqs)
        L_pad = -(-L_max // ps) * ps
        toks = np.zeros((len(reqs), L_pad), np.int32)
        for i, req in enumerate(reqs):
            toks[i, :len(req.prompt)] = req.prompt
        logits, ks, vs = prefill_forward_batched(self.cfg, self.params,
                                                 jnp.asarray(toks))
        self.key, sub = jax.random.split(self.key)
        temps = jnp.asarray([r.temperature for r in reqs], jnp.float32)
        last = jnp.asarray([len(r.prompt) - 1 for r in reqs])
        first_toks = np.asarray(sample_tokens(
            logits[jnp.arange(len(reqs)), last], sub, temps))

        for i, (slot, req) in enumerate(zip(slots, reqs)):
            L = len(req.prompt)
            self.cache.write_prefill(slot, ks[:, i], vs[:, i])
            self.cache.lengths[slot] = L
            self.temps[slot] = req.temperature
            self._record(slot, int(first_toks[i]))
        return slots

    def add_requests_packed(self, reqs: List[Request],
                            pack_bucket: str = "page") -> List[int]:
        """Admits several requests with ONE PACKED prefill dispatch.

        Prompts pad to their own page-multiple bucket and concatenate into
        a single row; the flagship kernel gets segment ids (runtime mask)
        plus the STATIC pack offsets, which prune its work list to the
        block-diagonal — admission costs sum(L_i^2)/2 attention instead of
        add_requests' B * L_max^2 / 2, a win whenever prompt lengths
        diverge. Cache writes land per-request from the packed K/V.

        COMPILE COST: segment_starts is static, so every distinct tuple of
        pack offsets compiles its own prefill executable (worklist pruning
        is what buys the FLOP savings). With pack_bucket="page" (exact,
        default) a workload with highly variable prompt lengths can retrace
        on nearly every admission batch; pack_bucket="pow2" instead rounds
        each segment up to the next power-of-two page multiple, bounding
        the number of distinct segment lengths to ~log2(max_len) at the
        cost of up to 2x padded attention rows per prompt (the pad tokens'
        K/V never enter the cache, and their worklist tiles stay pruned to
        the segment diagonal). Use "pow2" for latency-sensitive serving
        with long-tail prompt lengths."""
        from tiny_flash_attention_tpu.models.inference import (
            prefill_forward_packed)

        assert self.cfg.attn_window is None, \
            "packed admission + windowed ring cache: use add_requests"
        assert pack_bucket in ("page", "pow2"), pack_bucket
        ps = self.page_size
        slots, offs, lpads = [], [], []
        off = 0
        for req in reqs:
            slot = self.cache.alloc_slot(len(req.prompt)
                                         + req.max_new_tokens)
            req.slot = slot
            self.requests[slot] = req
            slots.append(slot)
            offs.append(off)
            lpad = -(-len(req.prompt) // ps) * ps
            if pack_bucket == "pow2":
                lpad = ps * (1 << max(0, (lpad // ps - 1).bit_length()))
            lpads.append(lpad)
            off += lpad
        total = off
        toks = np.zeros((1, total), np.int32)
        segs = np.zeros((1, total), np.int32)
        positions = np.zeros((total,), np.int32)
        for i, req in enumerate(reqs):
            o = offs[i]
            toks[0, o:o + len(req.prompt)] = req.prompt
            segs[0, o:o + lpads[i]] = i + 1
            positions[o:o + lpads[i]] = np.arange(lpads[i])
        logits, ks, vs = prefill_forward_packed(
            self.cfg, self.params, jnp.asarray(toks), jnp.asarray(segs),
            jnp.asarray(positions), segment_starts=tuple(offs))
        self.key, sub = jax.random.split(self.key)
        temps = jnp.asarray([r.temperature for r in reqs], jnp.float32)
        last = jnp.asarray([offs[i] + len(r.prompt) - 1
                            for i, r in enumerate(reqs)])
        first_toks = np.asarray(sample_tokens(logits[0, last], sub, temps))

        for i, (slot, req) in enumerate(zip(slots, reqs)):
            # cache write is page-exact regardless of the pack bucket: the
            # bucket's extra pad pages are scheduling padding only and must
            # not spill past the slot's allocated page list
            o = offs[i]
            lp = -(-len(req.prompt) // ps) * ps
            self.cache.write_prefill(slot, ks[:, 0, :, o:o + lp],
                                     vs[:, 0, :, o:o + lp])
            self.cache.lengths[slot] = len(req.prompt)
            self.temps[slot] = req.temperature
            self._record(slot, int(first_toks[i]))
        return slots

    def add_requests_jagged(self, reqs: List[Request]) -> List[int]:
        """Admits a heterogeneous batch via the ROW-LOOP kernel.

        The third admission mode (vs add_requests' padded batch and
        add_requests_packed's packed row): prompts pad to the longest
        request's page bucket like add_requests, but attention cost clamps
        to each request's RUNTIME length (~sum(L_i^2)/2, like packed) and
        the compiled executable depends only on the (B, L_pad) bucket —
        no retrace per length mix. The right mode when prompt lengths
        diverge AND vary batch to batch (the packed path's retrace cost
        note)."""
        from tiny_flash_attention_tpu.models.inference import (
            prefill_forward_jagged)

        assert self.cfg.attn_window is None, \
            "jagged admission + windowed ring cache: use add_requests"
        ps = self.page_size
        slots = []
        for req in reqs:
            slot = self.cache.alloc_slot(len(req.prompt)
                                         + req.max_new_tokens)
            req.slot = slot
            self.requests[slot] = req
            slots.append(slot)
        L_max = max(len(r.prompt) for r in reqs)
        L_pad = -(-L_max // ps) * ps
        toks = np.zeros((len(reqs), L_pad), np.int32)
        for i, req in enumerate(reqs):
            toks[i, :len(req.prompt)] = req.prompt
        lens = jnp.asarray([len(r.prompt) for r in reqs], jnp.int32)
        logits, ks, vs = prefill_forward_jagged(
            self.cfg, self.params, jnp.asarray(toks), lens)
        self.key, sub = jax.random.split(self.key)
        temps = jnp.asarray([r.temperature for r in reqs], jnp.float32)
        last = jnp.asarray([len(r.prompt) - 1 for r in reqs])
        first_toks = np.asarray(sample_tokens(
            logits[jnp.arange(len(reqs)), last], sub, temps))

        for i, (slot, req) in enumerate(zip(slots, reqs)):
            lp = -(-len(req.prompt) // ps) * ps
            self.cache.write_prefill(slot, ks[:, i, :, :lp],
                                     vs[:, i, :, :lp])
            self.cache.lengths[slot] = len(req.prompt)
            self.temps[slot] = req.temperature
            self._record(slot, int(first_toks[i]))
        return slots

    # --- decode ------------------------------------------------------------

    def step(self) -> Dict[int, int]:
        """Advances every active slot one token; returns {slot: token}."""
        active = [s for s, r in self.requests.items() if not r.done]
        if not active:
            return {}
        lengths = self.cache.lengths.copy()
        positions = jnp.asarray(np.maximum(lengths - 0, 0), jnp.int32)
        # inactive slots decode against the scratch page at position 0
        positions = jnp.asarray(
            np.where(lengths > 0, lengths, 0), jnp.int32)
        tokens = jnp.asarray(self.last_token)
        page_table, _ = self.cache.device_views()

        logits, new_pages = decode_step(
            self.cfg, self.params, self.cache.pages, tokens, positions,
            page_table, page_size=self.page_size, fmt=self.kv_format)
        self.cache.pages = new_pages

        self.key, sub = jax.random.split(self.key)
        sampled = np.asarray(sample_tokens(logits, sub,
                                           jnp.asarray(self.temps)))

        out = {}
        for slot in active:
            self.cache.lengths[slot] += 1
            tok = int(sampled[slot])
            out[slot] = tok
            self._record(slot, tok)
        return out

    def steps(self, n: int) -> Dict[int, List[int]]:
        """Advances every active slot n tokens with ONE device dispatch.

        Runs the decode chunk device-side (inference.decode_loop): the host
        syncs once per chunk instead of 2-3 times per token, which is what
        the per-token step() costs. Sequences that hit EOS mid-chunk stop
        being recorded but their cache rows still advance (chunked-decode
        overrun; the allocator reserves for it via grow_slot below).
        Returns {slot: [tokens...]} for tokens actually recorded.
        """
        active = [s for s, r in self.requests.items() if not r.done]
        if not active or n <= 0:
            return {}
        if self.cfg.attn_window is None:
            # clamp to table capacity: a request whose prompt+max_new_tokens
            # already fills its page_table row must not be grown past the
            # table width by chunked-decode overrun — the device write wraps
            # positions modulo the table width (inference.py decode write),
            # so overrun rows of finished requests land back on the slot's
            # own pages (garbage on a done request, never a live neighbour)
            cap = self.cache.pages_per_seq * self.page_size
            for slot in active:
                self.cache.grow_slot(
                    slot, min(int(self.cache.lengths[slot]) + n, cap))

        lengths = self.cache.lengths.copy()
        positions = jnp.asarray(np.where(lengths > 0, lengths, 0), jnp.int32)
        page_table, _ = self.cache.device_views()
        if self.cfg.attn_window is None:
            # Bucket the page-table width to the live maximum length: the
            # paged-attention grid is sized by the table width, so passing
            # all pages_per_seq columns makes every decode step sequence
            # (predicated-off) grid cells for the whole CAPACITY — measured
            # ~2x tokens/s at short contexts from this slice alone.
            # Power-of-two buckets bound the number of jit traces; the
            # wrap-modulo indexing is the identity below capacity, so a
            # narrower table is semantically a smaller capacity. Windowed
            # (ring) slots need the full table width (true wrap).
            need = int(np.max(np.where(lengths > 0, lengths, 0))) + n
            pages_needed = -(-need // self.page_size)
            bucket = 1 << max(0, (pages_needed - 1)).bit_length()
            if bucket < self.cache.pages_per_seq:
                page_table = page_table[:, :bucket]
        sampled = np.asarray(                   # (n, max_seqs), one sync
            self._decode_chunk(positions, page_table, n))

        out: Dict[int, List[int]] = {s: [] for s in active}
        for slot in active:
            self.cache.lengths[slot] += n
            req = self.requests[slot]
            for t in range(n):
                if req.done:
                    break
                tok = int(sampled[t, slot])
                out[slot].append(tok)
                self._record(slot, tok)
        return out

    def _decode_chunk(self, positions, page_table, n):
        """Dispatches one device-side decode chunk; returns sampled (n, B).
        Subclass hook: ShardedInferenceEngine swaps in the tensor-parallel
        loop."""
        from tiny_flash_attention_tpu.models.inference import decode_loop

        self.key, sub = jax.random.split(self.key)
        new_pages, sampled, _ = decode_loop(
            self.cfg, self.params, self.cache.pages,
            jnp.asarray(self.last_token), positions, page_table,
            jnp.asarray(self.temps), sub,
            page_size=self.page_size, fmt=self.kv_format, n_steps=n,
            greedy=bool(np.all(self.temps == 0.0)))
        self.cache.pages = new_pages
        return sampled

    def _record(self, slot: int, tok: int) -> None:
        req = self.requests[slot]
        req.generated.append(tok)
        self.last_token[slot] = tok
        if (req.eos_token is not None and tok == req.eos_token) or \
                len(req.generated) >= req.max_new_tokens:
            req.done = True

    def collect_finished(self) -> List[Request]:
        done = [r for r in self.requests.values() if r.done]
        for r in done:
            self.cache.free_slot(r.slot)
            del self.requests[r.slot]
            self.temps[r.slot] = 0.0   # keep the greedy fast path available
        return done

    def generate(self, prompts: List[List[int]], max_new_tokens: int,
                 temperature: float = 0.0, chunk: int = 32) -> List[List[int]]:
        """Convenience batch API over the continuous-batching loop.

        Decodes in device-side chunks (steps(n)); chunk=1 reproduces the
        per-token host loop.
        """
        reqs = [Request(p, max_new_tokens, temperature) for p in prompts]
        pending = list(reqs)
        while pending or self.requests:
            batch = []
            while pending and \
                    np.count_nonzero(self.cache.lengths == 0) > len(batch) \
                    and len(self.cache.free_pages) >= \
                    (len(batch) + 1) * self.cache.pages_per_seq:
                batch.append(pending.pop(0))
            if batch:
                self.add_requests(batch)   # one batched prefill dispatch
            if not self.requests:
                break
            rem = [r.max_new_tokens - len(r.generated)
                   for r in self.requests.values() if not r.done]
            if not rem:
                self.collect_finished()
                continue
            # chunk sizing: max(rem) keeps long requests on the fast path at
            # the cost of overrun pages for short ones (freed by free_slot
            # via alloc_counts — the overhead is transient). When remaining
            # lengths have mostly converged, min(rem) avoids overrun decode
            # steps entirely without stranding the long tail at chunk=1.
            lo, hi = min(rem), max(rem)
            n = max(1, min(chunk, lo if lo * 2 >= hi else hi))
            if n == 1:
                self.step()
            else:
                self.steps(n)
            self.collect_finished()
        return [r.generated for r in reqs]
