"""Continuous-batching inference engine (slot-based, static shapes).

Goes beyond the reference's serving design: the reference worker handles
one request at a time behind a semaphore (reference:
groma/serve/model_worker.py:63,186 — and its model glue was stale LLaVA
code).  This engine keeps a fixed-capacity batched KV cache of
``max_slots`` independent streams; new requests prefill (b=1 program)
into any free slot while the other slots keep decoding — continuous
batching with ZERO dynamic shapes, the TPU-native equivalent of
vLLM-style request interleaving:

* one compiled b=1 prefill program (vision + surgery + LLM prefill) —
  or, with ``prefill_chunk_tokens``, a fixed-size chunked prefill that
  interleaves decode bursts between prompt chunks so active streams
  never stall behind a long prefill,
* one compiled ``max_slots``-wide chunked decode program
  (``lax.scan`` over ``chunk`` steps; per-row cache indices / positions /
  done flags — see models/llama.py vector cache_index support),
* slot insertion is a ``dynamic_update_slice`` of each per-layer cache
  leaf at the batch dim, so admission never recompiles anything.

Greedy decode matches the single-request Generator exactly (fp32) —
asserted by tests/test_engine.py including mid-decode admissions.
"""

from __future__ import annotations

import itertools
import queue
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from groma_tpu.models.groma import GromaModel
from groma_tpu.models.llama import make_kv_cache


class Session:
    """Per-request handle: consume ``token_stream()`` until exhaustion."""

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self.vis = None            # proposal pool (boxes + mask), set at
        self.tokens: list = []     # prefill time; grows as chunks arrive
        self.done = False
        self.cancelled = False     # client stop (e.g. stop-string hit)
        self.truncated = False     # paged mode: stream ended early
                                   # because the page pool ran dry
        self.error = None          # engine-fatal exception (e.g. device
                                   # OOM): token_stream re-raises it
        self.t_submit = time.time()
        self.t_first: Optional[float] = None   # first-token wall clock

    @property
    def ttft(self) -> Optional[float]:
        """Submit -> first-token latency (None until the first token)."""
        return None if self.t_first is None else self.t_first - self.t_submit

    def cancel(self):
        """Client-side early stop (e.g. the worker matched a stop
        string): the engine frees this slot at the next burst boundary;
        the token stream ends after the in-flight chunk."""
        self.cancelled = True

    def token_stream(self):
        """Yields token ids as they are produced; ends at EOS/length.
        If the engine died (device OOM, kernel failure) the stream ends
        by RE-RAISING the fatal error instead of hanging or silently
        truncating."""
        while True:
            item = self._q.get()
            if item is None:
                if self.error is not None:
                    raise RuntimeError(
                        'engine died mid-stream') from self.error
                return
            yield item


class BatchEngine:
    """``qp`` (a quantize_groma_llm tree) switches the LLM side to the
    weight-only int8/int4 path — the production single-chip configuration
    (bf16 7B weights + cache do not fit 16 GB); ``kv_bits=8`` additionally
    stores the shared cache as int8."""

    def __init__(self, model: GromaModel, params, max_slots: int = 4,
                 max_len: Optional[int] = None, eos_id: int = 2,
                 chunk: int = 8, max_new_tokens: int = 256,
                 qp: Optional[dict] = None, kv_bits: int = 16,
                 prefill_chunk_tokens: Optional[int] = None,
                 admit_batch: int = 1, w8a8_prefill: bool = False,
                 paged_kv: bool = False,
                 kv_pool_tokens: Optional[int] = None,
                 sample_seed: int = 0, spec_lookahead: int = 0,
                 spec_ngram: int = 2):
        """``prefill_chunk_tokens`` (quantized path only) enables CHUNKED
        PREFILL: a new request's prompt is prefilled in fixed-size token
        chunks with a decode burst for the active slots between chunks,
        so in-flight streams never stall behind a long prefill (the
        vLLM-style scheduling knob; one-shot prefill stalls every active
        stream for the whole prompt).

        ``w8a8_prefill`` (int8 weights only) quantizes prefill
        activations per-token and runs the prompt matmuls int8 x int8 on
        the MXU's double-rate integer path (ops/quant.w8a8_matmul) —
        ~1.6x prefill FLOP rate.  Opt-in: accuracy with trained weights
        is unvalidated (activation outliers), decode is unaffected.

        ``paged_kv`` (int8 KV only: requires qp + kv_bits=8, MHA)
        replaces the contiguous per-slot cache with a SHARED PAGE POOL
        of ``kv_pool_tokens`` tokens in 128-token pages
        (ops/paged_attention.py): each slot consumes HBM proportional to
        its actual stream length instead of reserving ``max_len``, so
        many more concurrent slots fit 16 GB (vLLM-style paged
        attention, TPU-native block-indirect kernel).  ``max_len``
        becomes the PER-REQUEST cap.  A request whose decode outruns the
        pool is truncated (``session.truncated``); admission backs off
        while free pages < the prompt's need."""
        self.model = model
        self.params = params
        self.qp = qp
        cfg = model.cfg
        self.eos_id = eos_id
        self.chunk = chunk
        self.max_new_tokens = max_new_tokens
        self.max_slots = max_slots
        max_len = max_len or cfg.max_seq_len + max_new_tokens + 8
        # round up to a 128 multiple: the fused Pallas decode-attention
        # kernel (ops/decode_attention.py) requires lane-aligned cache
        # length and silently falls back to the slower XLA chain otherwise
        self.max_len = -(-max_len // 128) * 128
        if prefill_chunk_tokens is not None and qp is None:
            raise ValueError('chunked prefill requires the quantized path')
        self.prefill_chunk_tokens = prefill_chunk_tokens
        self.paged = paged_kv
        if paged_kv:
            from groma_tpu.ops.paged_attention import PAGE
            if qp is None or kv_bits != 8:
                raise ValueError('paged_kv requires qp and kv_bits=8')
            if prefill_chunk_tokens:
                raise ValueError('paged_kv excludes chunked prefill')
            if cfg.llm.num_heads != cfg.llm.num_kv_heads:
                raise ValueError('paged_kv requires MHA')
            self._page = PAGE
            # per-request page capacity; prompts prefill into a
            # contiguous max_len buffer, so max_len must stay 128-aligned
            self._np_max = self.max_len // PAGE
            pool_tokens = kv_pool_tokens or max_slots * self.max_len
            # page 0 is the reserved trash page (never allocated)
            self._num_pages = pool_tokens // PAGE + 1
            self._free_pages = list(range(self._num_pages - 1, 0, -1))
            self._slot_pages = [[] for _ in range(max_slots)]
            self._table_np = np.zeros((max_slots, self._np_max), np.int32)
        self.spec_lookahead = spec_lookahead
        self.spec_ngram = spec_ngram
        if spec_lookahead > 0:
            if qp is None:
                raise ValueError('engine speculative decoding requires a '
                                 'quantized/bf16 tree (qp)')
            if paged_kv:
                raise ValueError('speculative decoding excludes paged_kv')
            # speculation writes up to G tokens past the live stream —
            # keep the scatter in bounds at the cap
            self.max_len = -(-(self.max_len + spec_lookahead) // 128) * 128
        # admit_batch > 1 compiles a SECOND prefill program at b=K and
        # admits up to K queued requests per call — b=1 vision+prefill is
        # the serving bottleneck for short-answer workloads (REC), and a
        # batched admission amortizes it ~Kx.  Static shape: when fewer
        # than K requests are waiting the b=1 program is used instead.
        self.admit_batch = max(1, admit_batch)

        # NOTE: every jitted program takes the weights (params / qp) as
        # ARGUMENTS — closing over the multi-GB quantized tree bakes it
        # into the lowering as constants (6.6 GB captured at 7B scale),
        # which bloats compiles and defeats buffer sharing
        if qp is not None:
            from groma_tpu.models.llama_quant import (quant_llama_forward,
                                                      quant_llama_logits)
            sp_base = cfg.llm.vocab_size

            def q_logits(qp, hidden):
                base = quant_llama_logits(qp, hidden)
                extra = jnp.einsum(
                    'bsd,dv->bsv', hidden.astype(jnp.bfloat16),
                    qp['extra_lm_head'],
                    preferred_element_type=jnp.float32)
                return jnp.concatenate([base, extra], axis=-1)

            def q_embed(qp, ids):
                is_new = ids >= sp_base
                base = qp['embed_tokens'][jnp.where(is_new, 0, ids)]
                new = qp['new_input_embs'][
                    jnp.where(is_new, ids - sp_base, 0)]
                return jnp.where(is_new[..., None], new, base)

            def prefill_one(params, qp, images, input_ids, region_slot,
                            base_valid):
                emb, _, valid, vis = model.apply(
                    {'params': params}, images, input_ids, region_slot,
                    base_valid, method=GromaModel.prepare_stream)
                pos = jnp.maximum(
                    jnp.cumsum(valid.astype(jnp.int32), -1) - 1, 0)
                cache = self._fresh_cache(images.shape[0])
                cache['index'] = jnp.zeros((), jnp.int32)  # shared scalar
                hidden, cache = quant_llama_forward(
                    qp, cfg.llm, emb, valid, pos, cache,
                    w8a8=w8a8_prefill)
                last = jnp.argmax(pos, axis=-1)
                last_h = jnp.take_along_axis(
                    hidden, last[:, None, None], axis=1)
                next_pos = jnp.take_along_axis(pos, last[:, None], -1) + 1
                return (q_logits(qp, last_h)[:, 0], cache, vis, next_pos)

            self._q_forward = quant_llama_forward
            self._q_logits = q_logits
            self._q_embed = q_embed

            def prepare_one(params, images, input_ids, region_slot,
                            base_valid):
                emb, _, valid, vis = model.apply(
                    {'params': params}, images, input_ids, region_slot,
                    base_valid, method=GromaModel.prepare_stream)
                pos = jnp.maximum(
                    jnp.cumsum(valid.astype(jnp.int32), -1) - 1, 0)
                return emb, valid, pos, vis

            def chunk_fwd(qp, emb_c, valid_c, pos_c, cache):
                hidden, cache = quant_llama_forward(
                    qp, cfg.llm, emb_c, valid_c, pos_c, cache,
                    chunked=True, w8a8=w8a8_prefill)
                return hidden, cache

            def last_logits(qp, hidden, local_idx):
                h = jax.lax.dynamic_index_in_dim(hidden, local_idx, 1)
                return q_logits(qp, h)[:, 0]

            self._prepare = jax.jit(prepare_one)
            self._chunk_fwd = jax.jit(chunk_fwd, donate_argnums=(4,))
            self._last_logits = jax.jit(last_logits)
        else:
            def prefill_one(params, qp, images, input_ids, region_slot,
                            base_valid):
                return model.apply(
                    {'params': params}, images, input_ids, region_slot,
                    base_valid, max_len=self.max_len,
                    method=GromaModel.prefill)

        def insert(cache, one, row, slot, write_index):
            """Copy row ``row`` of a b>=1 prefill cache into batch row
            ``slot`` of the engine cache."""
            def put(c, o, nd):
                o = jax.lax.dynamic_slice_in_dim(o, row, 1, axis=0)
                return jax.lax.dynamic_update_slice(
                    c, o, (slot,) + (0,) * (nd - 1))
            out = dict(cache)
            out['k'] = [put(c, o, 4) for c, o in zip(cache['k'], one['k'])]
            out['v'] = [put(c, o, 4) for c, o in zip(cache['v'], one['v'])]
            for key in ('k_scale', 'v_scale'):
                if key in cache:
                    out[key] = [put(c, o, 3)
                                for c, o in zip(cache[key], one[key])]
            out['mask'] = put(cache['mask'], one['mask'], 2)
            out['index'] = cache['index'].at[slot].set(write_index)
            return out

        def pick_next(logits, temps, key):
            """Per-slot next token: greedy where temps == 0, categorical
            at logits/temp otherwise (one program, no recompiles —
            jnp.where selects per row, so temp-0 slots stay exactly
            deterministic)."""
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
            sampled = jax.random.categorical(key, scaled,
                                             axis=-1).astype(jnp.int32)
            return jnp.where(temps > 0, sampled, greedy)

        def decode_chunk(params, qp, cache, tok0, pos0, active, done0,
                         temps, key):
            """``chunk`` decode steps over all slots; returns the emitted
            (B, chunk) tokens + updated state.  Inactive/done rows feed
            EOS and freeze their position."""

            def step(carry, _):
                toks, pos, cache, done, key = carry
                if self.qp is not None:
                    emb = self._q_embed(qp, toks[:, None])
                    hidden, cache = self._q_forward(
                        qp, cfg.llm, emb,
                        jnp.ones_like(toks[:, None], dtype=bool),
                        pos[:, None], cache)
                    logits = self._q_logits(qp, hidden)[:, -1]
                else:
                    logits, cache = model.apply(
                        {'params': params}, toks[:, None], cache,
                        pos[:, None], method=GromaModel.decode_step)
                key, sub = jax.random.split(key)
                nxt = pick_next(logits, temps, sub)
                nxt = jnp.where(active & ~done, nxt, self.eos_id)
                done = done | (nxt == self.eos_id) | ~active
                pos = pos + (active & ~done).astype(jnp.int32)
                return (nxt, pos, cache, done, key), nxt

            (tokN, posN, cache, doneN, _), out = jax.lax.scan(
                step, (tok0, pos0, cache, done0, key), None,
                length=self.chunk)
            return cache, jnp.swapaxes(out, 0, 1), tokN, posN, doneN

        self._kv_bits = kv_bits
        self._prefill = jax.jit(prefill_one)
        self._insert = jax.jit(insert, donate_argnums=(0,))
        self._decode_chunk = jax.jit(decode_chunk, donate_argnums=(2,))

        if spec_lookahead > 0:
            G = spec_lookahead

            def verify_chunk(qp, cache, tok0, drafts, pos0, active, done0):
                """One (B, G+1) speculative verify over all slots:
                per-row multi-token append (vector cache index), greedy
                verification, per-row accept counts, and an exact
                per-row cache rewind of the rejected writes."""
                nb = tok0.shape[0]
                toks = jnp.concatenate([tok0[:, None], drafts], axis=1)
                emb = self._q_embed(qp, toks)
                positions = pos0[:, None] + jnp.arange(G + 1)[None]
                index0 = cache['index']
                hidden, cache = self._q_forward(
                    qp, cfg.llm, emb, jnp.ones((nb, G + 1), bool),
                    positions, cache, chunked=True)
                logits = self._q_logits(qp, hidden)
                greedy = jnp.argmax(logits, -1).astype(jnp.int32)
                live = active & ~done0
                match = (greedy[:, :-1] == drafts).astype(jnp.int32)
                n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
                ar = jnp.arange(G + 1)[None]
                emitted = jnp.where(ar <= n_acc[:, None], greedy,
                                    self.eos_id)
                emitted = jnp.where(live[:, None], emitted, self.eos_id)
                # eos WITHIN the accepted run ends the row there (the
                # pad positions beyond n_acc are eos too — exclude them
                # from the done test)
                is_eos = (greedy == self.eos_id) & (ar <= n_acc[:, None])
                first_eos = jnp.argmax(is_eos, axis=1)
                has_eos = jnp.any(is_eos, axis=1) & live
                counts = jnp.where(live, n_acc + 1, 0)
                counts = jnp.where(has_eos,
                                   jnp.minimum(counts, first_eos + 1),
                                   counts)
                # rewind: keep [cur, d_1..d_a] for live rows, nothing
                # for frozen rows (their masked writes fully reverted)
                keep = index0 + jnp.where(live, 1 + n_acc, 0)
                wrote_end = index0 + G + 1
                iota = jnp.arange(cache['mask'].shape[1])[None]
                cache = {**cache,
                         'mask': jnp.where(
                             (iota >= keep[:, None])
                             & (iota < wrote_end[:, None]),
                             False, cache['mask']),
                         'index': keep}
                tokN = jnp.where(live, greedy[jnp.arange(nb), n_acc],
                                 tok0)
                doneN = done0 | has_eos | ~active
                posN = jnp.where(live, pos0 + n_acc + 1, pos0)
                return cache, emitted, counts, tokN, posN, doneN

            self._verify_chunk = jax.jit(verify_chunk,
                                         donate_argnums=(1,))

        if paged_kv:
            from groma_tpu.models.llama_quant import quant_llama_decode_paged
            from groma_tpu.ops.paged_attention import (insert_prefill_pages,
                                                       make_kv_page_pool)

            def decode_chunk_paged(qp, pools, tok0, pos0, active, done0,
                                   table, temps, key):
                def step(carry, _):
                    toks, pos, pools, done, key = carry
                    live = active & ~done
                    emb = self._q_embed(qp, toks[:, None])
                    lengths = jnp.where(live, pos + 1, 0)
                    hidden, pools = quant_llama_decode_paged(
                        qp, cfg.llm, emb, pos[:, None], pools, table,
                        lengths)
                    logits = self._q_logits(qp, hidden)[:, -1]
                    key, sub = jax.random.split(key)
                    nxt = pick_next(logits, temps, sub)
                    nxt = jnp.where(live, nxt, self.eos_id)
                    done = done | (nxt == self.eos_id) | ~active
                    pos = pos + (active & ~done).astype(jnp.int32)
                    return (nxt, pos, pools, done, key), nxt

                (tokN, posN, pools, doneN, _), out = jax.lax.scan(
                    step, (tok0, pos0, pools, done0, key), None,
                    length=self.chunk)
                return pools, jnp.swapaxes(out, 0, 1), tokN, posN, doneN

            def insert_paged(pools, one, row, page_ids):
                valid = jax.lax.dynamic_slice_in_dim(
                    one['mask'], row, 1, axis=0)[0]
                return insert_prefill_pages(pools, one, row, page_ids,
                                            valid=valid)

            self._decode_paged = jax.jit(decode_chunk_paged,
                                         donate_argnums=(1,))
            self._insert_paged = jax.jit(insert_paged, donate_argnums=(0,))
            self._pools = make_kv_page_pool(cfg.llm, self._num_pages)
            cache = None
        else:
            cache = self._fresh_cache(max_slots)
            cache['index'] = jnp.zeros((max_slots,), jnp.int32)  # per-row
        self._cache = cache
        self._tok = jnp.full((max_slots,), eos_id, jnp.int32)
        self._pos = jnp.zeros((max_slots,), jnp.int32)
        self._active = np.zeros((max_slots,), bool)
        self._temps = np.zeros((max_slots,), np.float32)
        self._key = jax.random.PRNGKey(sample_seed)
        self._host_rng = np.random.default_rng(sample_seed)
        self._done = jnp.ones((max_slots,), bool)
        self._sessions: list = [None] * max_slots
        self._emitted = np.zeros((max_slots,), np.int64)

        # priority admission: entries are (-priority, seq, payload) so
        # higher ``priority`` values admit first, FIFO within a class
        self._queue: queue.PriorityQueue = queue.PriorityQueue()
        self._seq = itertools.count()
        # serving metrics (host counters; stats() snapshots them)
        self._n_submitted = 0
        self._n_finished = 0
        self._n_truncated = 0
        self._n_tokens = 0
        self._ttft_sum = 0.0
        self._ttft_n = 0
        self._t_started = time.time()
        self._stop = False
        self._fatal: Optional[BaseException] = None
        # serializes submit() against _abort_all(): without it a request
        # enqueued between the fatal-check and the put could miss the
        # abort drain and leave its consumer blocked forever
        self._admission_lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        # stop the loop before interpreter teardown (a daemon thread dying
        # inside a jax dispatch crashes the runtime's atexit path)
        import atexit
        atexit.register(self.close)

    def _fresh_cache(self, batch: int) -> dict:
        cfg = self.model.cfg
        if self.qp is not None and self._kv_bits == 8:
            from groma_tpu.models.llama_quant import make_quant_kv_cache
            return make_quant_kv_cache(cfg.llm, batch, self.max_len)
        return make_kv_cache(cfg.llm, batch, self.max_len,
                             dtype=jnp.dtype(cfg.llm.dtype))

    # ------------------------------------------------------------- API

    def submit(self, image, input_ids, region_slot, base_valid,
               max_new_tokens: Optional[int] = None,
               priority: int = 0,
               temperature: float = 0.0) -> Session:
        """Enqueue one request (unbatched arrays); returns its Session.

        ``max_new_tokens`` caps THIS request's generation (bounded by the
        engine-wide ``max_new_tokens``); without a per-request cap a
        short consumer would leave its slot decoding to the engine cap.

        ``priority``: higher admits first when slots are contended
        (FIFO within equal priority).  Already-seated requests are never
        preempted — priority orders the waiting queue only.

        ``temperature`` > 0 samples THIS stream's tokens from
        logits/temperature (per-slot: temp-0 streams in the same batch
        stay exactly greedy)."""
        sess = Session()
        sess.max_new = min(max_new_tokens or self.max_new_tokens,
                           self.max_new_tokens)
        sess.temperature = float(temperature)
        if self.spec_lookahead > 0:
            if sess.temperature > 0:
                raise ValueError('speculative decoding verifies greedily; '
                                 'temperature sampling is unsupported')
            ids_np = np.asarray(input_ids).reshape(-1)
            val_np = np.asarray(base_valid).reshape(-1)
            sess._ctx = [int(t) for t, v in zip(ids_np, val_np) if v]
        with self._admission_lock:
            if self._fatal is not None:
                raise RuntimeError('engine is dead (fatal scheduler-loop '
                                   'error)') from self._fatal
            if self._stop:
                raise RuntimeError('engine is closed')
            self._n_submitted += 1
            self._queue.put((-priority, next(self._seq),
                             (sess, image, input_ids, region_slot,
                              base_valid)))
        return sess

    def stats(self) -> dict:
        """Engine counters for observability (served through the
        worker's /worker_get_status): admission/finish totals, live
        occupancy, mean TTFT, aggregate decode throughput since start,
        and (paged mode) page-pool headroom."""
        out = {
            'submitted': self._n_submitted,
            'finished': self._n_finished,
            'truncated': self._n_truncated,
            'active_slots': int(self._active.sum()),
            'max_slots': self.max_slots,
            'waiting': self._queue.qsize(),
            'tokens_emitted': self._n_tokens,
            'tokens_per_sec': round(
                self._n_tokens / max(time.time() - self._t_started, 1e-9),
                2),
            'mean_ttft_sec': round(self._ttft_sum / self._ttft_n, 4)
            if self._ttft_n else None,
        }
        if self.paged:
            out['free_pages'] = len(self._free_pages)
            out['total_pages'] = self._num_pages - 1
        if self._fatal is not None:
            out['fatal'] = f'{type(self._fatal).__name__}: {self._fatal}'
        return out

    def close(self):
        self._stop = True
        if self._thread.is_alive():
            self._thread.join(timeout=30)

    # ------------------------------------------------------------ loop

    def _admit(self):
        while not self._queue.empty():
            free = [i for i in range(self.max_slots) if not self._active[i]]
            if not free:
                return
            if self.paged and len(self._free_pages) < self._np_max:
                # back-pressure: a new prompt could need up to np_max
                # pages; decoding slots also top up from the same pool —
                # admitting now could starve them mid-stream.  Wait for
                # finishing streams to return pages.
                return
            # pull up to admit_batch waiting requests (bounded by free
            # slots); a full group runs the batched b=K prefill program,
            # a partial group falls back to per-request b=1 admissions
            group = []
            while len(group) < min(self.admit_batch, len(free)):
                try:
                    req = self._queue.get_nowait()[2]
                except queue.Empty:
                    break
                if req[0].cancelled:      # cancelled while waiting
                    req[0].done = True
                    req[0]._q.put(None)
                    continue
                group.append(req)
            if not group:
                return
            if len(group) >= 2 and self.admit_batch > 1 \
                    and not self.prefill_chunk_tokens:
                # any group of >= 2 uses the ONE b=K batched program:
                # partial groups pad by replicating the last request
                # (dummy rows are computed but never seated) — one padded
                # b=K launch beats len(group) serial b=1 launches for
                # every group size >= 2, and the static shape means no
                # recompile.  True variable-length packing buys little
                # here: the vision tower is inherently per-image and the
                # LLM prefill is already batched dense.
                reqs = group
                k = self.admit_batch

                def stack(i):
                    rows = [np.asarray(r[i]) for r in reqs]
                    rows += [rows[-1]] * (k - len(rows))
                    return jnp.asarray(np.stack(rows))

                logits, one, vis, next_pos = self._prefill(
                    self.params, self.qp,
                    stack(1), stack(2), stack(3), stack(4))
                for row, req in enumerate(reqs):
                    self._seat(free[row], req[0], logits[row],
                               one, row, vis, int(next_pos[row, 0]))
            else:
                for row, req in enumerate(group):
                    sess, image, ids, rslot, valid = req
                    if self.prefill_chunk_tokens:
                        logits, one, vis, next_pos = self._chunked_prefill(
                            image, ids, rslot, valid)
                    else:
                        logits, one, vis, next_pos = self._prefill(
                            self.params, self.qp, jnp.asarray(image)[None],
                            jnp.asarray(ids)[None],
                            jnp.asarray(rslot)[None],
                            jnp.asarray(valid)[None])
                    self._seat(free[row], sess, logits[0], one, 0, vis,
                               int(next_pos[0, 0]),
                               vis_row=0)
                    if self.prefill_chunk_tokens \
                            and not self._queue.empty() \
                            and self._active.any():
                        # back-to-back admissions: keep live streams fed
                        # between them, not just between prompt chunks
                        self._decode_burst()

    def _seat(self, slot, sess, row_logits, one, row, vis, next_pos_val,
              vis_row=None):
        """Install one prefilled request (row ``row`` of ``one``) into
        engine ``slot`` and emit its first token."""
        vr = row if vis_row is None else vis_row
        temp = getattr(sess, 'temperature', 0.0)
        if temp > 0:
            # the first token is picked host-side at seat time; sample it
            # with the same logits/temp law as the in-graph decode steps
            lg = np.asarray(row_logits, np.float64) / temp
            lg -= lg.max()
            pz = np.exp(lg); pz /= pz.sum()
            tok0 = int(self._host_rng.choice(len(pz), p=pz))
        else:
            tok0 = int(jnp.argmax(row_logits))
        self._temps[slot] = temp
        sess.vis = jax.tree_util.tree_map(
            np.asarray, {'selected_boxes': vis['selected_boxes'][vr],
                         'selected_mask': vis['selected_mask'][vr]})
        if self.paged:
            # allocate exactly the pages the COMPACTED stream occupies
            # (next_pos_val valid tokens; insert_paged moves them to the
            # front); unused page-id slots hit the trash page 0
            need = -(-next_pos_val // self._page)
            pages = [self._alloc_page() for _ in range(need)]
            if any(p is None for p in pages):
                # pool dry — should not happen (admission gates on
                # worst-case free pages); be safe anyway
                self._free_list([p for p in pages if p is not None])
                sess.truncated = True
                sess.done = True
                sess._q.put(None)
                return
            self._slot_pages[slot] = pages
            row_tbl = self._table_np[slot]
            row_tbl[:need] = pages
            row_tbl[need:] = pages[-1]       # repeat-last: DMA skipped
            ids = np.zeros((self._np_max,), np.int32)
            ids[:need] = pages
            self._pools = self._insert_paged(
                self._pools, one, row, jnp.asarray(ids))
        else:
            self._cache = self._insert(self._cache, one, row, slot,
                                       one['index'])
        self._tok = self._tok.at[slot].set(tok0)
        self._pos = self._pos.at[slot].set(next_pos_val)
        self._done = self._done.at[slot].set(tok0 == self.eos_id)
        self._active[slot] = True
        self._emitted[slot] = 1
        self._sessions[slot] = sess
        if self.spec_lookahead > 0:
            sess._ctx.append(tok0)
        sess.t_first = time.time()
        self._ttft_sum += sess.t_first - sess.t_submit
        self._ttft_n += 1
        self._n_tokens += 1
        sess.tokens.append(tok0)
        sess._q.put(tok0)
        if tok0 == self.eos_id:
            self._finish(slot)

    def _chunked_prefill(self, image, ids, rslot, valid):
        """Vision + surgery once, then LLM prefill in fixed-size chunks
        with a decode burst for the active slots between chunks."""
        c = self.prefill_chunk_tokens
        emb, valid_d, pos, vis = self._prepare(
            self.params, jnp.asarray(image)[None],
            jnp.asarray(ids)[None], jnp.asarray(rslot)[None],
            jnp.asarray(valid)[None])
        valid_np = np.asarray(valid_d[0])
        pos_np = np.asarray(pos[0])
        last_idx = int(np.nonzero(valid_np)[0][-1])
        n_chunks = last_idx // c + 1          # trailing all-pad chunks skipped
        s = emb.shape[1]
        pad = n_chunks * c - s
        if pad > 0:
            emb = jnp.pad(emb, ((0, 0), (0, pad), (0, 0)))
            valid_d = jnp.pad(valid_d, ((0, 0), (0, pad)))
            pos = jnp.pad(pos, ((0, 0), (0, pad)))
        cache = self._fresh_cache(1)
        cache['index'] = jnp.zeros((), jnp.int32)
        hidden = None
        for ci in range(n_chunks):
            lo = ci * c
            hidden, cache = self._chunk_fwd(
                self.qp, emb[:, lo:lo + c], valid_d[:, lo:lo + c],
                pos[:, lo:lo + c], cache)
            if ci + 1 < n_chunks and self._active.any():
                self._decode_burst()     # keep live streams moving
        logits = self._last_logits(
            self.qp, hidden, last_idx - (n_chunks - 1) * c)
        next_pos = jnp.asarray([[pos_np[last_idx] + 1]], jnp.int32)
        # decode must write KV at last_idx+1, NOT at the chunk-rounded
        # cache index (n_chunks*c can exceed the one-shot stream length
        # by up to c-1 and overflow max_len's headroom, silently dropping
        # decode KV writes).  The final chunk's trailing pad slots are
        # mask-False, so overwriting them is safe and exactly matches the
        # one-shot layout up to ignored positions.
        cache['index'] = jnp.int32(last_idx + 1)
        return logits, cache, vis, next_pos

    def _alloc_page(self):
        return self._free_pages.pop() if self._free_pages else None

    def _free_list(self, pages):
        self._free_pages.extend(pages)

    def _finish(self, slot, truncated: bool = False):
        sess = self._sessions[slot]
        if sess is not None:
            sess.truncated = sess.truncated or truncated
            sess.done = True
            sess._q.put(None)
            self._n_finished += 1
            if sess.truncated:
                self._n_truncated += 1
        self._sessions[slot] = None
        self._active[slot] = False
        self._temps[slot] = 0.0
        if self.paged:
            # return the slot's pages and point its table at the trash
            # page: a frozen slot keeps writing its (masked) decode kv
            # inside the batched program, and its old pages may be
            # reassigned to another request immediately
            self._free_list(self._slot_pages[slot])
            self._slot_pages[slot] = []
            self._table_np[slot, :] = 0

    def _topup_pages(self):
        """Pre-allocate pages so every live slot can write ``chunk`` more
        tokens; a slot the pool cannot cover is truncated BEFORE the
        burst (its table would otherwise index past its pages)."""
        pos_np = np.asarray(self._pos)
        done_np = np.asarray(self._done)
        for slot in range(self.max_slots):
            if not self._active[slot] or done_np[slot]:
                continue
            end = int(pos_np[slot]) + self.chunk + 1
            if end > self._np_max * self._page:
                self._finish(slot, truncated=True)
                continue
            pages = self._slot_pages[slot]
            need = -(-end // self._page)
            while len(pages) < need:
                pid = self._alloc_page()
                if pid is None:
                    self._finish(slot, truncated=True)
                    break
                pages.append(pid)
                self._table_np[slot, len(pages) - 1] = pid
            if self._active[slot] and pages:
                self._table_np[slot, len(pages):] = pages[-1]

    def _decode_burst(self):
        """One ``chunk``-step decode pass over all active slots, emitting
        tokens to their sessions."""
        if self.paged:
            self._topup_pages()
            if not self._active.any():
                return
            active_j = jnp.asarray(self._active)
            self._key, sub = jax.random.split(self._key)
            self._pools, out, self._tok, self._pos, self._done = \
                self._decode_paged(self.qp, self._pools, self._tok,
                                   self._pos, active_j, self._done,
                                   jnp.asarray(self._table_np),
                                   jnp.asarray(self._temps), sub)
            self._emit(out)
            return
        active_j = jnp.asarray(self._active)
        self._key, sub = jax.random.split(self._key)
        self._cache, out, self._tok, self._pos, self._done = \
            self._decode_chunk(self.params, self.qp, self._cache,
                               self._tok, self._pos, active_j, self._done,
                               jnp.asarray(self._temps), sub)
        self._emit(out)

    def _emit(self, out, counts=None):
        """``counts`` (spec mode): per-slot number of valid tokens in
        ``out`` this burst (sequential bursts emit every column)."""
        out_np = np.asarray(out)
        done_np = np.asarray(self._done)
        for slot in range(self.max_slots):
            if not self._active[slot]:
                continue
            sess = self._sessions[slot]
            cap = getattr(sess, 'max_new', self.max_new_tokens)
            hit_eos = False
            row = out_np[slot]
            if counts is not None:
                row = row[:counts[slot]]
            for t in row:
                t = int(t)
                sess.tokens.append(t)
                sess._q.put(t)
                if self.spec_lookahead > 0:
                    sess._ctx.append(t)
                self._emitted[slot] += 1
                self._n_tokens += 1
                hit_eos = t == self.eos_id
                if hit_eos or self._emitted[slot] >= cap:
                    break
            if hit_eos or done_np[slot] or sess.cancelled \
                    or self._emitted[slot] >= cap:
                self._finish(slot)

    def _loop(self):
        import time
        try:
            while not self._stop:
                self._admit()
                if not self._active.any():
                    time.sleep(0.002)
                    continue
                self._decode_burst()
        except BaseException as e:  # noqa: BLE001 — fail FAST, not hang:
            # a device error here (OOM during a prefill/burst) would
            # otherwise kill this thread silently and leave every
            # consumer blocked on token_stream() forever
            with self._admission_lock:
                self._fatal = e
            self._abort_all(e)
        else:
            # graceful stop: unblock consumers of requests that were
            # queued but never admitted (no error — the stream just ends)
            with self._admission_lock:
                pass  # barrier: no submit() can now beat the drain below
            self._drain_waiting(None)

    def _drain_waiting(self, err: Optional[BaseException]):
        while not self._queue.empty():
            try:
                _, _, (sess, *_rest) = self._queue.get_nowait()
            except queue.Empty:
                break
            if err is not None:
                sess.error = err
            sess.done = True
            sess._q.put(None)

    def _abort_all(self, err: BaseException):
        """Engine-fatal path: end every live and queued stream with the
        error attached so consumers unblock and see what happened."""
        for slot in range(self.max_slots):
            if self._active[slot]:
                sess = self._sessions[slot]
                self._active[slot] = False
                sess.error = err
                sess.done = True
                sess._q.put(None)
        self._drain_waiting(err)
