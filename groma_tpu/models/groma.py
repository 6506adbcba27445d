"""Groma: the grounded multimodal LLM, assembled TPU-first.

Re-design of the reference GromaModel (reference: groma/model/groma.py:86-427).
The full image -> boxes -> region tokens -> text pipeline compiles to a
single XLA program: fixed-capacity proposal pool (max_region_num slots +
validity mask), host-pre-expanded token templates (data/tokenization.py),
and masked scatters instead of the reference's dynamic re-padding surgery.

Reference behaviors preserved (parity-critical):
* dual-objectness score fusion ``coco^0.4 * sa1b^0.6``
  (reference: groma.py:249),
* user refer boxes injected at score 1.0 and ground-truth boxes at 0.2 so
  NMS prefers nearby predicted boxes over GT duplicates (groma.py:259-263),
* NMS(iou 0.6, score 0.15, max 100) then random permutation of survivors
  (train-time region-index augmentation, groma.py:266-279); fallback to the
  single argmax-score box when nothing survives (groma.py:277-279),
* IoU-matching of refer/ground placeholder boxes onto the selected pool,
  rewriting ``<refer_box>``/``<ground_box>`` into the matched ``<rK>`` id
  (and labels for ground, groma.py:282-308),
* split-vocab embedding (base table + new-token table, groma.py:165-174)
  and dual lm head (lm_head + extra_lm_head concat, groma.py:399-402),
* the vision side (ViT, DDETR, NMS) runs without gradients; the region
  encoder and image-text bridge train through it (groma.py:220-280 no_grad
  scope vs :311-315,361 outside).

Consciously fixed (documented deviations):
* decode steps keep the true key-validity mask instead of the reference's
  rebuilt all-ones mask (groma.py:376-379) — identical for unbatched eval,
  correct for batched serving,
* the random region-index permutation is gated on ``permute`` (train only)
  instead of running unconditionally at eval too (groma.py:275 applies it
  always; index identity does not affect REC metrics, determinism does).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from groma_tpu.config import GromaConfig
from groma_tpu.constants import IGNORE_INDEX
from groma_tpu.data.tokenization import SpecialIds
from groma_tpu.models.llama import LlamaModel, make_kv_cache
from groma_tpu.models.perceiver import Perceiver
from groma_tpu.models.region_encoder import RegionEncoder
from groma_tpu.ops.bbox import box_iou, cxcywh_to_xyxy
from groma_tpu.ops.fused_ce import fused_cross_entropy
from groma_tpu.ops.nms import nms


def _ordinal(mask: jnp.ndarray) -> jnp.ndarray:
    """Per-row running count of True positions (0-based), any value where
    mask is False."""
    return jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1


class GromaModel(nn.Module):
    cfg: GromaConfig

    def setup(self):
        c = self.cfg
        vit_d = c.perceiver.vit.hidden_size
        llm_d = c.llm.hidden_size
        self.perceiver = Perceiver(c.perceiver, name='perceiver')
        self.region_encoder = RegionEncoder(
            embed_dims=vit_d, out_dims=llm_d,
            image_size=c.perceiver.image_size, roi_out=c.region_roi_out,
            num_fuse=c.region_num_fuse, gn_groups=c.region_gn_groups,
            dtype=c.perceiver.vit.dtype, quant=c.vision_int8,
            name='region_encoder')
        self.bridge_fc1 = nn.Dense(llm_d, name='bridge_fc1')
        self.bridge_fc2 = nn.Dense(llm_d, name='bridge_fc2')
        self.llm = LlamaModel(c.llm, name='llm')
        self.embed_tokens = self.param(
            'embed_tokens', nn.initializers.normal(0.02),
            (c.llm.vocab_size, llm_d))
        self.new_input_embs = self.param(
            'new_input_embs', nn.initializers.normal(0.02),
            (c.num_new_token, llm_d))
        self.lm_head = nn.Dense(c.llm.vocab_size, use_bias=False,
                                name='lm_head')
        self.extra_lm_head = nn.Dense(c.num_new_token, use_bias=False,
                                      name='extra_lm_head')

    # ------------------------------------------------------------ helpers

    @property
    def sp(self) -> SpecialIds:
        return SpecialIds.from_base_vocab(self.cfg.llm.vocab_size)

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Split-vocab embedding lookup (reference: groma.py:165-174)."""
        base = self.cfg.llm.vocab_size
        is_new = input_ids >= base
        ids_base = jnp.where(is_new, 0, input_ids)
        ids_new = jnp.where(is_new, input_ids - base, 0)
        e = jnp.where(is_new[..., None],
                      self.new_input_embs[ids_new],
                      self.embed_tokens[ids_base])
        return e

    def logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Dual-head vocabulary projection (reference: groma.py:399-402)."""
        return jnp.concatenate(
            [self.lm_head(hidden), self.extra_lm_head(hidden)], axis=-1)

    # ------------------------------------------------------------- vision

    def vision(self, images, refer_boxes=None, refer_valid=None,
               ground_boxes=None, ground_valid=None,
               rng: Optional[jax.Array] = None, permute: bool = False,
               use_flash: bool = False):
        """Image -> image tokens + selected region pool + region tokens.

        All boxes are normalized cxcywh.  refer/ground boxes are fixed-
        capacity (B, Rr, 4)/(B, Rg, 4) with validity masks.
        """
        c = self.cfg
        b = images.shape[0]

        hidden_states = self.perceiver.encode_image(images,
                                                    use_flash=use_flash)
        hidden_states = tuple(jax.lax.stop_gradient(h)
                              for h in hidden_states)

        # image tokens: last hidden, drop CLS, 2x2 space-to-depth
        # (reference: groma.py:222-237)
        feats = hidden_states[c.perceiver.vis_output_layer][:, 1:]
        _, l, d = feats.shape
        g = int(round(l ** 0.5))
        f2 = feats.reshape(b, g, g, d)
        img_tokens = jnp.concatenate([
            f2[:, 0::2, 0::2], f2[:, 1::2, 0::2],
            f2[:, 0::2, 1::2], f2[:, 1::2, 1::2]], axis=-1)
        img_tokens = img_tokens.reshape(b, l // 4, d * 4)
        img_tokens = self.bridge_fc2(
            nn.gelu(self.bridge_fc1(img_tokens), approximate=False))

        # proposals + fused objectness (reference: groma.py:240-249)
        ddetr_out = self.perceiver.propose(hidden_states)
        pred_boxes = jax.lax.stop_gradient(ddetr_out['pred_boxes'])
        s_coco = jax.nn.sigmoid(ddetr_out['logits']['coco'][..., 0])
        s_sa1b = jax.nn.sigmoid(ddetr_out['logits']['sa1b'][..., 0])
        scores = jax.lax.stop_gradient(
            s_coco ** c.score_fuse_coco * s_sa1b ** c.score_fuse_sa1b)

        q = pred_boxes.shape[1]
        if refer_boxes is None:
            refer_boxes = jnp.zeros((b, 0, 4), pred_boxes.dtype)
            refer_valid = jnp.zeros((b, 0), bool)
        if ground_boxes is None:
            ground_boxes = jnp.zeros((b, 0, 4), pred_boxes.dtype)
            ground_valid = jnp.zeros((b, 0), bool)

        all_boxes = jnp.concatenate(
            [pred_boxes, refer_boxes, ground_boxes], axis=1)
        all_scores = jnp.concatenate([
            scores,
            jnp.where(refer_valid, 1.0, 0.0),
            jnp.where(ground_valid, c.ground_box_score, 0.0)], axis=1)
        all_valid = jnp.concatenate([
            jnp.ones((b, q), bool), refer_valid, ground_valid], axis=1)

        # fixed-capacity NMS (reference: groma.py:266-272 mmcv nms)
        def one(boxes, sc, va):
            return nms(cxcywh_to_xyxy(boxes), sc, c.nms_thres,
                       c.box_score_thres, max_num=c.max_region_num,
                       valid=va)
        keep_idx, keep_mask = jax.vmap(one)(all_boxes, all_scores, all_valid)

        # fallback: argmax-score box when nothing survives
        # (reference: groma.py:277-279)
        none_kept = ~jnp.any(keep_mask, axis=-1)
        arg = jnp.argmax(jnp.where(all_valid, all_scores, -1.0), axis=-1)
        keep_idx = keep_idx.at[:, 0].set(
            jnp.where(none_kept, arg.astype(keep_idx.dtype), keep_idx[:, 0]))
        keep_mask = keep_mask.at[:, 0].set(
            jnp.where(none_kept, True, keep_mask[:, 0]))

        if permute:
            assert rng is not None
            r = keep_mask.shape[1]
            noise = jax.random.uniform(rng, (b, r))
            order = jnp.argsort(jnp.where(keep_mask, noise, 2.0), axis=-1)
            keep_idx = jnp.take_along_axis(keep_idx, order, axis=-1)
            keep_mask = jnp.take_along_axis(keep_mask, order, axis=-1)

        selected_boxes = jnp.take_along_axis(
            all_boxes, keep_idx[..., None], axis=1)
        selected_boxes = jax.lax.stop_gradient(selected_boxes)

        # region tokens from last-3 hidden layers (reference: groma.py:311-315;
        # grads flow into the region encoder, not the ViT)
        mlvl = [h[:, 1:] for h in hidden_states[-3:]]
        region_tokens = self.region_encoder(mlvl, selected_boxes)

        return {
            'image_tokens': img_tokens,
            'selected_boxes': selected_boxes,
            'selected_mask': keep_mask,
            'region_tokens': region_tokens,
            'ddetr_out': ddetr_out,
        }

    # ------------------------------------------------- token-stream wiring

    def build_stream(self, input_ids, labels, region_slot, base_valid, vis,
                     refer_boxes=None, refer_valid=None,
                     ground_boxes=None, ground_valid=None):
        """Placeholder substitution + masked embedding scatter
        (reference: groma.py:282-369), fully static shapes."""
        sp = self.sp
        sel_boxes = vis['selected_boxes']
        sel_mask = vis['selected_mask']

        def match(user_boxes, user_valid):
            iou = jax.vmap(box_iou)(cxcywh_to_xyxy(user_boxes),
                                    cxcywh_to_xyxy(sel_boxes))
            iou = jnp.where(sel_mask[:, None, :], iou, -1.0)
            del user_valid
            return jnp.argmax(iou, axis=-1)              # (B, Ru)

        # rewrite <refer_box> / <ground_box> -> matched <rK>
        def substitute(ids, mask_token_id, matched):
            mask = ids == mask_token_id
            ordn = jnp.clip(_ordinal(mask), 0, matched.shape[1] - 1)
            midx = jnp.take_along_axis(matched, ordn, axis=-1)
            return jnp.where(mask, sp.box_idx_start + midx, ids), mask

        matched_refer = None
        if refer_boxes is not None and refer_boxes.shape[1] > 0:
            matched_refer = match(refer_boxes, refer_valid)
            input_ids, _ = substitute(input_ids, sp.rbox, matched_refer)
        if ground_boxes is not None and ground_boxes.shape[1] > 0:
            matched_ground = match(ground_boxes, ground_valid)
            input_ids, gmask = substitute(input_ids, sp.gbox, matched_ground)
            if labels is not None:
                new_lab, _ = substitute(labels, sp.gbox, matched_ground)
                labels = jnp.where(gmask, new_lab, labels)

        # runtime validity: unused region slots drop out of attention
        slot_ok = jnp.take_along_axis(
            sel_mask, jnp.clip(region_slot, 0, sel_mask.shape[1] - 1),
            axis=-1)
        valid = base_valid & ((region_slot < 0) | slot_ok)
        if labels is not None:
            labels = jnp.where(valid, labels, IGNORE_INDEX)

        # embedding scatter by ordinal (reference: groma.py:359-369)
        emb = self.embed(input_ids)

        def scatter(emb, token_mask, table):
            ordn = jnp.clip(_ordinal(token_mask), 0, table.shape[1] - 1)
            gathered = jnp.take_along_axis(
                table, ordn[..., None], axis=1).astype(emb.dtype)
            return jnp.where(token_mask[..., None], gathered, emb)

        emb = scatter(emb, input_ids == sp.image, vis['image_tokens'])
        emb = scatter(emb, input_ids == sp.region, vis['region_tokens'])
        if matched_refer is not None:
            refer_feats = jnp.take_along_axis(
                vis['region_tokens'], matched_refer[..., None], axis=1)
            emb = scatter(emb, input_ids == sp.rfeat, refer_feats)
        return emb, input_ids, labels, valid

    # ------------------------------------------------------------ forward

    def __call__(self, images, input_ids, region_slot, base_valid,
                 labels=None, refer_boxes=None, refer_valid=None,
                 ground_boxes=None, ground_valid=None,
                 rng=None, permute=False, use_flash=False,
                 fused_ce=True):
        """Training / prefill-style full forward.  Returns (loss, aux)."""
        vis = self.vision(images, refer_boxes, refer_valid, ground_boxes,
                          ground_valid, rng=rng, permute=permute,
                          use_flash=use_flash)
        emb, input_ids, labels, valid = self.build_stream(
            input_ids, labels, region_slot, base_valid, vis,
            refer_boxes, refer_valid, ground_boxes, ground_valid)
        position_ids = jnp.maximum(_ordinal(valid), 0)
        hidden, _ = self.llm(emb, valid, position_ids, use_flash=use_flash)
        logits = self.logits(hidden)

        loss = None
        if labels is not None:
            # each supervised token is conditioned on the last VALID
            # position before it (not the physical previous slot): in the
            # reference's dynamic stream (groma.py:404-415) the token after
            # the region block directly follows the last real region token,
            # so with fixed-capacity slots the gap of masked-invalid
            # positions must be skipped, not attended to.  For gapless
            # templates prev_valid == j-1 and this is the ordinary shift.
            pos = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)
            last_valid = jax.lax.cummax(jnp.where(valid, pos, -1), axis=1)
            prev_valid = jnp.pad(last_valid[:, :-1], ((0, 0), (1, 0)),
                                 constant_values=-1)
            ok = (labels != IGNORE_INDEX) & (prev_valid >= 0)
            src = jnp.clip(prev_valid, 0, None)
            safe = jnp.where(ok, labels, 0)
            if fused_ce:
                # gather HIDDEN (B,S,H) instead of logits (B,S,V) and
                # never materialize a full-vocab tensor: chunked-remat
                # logsumexp CE (ops/fused_ce.py).  Head matmuls run in
                # the hidden dtype (the reference's bf16 autocast
                # semantics) with fp32 accumulation.
                cond_hidden = jnp.take_along_axis(
                    hidden, src[..., None], axis=1)
                loss = fused_cross_entropy(
                    cond_hidden,
                    (self.lm_head.variables['params']['kernel'],
                     self.extra_lm_head.variables['params']['kernel']),
                    safe, ok, chunk=512, unroll=True)
            else:
                cond_logits = jnp.take_along_axis(
                    logits, src[..., None], axis=1).astype(jnp.float32)
                logp = jax.nn.log_softmax(cond_logits, axis=-1)
                nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
                loss = jnp.sum(jnp.where(ok, nll, 0.0)) \
                    / jnp.maximum(jnp.sum(ok), 1)
        return {'loss': loss, 'logits': logits, 'vis': vis,
                'valid': valid, 'final_input_ids': input_ids}

    # --------------------------------------------------------- generation

    def prefill(self, images, input_ids, region_slot, base_valid,
                max_len: int, refer_boxes=None, refer_valid=None,
                ground_boxes=None, ground_valid=None, use_flash=False):
        """Vision + surgery + first LLM pass, filling a fresh KV cache.
        Returns (last_valid_logits (B, V), cache, vis, next_pos) where
        next_pos (B, 1) is the position id of the first decode step."""
        vis = self.vision(images, refer_boxes, refer_valid,
                          ground_boxes, ground_valid, use_flash=use_flash)
        emb, ids, _, valid = self.build_stream(
            input_ids, None, region_slot, base_valid, vis,
            refer_boxes, refer_valid, ground_boxes, ground_valid)
        position_ids = jnp.maximum(_ordinal(valid), 0)
        cache = make_kv_cache(self.cfg.llm, images.shape[0], max_len,
                              dtype=jnp.dtype(self.cfg.llm.dtype))
        hidden, cache = self.llm(emb, valid, position_ids, cache=cache,
                                 use_flash=use_flash)
        # logits at the last *valid* position of each row
        last_pos = jnp.argmax(position_ids, axis=-1)
        last_hidden = jnp.take_along_axis(
            hidden, last_pos[:, None, None], axis=1)[:, 0]
        # next position id for decode
        next_pos = jnp.take_along_axis(position_ids, last_pos[:, None],
                                       axis=-1) + 1
        return self.logits(last_hidden), cache, vis, next_pos

    def prepare_stream(self, images, input_ids, region_slot, base_valid,
                       refer_boxes=None, refer_valid=None,
                       ground_boxes=None, ground_valid=None,
                       use_flash=False):
        """Vision + surgery only — returns (inputs_embeds, valid, vis).

        Lets alternative LLM execution paths (e.g. the int8 weight-only
        decoder in models/llama_quant.py) consume the grounded stream."""
        vis = self.vision(images, refer_boxes, refer_valid,
                          ground_boxes, ground_valid, use_flash=use_flash)
        emb, ids, _, valid = self.build_stream(
            input_ids, None, region_slot, base_valid, vis,
            refer_boxes, refer_valid, ground_boxes, ground_valid)
        return emb, ids, valid, vis

    def decode_step(self, token_ids, cache, position_ids):
        """One decode step: (B, 1) ids -> (B, V) logits + updated cache."""
        emb = self.embed(token_ids)
        valid = jnp.ones_like(token_ids, dtype=bool)
        hidden, cache = self.llm(emb, valid, position_ids, cache=cache)
        return self.logits(hidden[:, -1]), cache


def check_stream_capacity(valid, out_len):
    """Fail loudly if any row of ``valid`` holds more than ``out_len``
    valid tokens (the rows :func:`compact_stream` would silently drop).
    Call with a CONCRETE mask (host-side, or fetched once before a timed
    loop); raises ValueError naming the worst row."""
    counts = np.asarray(jax.device_get(valid)).sum(axis=-1)
    if counts.max(initial=0) > out_len:
        bad = int(counts.argmax())
        raise ValueError(
            f'compact_stream capacity exceeded: row {bad} has '
            f'{int(counts[bad])} valid tokens > out_len={out_len} — '
            f'prompt tokens would be silently dropped; grow out_len or '
            f'shrink the template')


def compact_stream(emb, valid, out_len, ids=None):
    """Drop the interior surgery pad gaps from a grounded stream: gather
    each row's valid positions to the front of a fixed ``out_len`` buffer.

    Exact for the LLM: causal order is preserved and the rope position
    ids are the compacted cumsum indices already (the same argument that
    makes the paged engine's seat-time compaction exact — serve/engine.py).
    A REC stream carries ~520 valid tokens inside the 640-slot template
    (image 256 + 2x100 region slots + text), so prefilling the compacted
    576-slot stream removes ~10% of every matmul's rows for free.
    A row with more than ``out_len`` valid tokens cannot fit: with
    concrete (non-traced) inputs this raises ValueError; under jit the
    caller must pre-validate with :func:`check_stream_capacity` on the
    host-side valid mask (a traced overflow would otherwise silently
    drop prompt tokens).
    """
    if not isinstance(valid, jax.core.Tracer):
        check_stream_capacity(valid, out_len)
    order = jnp.argsort(~valid, axis=-1, stable=True)   # valid-first
    take = order[:, :out_len]
    cemb = jnp.take_along_axis(emb, take[..., None], axis=1)
    cvalid = jnp.take_along_axis(valid, take, axis=1)
    if ids is not None:
        return cemb, cvalid, jnp.take_along_axis(ids, take, axis=1)
    return cemb, cvalid
