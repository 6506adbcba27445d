"""FULL-MODEL parity vs the reference's own torch code.

Runs /root/reference/groma/model/groma.py (via pure-torch shims for
mmcv/mmdet/torchvision, tests/reference_shims.py) at tiny scale with the
real 448x448 geometry, imports the identical weights into the flax
GromaModel, and asserts the *assembled* pipeline agrees end to end:

  two-stage proposals -> dual-score fusion -> NMS pool (+refer/ground
  injection) -> region tokenization -> token surgery -> split-vocab LLM
  logits (reference: groma/model/groma.py:202-427).

This is the parity anchor that per-module HF tests cannot give: it pins
the seams (score fusion exponents, NMS ordering, placeholder substitution,
embedding scatter) against reference numerics.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, 'tests')

import jax
import jax.numpy as jnp

from reference_shims import load_reference_groma

from groma_tpu.checkpoint.hf_import import to_numpy_state_dict
from groma_tpu.checkpoint.loader import import_groma
from groma_tpu.config import (DDETRConfig, GromaConfig,
                              LlamaConfig as MyLlamaConfig,
                              PerceiverConfig, ViTConfig)
from groma_tpu.constants import IGNORE_INDEX
from groma_tpu.data.tokenization import SpecialIds, expand_template
from groma_tpu.models.groma import GromaModel

# heavyweight tier (round-5 verdict #7): run with -m slow; the
# default tier must stay <5 min
pytestmark = pytest.mark.slow

SEED = 0
VIT_D, VIT_L, VIT_H = 64, 4, 4
DD_D, DD_Q, DD_L, DD_H, DD_F = 64, 24, 2, 4, 128
LLM_V, LLM_D, LLM_I, LLM_L, LLM_H = 512, 64, 128, 2, 4
IMG = 448
SP = SpecialIds.from_base_vocab(LLM_V)


def _build_reference_model(dd_q=DD_Q, max_region_num=10,
                           max_pos=512):
    ref_groma = load_reference_groma()
    torch.manual_seed(SEED)
    cfg = ref_groma.GromaConfig(
        llm_cfg=dict(vocab_size=LLM_V, hidden_size=LLM_D,
                     intermediate_size=LLM_I, num_hidden_layers=LLM_L,
                     num_attention_heads=LLM_H, num_key_value_heads=LLM_H,
                     max_position_embeddings=max_pos, rms_norm_eps=1e-5,
                     attention_dropout=0.0),
        perceiver_cfg=dict(
            vis_encoder_cfg=dict(hidden_size=VIT_D, num_hidden_layers=VIT_L,
                                 num_attention_heads=VIT_H, mlp_ratio=4,
                                 patch_size=14, image_size=IMG,
                                 layerscale_value=1.0),
            ddetr_cfg=dict(d_model=DD_D, num_queries=dd_q,
                           encoder_layers=DD_L, decoder_layers=DD_L,
                           encoder_attention_heads=DD_H,
                           decoder_attention_heads=DD_H,
                           encoder_ffn_dim=DD_F, decoder_ffn_dim=DD_F,
                           num_feature_levels=1, encoder_n_points=4,
                           decoder_n_points=4, two_stage=True,
                           with_box_refine=True,
                           two_stage_num_proposals=dd_q, num_labels=1,
                           dropout=0.0, activation_dropout=0.0,
                           attention_dropout=0.0, auxiliary_loss=False)),
        num_new_token=114, nms_thres=0.6, box_score_thres=0.15,
        max_region_num=max_region_num)
    model = ref_groma.GromaModel(cfg).eval()
    # The reference hardcodes the region up-projection at 1024->4096
    # (reference: groma/model/roi_align.py:264 updims); retarget it to the
    # tiny llm width — both sides then share the same retargeted weights.
    torch.manual_seed(SEED + 1)
    model.region_encoder.roi_align.updims = torch.nn.Linear(1024, LLM_D)
    # Random-init objectness logits sit at sigmoid(-4.6) ~= 0.01, under
    # box_score_thres; zero the biases so NMS has real work to do.
    with torch.no_grad():
        heads = list(model.perceiver.ddetr_transformer.class_embed_coco) + \
            list(model.perceiver.ddetr_transformer.class_embed_sa1b)
        for head in heads:
            head.bias.zero_()
    model.pad_token_id = SP.pad
    model.img_token_id = SP.image
    model.reg_token_id = SP.region
    model.refer_box_token_id = SP.rbox
    model.refer_feat_token_id = SP.rfeat
    model.ground_box_token_id = SP.gbox
    model.box_idx_token_ids = list(range(SP.box_idx_start,
                                         SP.box_idx_start + 100))
    return model


def _my_config(max_region_num, dd_q=DD_Q, max_seq_len=352, max_pos=512):
    vit = ViTConfig(hidden_size=VIT_D, num_layers=VIT_L, num_heads=VIT_H,
                    patch_size=14, image_size=IMG, dtype='float32')
    ddetr = DDETRConfig(d_model=DD_D, num_queries=dd_q, encoder_layers=DD_L,
                        decoder_layers=DD_L, num_heads=DD_H, ffn_dim=DD_F,
                        num_feature_levels=1, enc_n_points=4, dec_n_points=4,
                        dropout=0.0, dtype='float32')
    perceiver = PerceiverConfig(vit=vit, ddetr=ddetr, image_size=IMG)
    llm = MyLlamaConfig(vocab_size=LLM_V, hidden_size=LLM_D,
                        intermediate_size=LLM_I, num_layers=LLM_L,
                        num_heads=LLM_H, num_kv_heads=LLM_H,
                        max_position_embeddings=max_pos, dtype='float32')
    return GromaConfig(llm=llm, perceiver=perceiver, num_new_token=114,
                       max_region_num=max_region_num, num_image_tokens=256,
                       max_seq_len=max_seq_len, region_roi_out=14,
                       region_num_fuse=5, region_gn_groups=64)


def _run_reference(model, image_nchw, ids, labels=None, refer_boxes=None,
                   ground_boxes=None):
    """Reference forward with an identity survivor permutation (the
    reference permutes unconditionally, groma.py:275-277; determinism
    needs the identity here and permute=False on the flax side)."""
    kw = {}
    if refer_boxes is not None:
        kw['refer_boxes'] = [torch.from_numpy(b) for b in refer_boxes]
    if ground_boxes is not None:
        kw['ground_boxes'] = [torch.from_numpy(b) for b in ground_boxes]
    if labels is not None:
        kw['labels'] = torch.tensor([labels])
    orig_randperm = torch.randperm
    torch.randperm = lambda n, **k: torch.arange(n)
    try:
        with torch.no_grad():
            out = model(input_ids=torch.tensor([ids]),
                        images=torch.from_numpy(image_nchw),
                        use_cache=False, return_dict=True, **kw)
    finally:
        torch.randperm = orig_randperm
    return out


@pytest.fixture(scope='module')
def ref_and_params():
    model = _build_reference_model()
    sd = to_numpy_state_dict(model)
    cfg = _my_config(max_region_num=10)
    params = jax.tree_util.tree_map(jnp.asarray, import_groma(sd, cfg))
    return model, params


@pytest.fixture(scope='module')
def image():
    rng = np.random.default_rng(SEED)
    return rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)


def _apply_mine(cfg, params, image_nchw, ids, labels=None, **box_kw):
    t = expand_template(np.array(ids),
                        None if labels is None else np.array(labels),
                        SP, cfg.num_image_tokens, cfg.max_region_num,
                        cfg.max_seq_len)
    return GromaModel(cfg).apply(
        {'params': params},
        images=jnp.asarray(image_nchw.transpose(0, 2, 3, 1)),
        input_ids=jnp.asarray(t['input_ids'][None]),
        region_slot=jnp.asarray(t['region_slot'][None]),
        base_valid=jnp.asarray(t['valid'][None]),
        labels=None if labels is None else jnp.asarray(t['labels'][None]),
        **box_kw)


def test_full_model_inference_parity(ref_and_params, image):
    """proposals -> NMS -> surgery -> logits vs reference numerics
    (reference: groma/model/groma.py:202-427)."""
    model, params = ref_and_params
    cfg = _my_config(max_region_num=10)
    ids = [1, 5, SP.image, 7, SP.region, 9, 10, 11, 2]

    out = _run_reference(model, image, ids)
    mine = _apply_mine(cfg, params, image, ids)

    vis_t = out.hidden_states[1]
    sel_t = vis_t['pred_boxes'][0].numpy()
    mask_m = np.asarray(mine['vis']['selected_mask'][0])
    sel_m = np.asarray(mine['vis']['selected_boxes'][0])[mask_m]

    assert mask_m.sum() == len(sel_t), 'NMS survivor count differs'
    np.testing.assert_allclose(sel_m, sel_t, atol=1e-6)

    img_t = vis_t['image_features'].numpy()
    np.testing.assert_allclose(
        np.asarray(mine['vis']['image_tokens']).reshape(-1, LLM_D),
        img_t.reshape(-1, LLM_D), atol=1e-5)

    reg_t = vis_t['region_features'].numpy()
    reg_m = np.asarray(mine['vis']['region_tokens'][0])[mask_m]
    np.testing.assert_allclose(reg_m, reg_t, atol=2e-3)

    valid = np.asarray(mine['valid'][0])
    logit_t = out.logits[0].numpy()
    logit_m = np.asarray(mine['logits'][0])[valid]
    assert valid.sum() == logit_t.shape[0], 'post-surgery length differs'
    np.testing.assert_allclose(logit_m, logit_t, atol=5e-4)
    assert (logit_m.argmax(-1) == logit_t.argmax(-1)).all()


def test_full_model_refer_ground_parity(ref_and_params, image):
    """<refer_box>/<ground_box> -> <rK> substitution, refer-feature
    scatter, label rewrite, and CE loss vs the reference
    (reference: groma/model/groma.py:282-309,404-415)."""
    model, params = ref_and_params
    cfg = _my_config(max_region_num=10)
    I = IGNORE_INDEX
    ids = [1, 5, SP.image, 7, SP.region, 8,
           SP.rbox, SP.rfeat, 9, 10, SP.gbox, 11, 2]
    labels = [I, I, I, I, I, I,
              I, I, I, 10, SP.gbox, 11, 2]
    refer = [np.array([[0.52, 0.48, 0.22, 0.3]], np.float32)]
    ground = [np.array([[0.3, 0.62, 0.2, 0.18]], np.float32)]

    out = _run_reference(model, image, ids, labels=labels,
                         refer_boxes=refer, ground_boxes=ground)
    mine = _apply_mine(
        cfg, params, image, ids, labels=labels,
        refer_boxes=jnp.asarray(refer[0][None]),
        refer_valid=jnp.ones((1, 1), bool),
        ground_boxes=jnp.asarray(ground[0][None]),
        ground_valid=jnp.ones((1, 1), bool))

    valid = np.asarray(mine['valid'][0])
    logit_t = out.logits[0].numpy()
    logit_m = np.asarray(mine['logits'][0])[valid]
    assert valid.sum() == logit_t.shape[0]
    np.testing.assert_allclose(logit_m, logit_t, atol=5e-4)

    # the <rK> substitutions landed on the same region indices
    ids_m = np.asarray(mine['final_input_ids'][0])[valid]
    # reconstruct the reference's final ids from its expanded stream:
    # positions where it placed box-idx tokens
    n = len(out.hidden_states[1]['pred_boxes'][0])
    assert (ids_m >= SP.box_idx_start).sum() == n + 2  # block + rbox + gbox

    # CE loss (no supervised token borders the region block, so the
    # shifted supervision maps 1:1)
    loss_t = float(out.loss)
    loss_m = float(mine['loss'])
    assert abs(loss_m - loss_t) < 5e-5, (loss_m, loss_t)


def test_full_model_partial_region_occupancy(ref_and_params, image):
    """max_region_num > survivors: unused fixed-layout slots are masked
    out and the stream still matches the reference's compacted one."""
    model, params = ref_and_params
    # capacity 64 > the 24-query proposal pool, so slots MUST go unused
    model.config.max_region_num = 64
    try:
        cfg = _my_config(max_region_num=64).replace(max_seq_len=448)
        ids = [1, 5, SP.image, 7, SP.region, 9, 10, 11, 2]
        out = _run_reference(model, image, ids)
        mine = _apply_mine(cfg, params, image, ids)
    finally:
        model.config.max_region_num = 10

    n_t = len(out.hidden_states[1]['pred_boxes'][0])
    mask_m = np.asarray(mine['vis']['selected_mask'][0])
    assert 0 < n_t < 64, 'fixture should under-fill the region capacity'
    assert mask_m.sum() == n_t

    valid = np.asarray(mine['valid'][0])
    logit_t = out.logits[0].numpy()
    logit_m = np.asarray(mine['logits'][0])[valid]
    assert valid.sum() == logit_t.shape[0]
    np.testing.assert_allclose(logit_m, logit_t, atol=5e-4)
    assert (logit_m.argmax(-1) == logit_t.argmax(-1)).all()


def test_full_geometry_parity(image):
    """PRODUCTION-GEOMETRY parity (round-5 verdict #4): the shipped
    448^2 / 1025-token ViT / 300-query / 100-region-slot / >=600-token
    stream, with only depth/width reduced.  This pins the index
    arithmetic (proposal pool -> NMS tie-breaking over 300 boxes ->
    100-slot fixed layout -> long-stream token surgery) at the exact
    shapes real REC evaluation runs (reference: groma/model/groma.py:
    202-427; groma/train/train_det.py:41-45 num_queries=300)."""
    DD_Q_FULL, REG_FULL, SEQ_FULL = 300, 100, 640
    model = _build_reference_model(dd_q=DD_Q_FULL,
                                   max_region_num=REG_FULL,
                                   max_pos=1024)
    sd = to_numpy_state_dict(model)
    cfg = _my_config(max_region_num=REG_FULL, dd_q=DD_Q_FULL,
                     max_seq_len=SEQ_FULL, max_pos=1024)
    params = jax.tree_util.tree_map(jnp.asarray, import_groma(sd, cfg))

    # a long mixed stream: prompt text, the image + region blocks, and
    # a tail long enough that the expanded stream crosses 600 tokens
    # (raw T + 454 post-expansion at 100 region slots)
    rng = np.random.default_rng(SEED + 2)
    head = list(rng.integers(4, LLM_V - 4, 40))
    tail = list(rng.integers(4, LLM_V - 4, 130))
    ids = [1, *head, SP.image, 7, SP.region, *tail, 2]
    assert len(ids) + 454 >= 600

    out = _run_reference(model, image, ids)
    mine = _apply_mine(cfg, params, image, ids)

    vis_t = out.hidden_states[1]
    sel_t = vis_t['pred_boxes'][0].numpy()
    mask_m = np.asarray(mine['vis']['selected_mask'][0])
    sel_m = np.asarray(mine['vis']['selected_boxes'][0])[mask_m]
    # the 300-query pool must under-fill the 100 slots through the same
    # NMS path on both sides, box for box, in order
    assert 0 < len(sel_t) <= REG_FULL
    assert mask_m.sum() == len(sel_t), 'NMS survivor count differs'
    np.testing.assert_allclose(sel_m, sel_t, atol=1e-6)

    reg_t = vis_t['region_features'].numpy()
    reg_m = np.asarray(mine['vis']['region_tokens'][0])[mask_m]
    # fp32 accumulation-order noise grows with the RoI count (64+
    # survivors here vs ~7 in the tiny cases): measured 1/6400 elements
    # at 2.6e-3 with identical weights and identical boxes
    np.testing.assert_allclose(reg_m, reg_t, atol=4e-3)

    valid = np.asarray(mine['valid'][0])
    logit_t = out.logits[0].numpy()
    logit_m = np.asarray(mine['logits'][0])[valid]
    assert valid.sum() == logit_t.shape[0], 'post-surgery length differs'
    assert valid.sum() >= 600, 'stream must exercise >=600 tokens'
    np.testing.assert_allclose(logit_m, logit_t, atol=1e-3)
    assert (logit_m.argmax(-1) == logit_t.argmax(-1)).all()
