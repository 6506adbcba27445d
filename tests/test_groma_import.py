"""Full composite Groma checkpoint import integration test.

Builds a synthetic state dict with the reference's exact parameter naming
(reference module tree: groma/model/groma.py:96-124 — perceiver.*,
region_encoder.*, img_txt_bridge.*, llm.*, new_input_embs, extra_lm_head)
at tiny scale, imports it, and checks the flax model both runs and exposes
the imported values in the right places.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groma_tpu.checkpoint.loader import import_groma, hf_groma_config
from groma_tpu.config import tiny_groma_config
from groma_tpu.data.tokenization import SpecialIds, expand_template
from groma_tpu.models.groma import GromaModel

CFG = tiny_groma_config()


def _mk_reference_state_dict(rng):
    sd = {}

    def t(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    c = CFG
    vit, dd = c.perceiver.vit, c.perceiver.ddetr
    D, VD = dd.d_model, vit.hidden_size
    H = c.llm.hidden_size

    # ---- perceiver.vis_encoder (HF dinov2 naming)
    p = 'perceiver.vis_encoder.'
    grid = vit.image_size // vit.patch_size
    sd[p + 'embeddings.cls_token'] = t(1, 1, VD)
    sd[p + 'embeddings.position_embeddings'] = t(1, 1 + grid * grid, VD)
    sd[p + 'embeddings.patch_embeddings.projection.weight'] = \
        t(VD, 3, vit.patch_size, vit.patch_size)
    sd[p + 'embeddings.patch_embeddings.projection.bias'] = t(VD)
    sd[p + 'layernorm.weight'] = t(VD)
    sd[p + 'layernorm.bias'] = t(VD)
    for i in range(vit.num_layers):
        q = p + f'encoder.layer.{i}.'
        for nm in ('query', 'key', 'value'):
            sd[q + f'attention.attention.{nm}.weight'] = t(VD, VD)
            sd[q + f'attention.attention.{nm}.bias'] = t(VD)
        sd[q + 'attention.output.dense.weight'] = t(VD, VD)
        sd[q + 'attention.output.dense.bias'] = t(VD)
        sd[q + 'layer_scale1.lambda1'] = t(VD)
        sd[q + 'layer_scale2.lambda1'] = t(VD)
        for nm in ('norm1', 'norm2'):
            sd[q + f'{nm}.weight'] = t(VD)
            sd[q + f'{nm}.bias'] = t(VD)
        inner = int(VD * vit.mlp_ratio)
        sd[q + 'mlp.fc1.weight'] = t(inner, VD)
        sd[q + 'mlp.fc1.bias'] = t(inner)
        sd[q + 'mlp.fc2.weight'] = t(VD, inner)
        sd[q + 'mlp.fc2.bias'] = t(VD)

    # ---- perceiver.input_proj (nfl=1: 1x1 conv + LN)
    sd['perceiver.input_proj.0.0.weight'] = t(D, VD, 1, 1)
    sd['perceiver.input_proj.0.0.bias'] = t(D)
    sd['perceiver.input_proj.0.1.weight'] = t(D)
    sd['perceiver.input_proj.0.1.bias'] = t(D)

    # ---- perceiver.ddetr_transformer
    p = 'perceiver.ddetr_transformer.'
    sd[p + 'level_embed'] = t(1, D)
    sd[p + 'query_position_embeddings.weight'] = t(dd.num_queries, D)
    for nm in ('enc_output', 'pos_trans'):
        w = D * 2 if nm == 'pos_trans' else D
        inw = D * 2 if nm == 'pos_trans' else D
        sd[p + f'{nm}.weight'] = t(w, inw)
        sd[p + f'{nm}.bias'] = t(w)
    for nm in ('enc_output_norm', 'pos_trans_norm'):
        w = D * 2 if 'pos_trans' in nm else D
        sd[p + f'{nm}.weight'] = t(w)
        sd[p + f'{nm}.bias'] = t(w)
    sd[p + 'class_embed_enc.weight'] = t(dd.num_labels, D)
    sd[p + 'class_embed_enc.bias'] = t(dd.num_labels)
    for i in range(dd.encoder_layers):
        q = p + f'encoder.layers.{i}.'
        for nm, (o, ii) in {
            'self_attn.value_proj': (D, D),
            'self_attn.sampling_offsets': (dd.num_heads * dd.enc_n_points * 2, D),
            'self_attn.attention_weights': (dd.num_heads * dd.enc_n_points, D),
            'self_attn.output_proj': (D, D),
            'fc1': (dd.ffn_dim, D), 'fc2': (D, dd.ffn_dim),
        }.items():
            sd[q + nm + '.weight'] = t(o, ii)
            sd[q + nm + '.bias'] = t(o)
        for nm in ('self_attn_layer_norm', 'final_layer_norm'):
            sd[q + nm + '.weight'] = t(D)
            sd[q + nm + '.bias'] = t(D)
    for i in range(dd.decoder_layers):
        q = p + f'decoder.layers.{i}.'
        for nm, (o, ii) in {
            'self_attn.q_proj': (D, D), 'self_attn.k_proj': (D, D),
            'self_attn.v_proj': (D, D), 'self_attn.out_proj': (D, D),
            'encoder_attn.value_proj': (D, D),
            'encoder_attn.sampling_offsets': (dd.num_heads * dd.dec_n_points * 2, D),
            'encoder_attn.attention_weights': (dd.num_heads * dd.dec_n_points, D),
            'encoder_attn.output_proj': (D, D),
            'fc1': (dd.ffn_dim, D), 'fc2': (D, dd.ffn_dim),
        }.items():
            sd[q + nm + '.weight'] = t(o, ii)
            sd[q + nm + '.bias'] = t(o)
        for nm in ('self_attn_layer_norm', 'encoder_attn_layer_norm',
                   'final_layer_norm'):
            sd[q + nm + '.weight'] = t(D)
            sd[q + nm + '.bias'] = t(D)
    for i in range(dd.decoder_layers):
        sd[p + f'class_embed_coco.{i}.weight'] = t(dd.num_labels, D)
        sd[p + f'class_embed_coco.{i}.bias'] = t(dd.num_labels)
        sd[p + f'class_embed_sa1b.{i}.weight'] = t(dd.num_labels, D)
        sd[p + f'class_embed_sa1b.{i}.bias'] = t(dd.num_labels)
    for i in range(dd.decoder_layers + 1):
        dims = [(256, D), (256, 256), (4, 256)]
        for j, (o, ii) in enumerate(dims):
            sd[p + f'bbox_embed.{i}.layers.{j}.weight'] = t(o, ii)
            sd[p + f'bbox_embed.{i}.layers.{j}.bias'] = t(o)

    # ---- region_encoder (reference MLVLROIQueryModule naming)
    p = 'region_encoder.'
    for lvl in range(3):
        sd[p + f'mlvl_fuse.input_conv.{lvl}.weight'] = t(VD, VD + 2, 1, 1)
        sd[p + f'mlvl_fuse.input_conv.{lvl}.bias'] = t(VD)
    for i in range(CFG.region_num_fuse):
        sd[p + f'mlvl_fuse.fuse_convs.{i}.conv.weight'] = t(VD, VD, 3, 3)
        sd[p + f'mlvl_fuse.fuse_convs.{i}.gn.weight'] = t(VD)
        sd[p + f'mlvl_fuse.fuse_convs.{i}.gn.bias'] = t(VD)
    for lvl in range(3):
        sd[p + f'roi_align.pconvs.{lvl}.weight'] = t(VD, VD, 3, 3)
        sd[p + f'roi_align.pconvs.{lvl}.bias'] = t(VD)
    sd[p + 'roi_align.pos_embedd.0.weight'] = t(256, 4)
    sd[p + 'roi_align.pos_embedd.0.bias'] = t(256)
    sd[p + 'roi_align.pos_embedd.2.weight'] = t(256)
    sd[p + 'roi_align.pos_embedd.2.bias'] = t(256)
    sd[p + 'roi_align.pos_embedd.3.weight'] = t(1024, 256)
    sd[p + 'roi_align.pos_embedd.3.bias'] = t(1024)
    sd[p + 'roi_align.pos_embedd.5.weight'] = t(1024)
    sd[p + 'roi_align.pos_embedd.5.bias'] = t(1024)
    sd[p + 'roi_align.flatten_linear.weight'] = \
        t(1024, VD * CFG.region_roi_out ** 2)
    sd[p + 'roi_align.flatten_linear.bias'] = t(1024)
    sd[p + 'roi_align.updims.weight'] = t(H, 1024)
    sd[p + 'roi_align.updims.bias'] = t(H)

    # ---- bridge / heads / llm
    sd['img_txt_bridge.0.weight'] = t(H, VD * 4)
    sd['img_txt_bridge.0.bias'] = t(H)
    sd['img_txt_bridge.2.weight'] = t(H, H)
    sd['img_txt_bridge.2.bias'] = t(H)
    sd['new_input_embs.weight'] = t(CFG.num_new_token, H)
    sd['extra_lm_head.weight'] = t(CFG.num_new_token, H)
    sd['llm.model.embed_tokens.weight'] = t(CFG.llm.vocab_size, H)
    sd['llm.model.norm.weight'] = t(H)
    sd['llm.lm_head.weight'] = t(CFG.llm.vocab_size, H)
    for i in range(CFG.llm.num_layers):
        q = f'llm.model.layers.{i}.'
        for nm, (o, ii) in {
            'self_attn.q_proj': (H, H), 'self_attn.k_proj': (H, H),
            'self_attn.v_proj': (H, H), 'self_attn.o_proj': (H, H),
            'mlp.gate_proj': (CFG.llm.intermediate_size, H),
            'mlp.up_proj': (CFG.llm.intermediate_size, H),
            'mlp.down_proj': (H, CFG.llm.intermediate_size),
        }.items():
            sd[q + nm + '.weight'] = t(o, ii)
        sd[q + 'input_layernorm.weight'] = t(H)
        sd[q + 'post_attention_layernorm.weight'] = t(H)
    return sd


def test_import_groma_end_to_end(rng):
    sd = _mk_reference_state_dict(rng)
    params = import_groma(sd, CFG)

    # spot-check value placement
    np.testing.assert_array_equal(params['new_input_embs'],
                                  sd['new_input_embs.weight'])
    np.testing.assert_array_equal(
        params['lm_head']['kernel'], sd['llm.lm_head.weight'].T)
    np.testing.assert_array_equal(
        params['perceiver']['ddetr_transformer']['level_embed'],
        sd['perceiver.ddetr_transformer.level_embed'])

    # the imported tree must drop into the flax model and run
    model = GromaModel(CFG)
    sp = SpecialIds.from_base_vocab(CFG.llm.vocab_size)
    raw = np.array([1, sp.image, 4, sp.region, 5, 6, 2])
    t = expand_template(raw, None, sp, CFG.num_image_tokens,
                        CFG.max_region_num, CFG.max_seq_len)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    out = model.apply(
        {'params': params},
        images=jnp.asarray(rng.standard_normal((1, 56, 56, 3)),
                           jnp.float32),
        input_ids=jnp.asarray(t['input_ids'][None]),
        region_slot=jnp.asarray(t['region_slot'][None]),
        base_valid=jnp.asarray(t['valid'][None]))
    assert np.isfinite(np.asarray(out['logits'])).all()

    # structural equality with a fresh init (same treedef)
    ref = model.init(jax.random.PRNGKey(0),
                     images=jnp.zeros((1, 56, 56, 3), jnp.float32),
                     input_ids=jnp.asarray(t['input_ids'][None]),
                     region_slot=jnp.asarray(t['region_slot'][None]),
                     base_valid=jnp.asarray(t['valid'][None]))['params']
    ref_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths


def test_hf_groma_config_translation():
    cfg = hf_groma_config({
        'llm_cfg': {'vocab_size': 32000, 'hidden_size': 4096,
                    'num_hidden_layers': 32},
        'perceiver_cfg': {
            'vis_encoder_cfg': {'hidden_size': 1024, 'image_size': 518},
            'ddetr_cfg': {'d_model': 256, 'num_queries': 300,
                          'num_feature_levels': 1}},
        'num_new_token': 114, 'nms_thres': 0.6,
        'box_score_thres': 0.15, 'max_region_num': 100})
    assert cfg.llm.num_layers == 32
    assert cfg.perceiver.ddetr.num_queries == 300
    assert cfg.num_new_token == 114
    assert cfg.vocab_size == 32114
